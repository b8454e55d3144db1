package graft

import org.apache.spark.sql.functions._

/** Hybrid retrieval (L29) + survivorship election (L30) invariants beyond
  * the oracle hash-match: internal consistency of the RRF arithmetic and
  * cross-operator agreement between survivorship and cluster resolution.
  */
class RetrievalSpec extends SparkSpec {

  test("doc_bm25 equals a sequential integer-BM25 reference") {
    // full driver-side recompute of the declared integer skeleton
    // (tokenize, tf saturation cleared by 10·L, surrogate idf, top-10)
    val terms = Seq("join", "hash", "scan")
    val docs = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).toLowerCase.trim.split("\\s+").toSeq))
    val nn = docs.length.toLong
    val ll = docs.map(_._3.size.toLong).sum
    val dfm = terms.map(t =>
      t -> docs.count(_._3.contains(t)).toLong).toMap
    val want = docs.flatMap { case (id, lang, toks) =>
      val dl = toks.size.toLong
      val ts = terms.flatMap { t =>
        val f = toks.count(_ == t).toLong
        if (f == 0) None
        else {
          val idf = (nn + 1) * 1000000L / (dfm(t) + 1)
          val tf = (22L * ll * f * 1000000L) /
            (10L * ll * f + 3L * ll + 9L * dl * nn)
          Some(idf * tf / 1000000L)
        }
      }
      if (ts.isEmpty) None
      else Some((id, lang, dl, ts.size.toLong, ts.sum))
    }.sortBy { case (id, _, _, _, sc) => (-sc, id) }.take(10).toSeq
    val got = SparkEntry.queries("doc_bm25")(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want, s"got=$got\nwant=$want")
  }

  test("hybrid_search RRF scores recompute exactly from the leg ranks") {
    val rows = operators.Retrieval.hybridSearch(spark, sfTiny).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val kw = r.getAs[Long]("kw_rank")
      val vec = r.getAs[Long]("vec_rank")
      val expected =
        (if (kw > 0) 1000000L / (60 + kw) else 0L) +
          (if (vec > 0) 1000000L / (60 + vec) else 0L)
      assert(r.getAs[Long]("rrf_score") == expected)
      assert(kw >= 0 && kw <= 20 && vec >= 0 && vec <= 20)
      assert(kw > 0 || vec > 0) // a fused row came from at least one leg
    }
    // per-query ranks are 1..k dense and scores non-increasing
    rows.groupBy(_.getAs[Long]("q_id")).foreach { case (_, qr) =>
      val sorted = qr.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq ==
        (1L to sorted.length).toSeq)
      val scores = sorted.map(_.getAs[Long]("rrf_score")).toSeq
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
    // both legs contribute somewhere, and so does fusion: at least one
    // doc surfaced by one leg only
    assert(rows.exists(_.getAs[Long]("kw_rank") == 0))
    assert(rows.exists(_.getAs[Long]("vec_rank") == 0))
    assert(rows.exists(r =>
      r.getAs[Long]("kw_rank") > 0 && r.getAs[Long]("vec_rank") > 0))
  }

  test("embedding_mmr matches a sequential driver-side greedy reference") {
    val out = operators.Retrieval.embeddingMmr(spark, sfTiny).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("step"),
        r.getAs[Long]("doc_id"), r.getAs[Double]("mmr_score")))
    val vecs = Tables.embeddings(spark, sfTiny)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getSeq[Float](1).toArray).toMap
    def dotS(a: Array[Float], b: Array[Float]): Long =
      a.indices.map(i =>
        math.floor(a(i).toDouble * b(i).toDouble * 1e14).toLong).sum
    def cos(a: Array[Float], b: Array[Float]): Double =
      dotS(a, b).toDouble / math.sqrt(
        dotS(a, a).toDouble * dotS(b, b).toDouble)
    val expected = (0L to 2L).flatMap { q =>
      val rels = vecs.keys.filter(_ != q).toSeq
        .map(id => (id, cos(vecs(q), vecs(id))))
      val pool = rels.sortBy { case (id, r) => (-r, id) }.take(10)
      var selected = Vector.empty[(Long, Double)]
      (1 to 3).foreach { _ =>
        val cand = pool.filterNot(p => selected.exists(_._1 == p._1))
          .map { case (id, r) =>
            val div = if (selected.isEmpty) 0.0
              else selected.map(s => cos(vecs(id), vecs(s._1))).max
            (id, 0.5 * r - 0.5 * div)
          }
        selected :+= cand.minBy { case (id, s) => (-s, id) }
      }
      selected.zipWithIndex.map { case ((id, s), i) =>
        (q, (i + 1).toLong, id, s) }
    }
    assert(out.toSeq == expected)
  }

  test("dedup_survivorship agrees with dedup_clusters on the clustering") {
    val surv = operators.Pipeline.dedupSurvivorship(spark, sfTiny).collect()
    val clus = operators.Pipeline.dedupClusters(spark, sfTiny)
      .collect().map(r =>
        r.getAs[Long]("cluster") ->
          (r.getAs[Long]("n_members"), r.getAs[Long]("member_id_xor")))
      .toMap
    assert(surv.nonEmpty && surv.length == clus.size)
    surv.foreach { r =>
      val cl = r.getAs[Long]("cluster")
      val (nm, xorAll) = clus(cl)
      assert(r.getAs[Long]("n_members") == nm)
      assert(r.getAs[Long]("n_dropped") == nm - 1)
      // dropped_xor ^ survivor == xor of ALL members
      assert((r.getAs[Long]("dropped_id_xor") ^
        r.getAs[Long]("survivor_doc")) == xorAll)
    }
  }

  test("survivor is the quality argmax of its cluster") {
    val surv = operators.Pipeline.dedupSurvivorship(spark, sfTiny)
    val pairs = operators.NearDup.docSimhashDup(spark, sfTiny)
      .select(col("doc_a"), col("doc_b"))
    val labels = operators.Pipeline.connectedComponents(pairs)
      .select(col("id").as("doc_id"), col("label").as("cluster"))
    // independent recompute of the winning quality per cluster via plain
    // max over the SAME score the operator uses (Docs.docQuality)
    val q = operators.Docs.docQuality(spark, sfTiny)
      .select(col("doc_id"), col("quality"))
    val best = labels.join(q, Seq("doc_id"))
      .groupBy(col("cluster")).agg(max(col("quality")).as("max_q"))
      .collect().map(r =>
        r.getAs[Long]("cluster") -> r.getAs[Double]("max_q")).toMap
    surv.collect().foreach { r =>
      assert(r.getAs[Double]("survivor_quality") ==
        best(r.getAs[Long]("cluster")))
    }
  }
}
