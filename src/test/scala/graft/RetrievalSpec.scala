package graft

import org.apache.spark.sql.functions._

/** Hybrid retrieval (L29) + survivorship election (L30) invariants beyond
  * the oracle hash-match: internal consistency of the RRF arithmetic and
  * cross-operator agreement between survivorship and cluster resolution.
  */
class RetrievalSpec extends SparkSpec {

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
