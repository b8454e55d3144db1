package graft

import org.apache.spark.sql.functions._

/** One spec per registered operator (driver contract: every SURVEY.md §2
  * row has a `queries` entry): each query must plan, execute on the tiny
  * scale factor, and return a deterministic, non-degenerate result.
  * Cross-engine value correctness is the DuckDB oracle's job (Verify +
  * tools/check.py); these specs pin the engine-side basics plus
  * per-operator semantic invariants that an oracle can't see (plan shape,
  * rerun determinism).
  */
class QueriesSpec extends SparkSpec {

  test("every query has an oracle or a documented omission") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
  }

  test("oracle SQL references no nondeterministic functions") {
    val banned = Seq("rand(", "random(", "uuid(", "now(", "current_timestamp")
    for ((name, sql) <- SparkEntry.oracleSql; b <- banned)
      assert(!sql.toLowerCase.contains(b), s"$name uses $b")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name executes on sf0.001, is non-empty and rerun-deterministic") {
      val df = fn(spark, sfTiny)
      val rows = df.collect()
      assert(rows.nonEmpty, s"$name returned 0 rows at sf0.001")
      assert(df.columns.nonEmpty && df.columns.distinct.length == df.columns.length,
        s"$name has duplicate column names: ${df.columns.mkString(",")}")
      val again = fn(spark, sfTiny).collect()
      assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq,
        s"$name is not deterministic across reruns")
    }
  }

  // ---- algebraic properties over random inputs (SURVEY.md §5.4) ----

  private def sample[A](g: org.scalacheck.Gen[A], seed: Long): A =
    g.pureApply(org.scalacheck.Gen.Parameters.default,
      org.scalacheck.rng.Seed(seed))

  test("property: dedupRows is idempotent — dedup(dedup(x)) = dedup(x)") {
    import spark.implicits._
    // texts drawn from a small pool with whitespace/case variations, so
    // normalization collapses variants into real duplicate groups
    val genDoc = for {
      id <- org.scalacheck.Gen.choose(1L, 10000L)
      base <- org.scalacheck.Gen.oneOf(
        "the quick brown fox", "lorem ipsum dolor", "data all the way down",
        "short", "a b c d e")
      variant <- org.scalacheck.Gen.oneOf(
        identity[String] _,
        (s: String) => s.toUpperCase,
        (s: String) => s"  $s  ",
        (s: String) => s.replace(" ", "   "))
    } yield (id, variant(base))
    val genDocs = org.scalacheck.Gen.listOfN(40, genDoc)
      .map(_.distinctBy(_._1))
    for (seed <- 1L to 8L) {
      val docs = sample(genDocs, seed).toDF("doc_id", "text")
      val once = operators.Docs.dedupRows(docs)
      val twice = operators.Docs.dedupRows(once)
      val a = once.collect().map(_.toString).sorted.toSeq
      val b = twice.collect().map(_.toString).sorted.toSeq
      assert(a == b, s"seed=$seed: dedup not idempotent")
      // and the survivor rule held: one row per normalized text, min id
      val perText = once
        .groupBy(lower(trim(regexp_replace(col("text"), "\\s+", " "))))
        .count().collect()
      assert(perText.forall(_.getLong(1) == 1L),
        s"seed=$seed: duplicate normalized texts survived")
    }
  }

  test("dedupRows keeps exactly one survivor even under duplicate doc_ids") {
    import spark.implicits._
    // the advisory edge case: with min-equality survivor selection, two
    // rows sharing BOTH the min doc_id and a normalized text both
    // survived. row_number must keep exactly one row per hash regardless.
    val docs = Seq(
      (1L, "the quick brown fox"),
      (1L, "  THE QUICK  BROWN FOX "),   // same id, same normalized text
      (2L, "the quick brown fox"),       // higher id, same text
      (3L, "lorem ipsum"),
      (3L, "unrelated text")             // duplicate id, DIFFERENT text
    ).toDF("doc_id", "text")
    val out = operators.Docs.dedupRows(docs)
    val perText = out
      .groupBy(lower(trim(regexp_replace(col("text"), "\\s+", " "))))
      .count().collect()
    assert(perText.forall(_.getLong(1) == 1L),
      "a normalized text kept more than one survivor")
    assert(out.count() == 3, s"expected 3 survivors, got ${out.count()}")
    // survivor of the fox group carries the minimum doc_id
    assert(out.filter(lower(col("text")).contains("fox"))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("property: running window sum at the last row equals the group sum") {
    import spark.implicits._
    // the invariant that ties the two aggregation families together: a
    // per-key running sum, read at each key's final row, IS that key's
    // group-by sum. Integer values keep equality exact.
    val genRow = for {
      k <- org.scalacheck.Gen.choose(1L, 6L)
      seq <- org.scalacheck.Gen.choose(1L, 100000L)
      v <- org.scalacheck.Gen.choose(-1000L, 1000L)
    } yield (k, seq, v)
    val genRows = org.scalacheck.Gen.listOfN(80, genRow)
      .map(_.distinctBy(r => (r._1, r._2)))  // (k, seq) unique: total order
    for (seed <- 1L to 8L) {
      val df = sample(genRows, seed).toDF("k", "seq", "v")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("k")).orderBy(col("seq"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val lastRunning = df
        .withColumn("run", sum(col("v")).over(w))
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("k")).orderBy(col("seq").desc)))
        .filter(col("rn") === 1)
        .select(col("k"), col("run"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val groupSum = df.groupBy(col("k")).agg(sum(col("v")).as("s"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(lastRunning == groupSum,
        s"seed=$seed: window running sum != group sum")
    }
  }

  test("graph_pagerank equals a sequential fixed-point reference implementation") {
    // independent re-derivation in driver-side Maps (no Spark, no SQL):
    // same graph build, same scaled-i64 arithmetic — pins that the
    // distributed join/agg rounds compute the DECLARED algorithm, not
    // merely something both engines agree on
    val o = Tables.orders(spark, sfTiny)
      .select(col("o_orderkey"), col("o_custkey")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // NO distinct: multiplicity is the edge weight (weighted PageRank)
    val cp = Tables.lineitem(spark, sfTiny)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .flatMap(r => o.get(r.getLong(0)).map(c =>
        (c * 2, r.getLong(1) * 2 + 1))).toSeq
    val edges = cp ++ cp.map(p => (p._2, p._1))
    val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val n = outdeg.size
    val r0 = 1000000000000000L / n
    val base = 15L * r0 / 100
    var rank = outdeg.keys.map(_ -> r0).toMap
    for (_ <- 1 to 3) {
      val in = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(e => rank(e._1) / outdeg(e._1)).sum
      }
      rank = in.map { case (k, s) => k -> (base + 85 * s / 100) }
    }
    val want = rank.toSeq
      .map { case (node, r) =>
        (r, if (node % 2 == 0) "customer" else "part", node / 2) }
      .sortBy { case (r, k, i) => (-r, k, i) }.take(20)
      .map { case (r, k, i) => (k, i, r) }.toSeq
    val got = SparkEntry.queries("graph_pagerank")(spark, sfTiny).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want, s"got=$got\nwant=$want")
  }

  test("graph_shortest_paths equals a sequential BFS reference") {
    // independent re-derivation with a driver-side queue BFS (no Spark
    // joins, no recursion-by-rounds): pins that the 4 relax rounds
    // compute true hop distance with the declared radius/unreached
    // semantics, not merely something both engines agree on
    val o = Tables.orders(spark, sfTiny)
      .select(col("o_orderkey"), col("o_custkey")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cp = Tables.lineitem(spark, sfTiny)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .flatMap(r => o.get(r.getLong(0)).map(c =>
        (c * 2, r.getLong(1) * 2 + 1))).distinct
    val adj = (cp ++ cp.map(p => (p._2, p._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct }
    val seedSet = Tables.customer(spark, sfTiny)
      .filter(col("c_nationkey") === 0).select(col("c_custkey")).collect()
      .map(_.getLong(0) * 2).filter(adj.contains).toSet
    val distM = scala.collection.mutable.Map[Long, Long]()
    var frontier = seedSet
    frontier.foreach(n => distM(n) = 0L)
    for (d <- 1L to 4L) {
      frontier = frontier.flatMap(adj(_)).filterNot(distM.contains)
      frontier.foreach(n => distM(n) = d)
    }
    val want = adj.keys.toSeq
      .map { n =>
        (if (n % 2 == 0) "customer" else "part",
          distM.getOrElse(n, -1L), n / 2) }
      .groupBy { case (k, d, _) => (k, d) }
      .map { case ((k, d), rows) =>
        val ids = rows.map(_._3)
        (k, d, ids.size.toLong, ids.reduce(_ ^ _), ids.min, ids.max) }
      .toSeq.sortBy { case (k, d, _, _, _, _) => (k, d) }
    val got = SparkEntry.queries("graph_shortest_paths")(spark, sfTiny)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want, s"got=$got\nwant=$want")
  }

  test("basket_rules equals a sequential support/confidence/lift reference") {
    // driver-side recompute over Set-based baskets with the declared
    // integer ppm arithmetic — pins that the map-side pair expansion
    // and broadcast support joins compute Apriori's statistics
    val rows = Tables.lineitem(spark, sfTiny)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val baskets = rows.groupBy(_._1).values.map(_.map(_._2).toSet).toSeq
    val n = baskets.size.toLong
    val supp = baskets.flatten.groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val pairCnt = baskets.flatMap(b =>
      b.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val want = pairCnt.toSeq.map { case ((pa, pb), sab) =>
      (pa, pb, sab, supp(pa), supp(pb),
        sab * 1000000L / supp(pa), sab * 1000000L / supp(pb),
        sab * n * 1000000L / (supp(pa) * supp(pb)))
    }.sortBy { case (pa, pb, sab, _, _, _, _, lift) =>
      (-sab, -lift, pa, pb) }.take(20)
    val got = SparkEntry.queries("basket_rules")(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == want, s"got=$got\nwant=$want")
  }

  test("graph_kcore equals a sequential peel reference") {
    // driver-side mean-anchored 3-round peel over Set adjacency — pins
    // that the distributed degree/semi-join rounds compute the declared
    // cascade, including empty-core rounds
    val rows = Tables.lineitem(spark, sfTiny)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .filter(_.getLong(1) % 2 == 0)
      .map(r => (r.getLong(0), r.getLong(1)))
    var edges: Set[(Long, Long)] = rows.groupBy(_._1).values.flatMap { ps =>
      val ks: Seq[Long] = ps.map(_._2).toSeq.distinct.sorted
      ks.combinations(2).map(p => (p(0), p(1)))
    }.toSet
    def degs(es: Set[(Long, Long)]): Map[Long, Long] =
      es.toSeq.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
        .map { case (k, v) => k -> v.size.toLong }
    val d0 = degs(edges)
    val k = d0.values.sum / d0.size + 1
    val want = (1 to 3).map { r =>
      val d = degs(edges)
      val keep = d.filter(_._2 >= k).keySet
      edges = edges.filter(e => keep(e._1) && keep(e._2))
      val nodes = edges.toSeq.flatMap(e => Seq(e._1, e._2)).distinct
      (r.toLong, nodes.size.toLong, edges.size.toLong,
        if (nodes.isEmpty) 0L else nodes.reduce(_ ^ _))
    }
    val got = SparkEntry.queries("graph_kcore")(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want, s"got=$got\nwant=$want")
  }

  test("events_pareto tiers are consistent and exactly recomputable") {
    // tier shares must recompute from per-user totals driver-side with
    // the same histogram-quantile thresholds
    val cents = Tables.events(spark, sfTiny)
      .select(col("user_id"), col("value")).collect()
      .groupBy(_.getLong(0))
      .map { case (_, v) =>
        v.map(r => math.rint(r.getDouble(1) * 100).toLong).sum }
      .toSeq
    val n = cents.size.toLong
    val dollars = cents.map(_ / 100L)
    val hist = dollars.groupBy(identity).map { case (k, v) =>
      k -> v.size.toLong }.toSeq.sortBy(_._1)
    def th(q: Long): Long = {
      var cum = 0L
      hist.collectFirst {
        case (d, c) if { cum += c; cum >= (n * q + 99) / 100 } => d
      }.get
    }
    val (p90, p99) = (th(90), th(99))
    val total = cents.sum
    val top10 = cents.zip(dollars).filter(_._2 > p90).map(_._1)
    val top1 = cents.zip(dollars).filter(_._2 > p99).map(_._1)
    val want = (n, total, top10.size.toLong,
      top10.sum * 1000000L / total, top1.size.toLong,
      top1.sum * 1000000L / total)
    val got = SparkEntry.queries("events_pareto")(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).head
    assert(got == want, s"got=$got\nwant=$want")
  }

  test("events_funnel_time equals a sequential latency reference") {
    val evs = Tables.events(spark, sfTiny)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = evs.groupBy(_._1)
    val sUs = byUser.flatMap { case (u, rows) =>
      val s = rows.filter(_._2 == "signup").map(_._3)
      if (s.isEmpty) None else Some(u -> s.min)
    }
    val deltas = sUs.flatMap { case (u, s0) =>
      val p = byUser(u).filter(r => r._2 == "purchase" && r._3 >= s0)
        .map(_._3)
      if (p.isEmpty) None else Some(p.min - s0)
    }.toSeq
    val nС = deltas.size.toLong
    val hist = deltas.map(_ / 3600000000L).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }.toSeq.sortBy(_._1)
    def q(mark: Long): Long = {
      var cum = 0L
      hist.collectFirst {
        case (h, c) if { cum += c; cum >= mark } => h
      }.get
    }
    val want = (sUs.size.toLong, nС, nС * 1000000L / sUs.size,
      deltas.min, deltas.max, q((nС + 1) / 2), q((nС * 90 + 99) / 100))
    val got = SparkEntry.queries("events_funnel_time")(spark, sfTiny)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).head
    assert(got == want, s"got=$got\nwant=$want")
  }

  test("orders_backlog equals a sequential sweep reference") {
    val oMap = Tables.orders(spark, sfTiny)
      .select(col("o_orderkey"), to_date(col("o_orderdate"))).collect()
      .map(r => r.getLong(0) -> r.getDate(1).toLocalDate).toMap
    val lastShip = Tables.lineitem(spark, sfTiny)
      .select(col("l_orderkey"), to_date(col("l_shipdate"))).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).maxBy(_.toEpochDay) }
    val deltas = scala.collection.mutable.Map[java.time.LocalDate, Long]()
    for ((k, s) <- oMap if lastShip.contains(k)) {
      deltas(s) = deltas.getOrElse(s, 0L) + 1
      val e = lastShip(k).plusDays(1)
      deltas(e) = deltas.getOrElse(e, 0L) - 1
    }
    var run = 0L
    val cum = deltas.toSeq.sortBy(_._1.toEpochDay).map { case (d, dl) =>
      run += dl; (d, run) }
    val want = cum.groupBy(t => (t._1.getYear, t._1.getMonthValue))
      .map { case ((y, m), rows) =>
        (f"$y%04d-$m%02d-01", rows.size.toLong,
          rows.maxBy(_._1.toEpochDay)._2, rows.map(_._2).max) }
      .toSeq.sortBy(_._1)
    val got = SparkEntry.queries("orders_backlog")(spark, sfTiny).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want, s"got=${got.take(5)}...\nwant=${want.take(5)}...")
  }

  test("events_cohort_matrix equals a sequential reference") {
    val rows = Tables.events(spark, sfTiny)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("value"),
        expr("cast(datediff(to_date(ts), date'2024-01-01') div 7 as bigint)")
          .as("w")).collect()
      .filter(r => math.rint(r.getDouble(1) * 100).toLong >= 10000L)
      .map(r => (r.getLong(0), r.getLong(2)))
    val uw = rows.distinct
    val cohort = uw.groupBy(_._1).map { case (u, v) =>
      u -> v.map(_._2).min }
    val sizes = cohort.values.groupBy(identity).map { case (c, v) =>
      c -> v.size.toLong }
    val want = uw.map { case (u, w) => (cohort(u), w - cohort(u)) }
      .groupBy(identity).map { case ((c, off), v) =>
        (c, off, sizes(c), v.size.toLong,
          v.size.toLong * 1000000L / sizes(c)) }
      .toSeq.sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("events_cohort_matrix")(spark, sfTiny)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == want, s"got=$got\nwant=$want")
  }

  test("events_ab_test equals a sequential reference") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString
    val rows = Tables.events(spark, sfTiny)
      .select(col("user_id"), col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        math.rint(r.getDouble(2) * 100).toLong))
    val byU = rows.groupBy(_._1).toSeq.map { case (u, v) =>
      (md5hex(u.toString).charAt(0) < '8', v.size.toLong,
        v.count(t => t._2 == "purchase" && t._3 >= 10000L).toLong,
        v.map(_._3).sum)
    }
    def side(a: Boolean) = byU.filter(_._1 == a)
    val (na, nb) = (side(true).size.toLong, side(false).size.toLong)
    val (eva, evb) = (side(true).map(_._2).sum, side(false).map(_._2).sum)
    val (hva, hvb) = (side(true).map(_._3).sum, side(false).map(_._3).sum)
    val (ca, cb) = (side(true).map(_._4).sum, side(false).map(_._4).sum)
    val want = (na, nb, eva, evb, hva, hvb,
      hva * 1000000L / eva, hvb * 1000000L / evb,
      hvb * 1000000L / evb - hva * 1000000L / eva,
      ca / na, cb / nb, cb / nb - ca / na)
    val got = SparkEntry.queries("events_ab_test")(spark, sfTiny)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8), r.getLong(9), r.getLong(10),
        r.getLong(11))).head
    assert(got == want, s"got=$got\nwant=$want")
  }

  test("date_business_days: the closed form counts actual weekdays") {
    // brute-force weekday count between sampled date pairs must equal
    // g(b) − g(a) — the identity the operator rests on
    val anchor = java.time.LocalDate.parse("1990-01-01") // a Monday
    def g(d: Long): Long = 5 * (d / 7) + math.min(d % 7, 5)
    def brute(a: java.time.LocalDate, b: java.time.LocalDate): Long =
      Iterator.iterate(a)(_.plusDays(1)).takeWhile(_.isBefore(b))
        .count(d => d.getDayOfWeek.getValue <= 5).toLong
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 200) {
      val a = anchor.plusDays(rnd.nextInt(3000))
      val b = a.plusDays(rnd.nextInt(90))
      val da = java.time.temporal.ChronoUnit.DAYS.between(anchor, a)
      val db = java.time.temporal.ChronoUnit.DAYS.between(anchor, b)
      assert(g(db) - g(da) == brute(a, b), s"$a -> $b")
    }
  }

  test("events_anomaly_mad equals a sequential median/MAD reference") {
    // driver-side lower-median + MAD + integer Hampel fence — pins that
    // the domain-histogram median formulation computes the DECLARED
    // robust gate
    val raw = Tables.events(spark, sfTiny)
      .select(col("event_type"), col("event_id"), col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1),
        math.rint(r.getDouble(2) * 100).toLong))
    def lowerMedian(xs: Seq[Long]): Long = {
      val s = xs.sorted; s((s.size + 1) / 2 - 1)
    }
    val want = raw.groupBy(_._1).toSeq.map { case (ty, rows) =>
      val med = lowerMedian(rows.map(_._3).toSeq)
      val devs = rows.map(t => (t._2, math.abs(t._3 - med)))
      val mad = lowerMedian(devs.map(_._2).toSeq)
      val anom = devs.filter(d => d._2 * 10000L > mad * 44478L)
      (ty, rows.size.toLong, med, mad, anom.size.toLong,
        if (anom.isEmpty) None else Some(anom.map(_._1).reduce(_ ^ _)))
    }.sortBy(_._1)
    val got = SparkEntry.queries("events_anomaly_mad")(spark, sfTiny)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))).toSeq
    assert(got == want, s"got=$got\nwant=$want")
  }

  test("events_holt equals a sequential integer recurrence reference") {
    // driver-side fold of the DECLARED Holt recurrence in plain Longs
    // (no encoding) — pins that the offset-encoded scalar fold computes
    // the recurrence, not merely something both engines agree on
    val epoch = java.time.LocalDateTime.parse("2024-01-01T00:00:00")
      .toEpochSecond(java.time.ZoneOffset.UTC)
    val raw = Tables.events(spark, sfTiny)
      .select(col("event_type"), unix_timestamp(col("ts")).as("s"),
        col("value")).collect()
      .map(r => (r.getString(0), (r.getLong(1) - epoch) / 3600L,
        math.rint(r.getDouble(2) * 100).toLong))
    def tdiv(a: Long, b: Long): Long = a / b // JVM / truncates toward zero
    val want = raw.groupBy(_._1).toSeq.map { case (ty, rows) =>
      val ys = rows.groupBy(_._2).toSeq.sortBy(_._1)
        .map { case (_, v) => v.map(_._3).sum }
      var l = ys.head; var b = 0L
      for (x <- ys.tail) {
        val l2 = tdiv(2 * x + 8 * (l + b), 10)
        b = tdiv(3 * (l2 - l) + 7 * b, 10)
        l = l2
      }
      (ty, ys.size.toLong, l, b, l + b, l + 3 * b)
    }.sortBy(_._1)
    val got = SparkEntry.queries("events_holt")(spark, sfTiny).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want, s"got=$got\nwant=$want")
  }

  test("events_autocorr equals a sequential BigInt reference") {
    // independent re-derivation driver-side: hourly cents per type from
    // raw rows, lag pairs on exact hour adjacency, r² ppm via the same
    // truncating integer closed form in BigInt — pins that the
    // window+stack plan computes the DECLARED statistic
    val epoch = java.time.LocalDateTime.parse("2024-01-01T00:00:00")
      .toEpochSecond(java.time.ZoneOffset.UTC)
    val raw = Tables.events(spark, sfTiny)
      .select(col("event_type"), unix_timestamp(col("ts")).as("s"),
        col("value")).collect()
      .map(r => (r.getString(0), (r.getLong(1) - epoch) / 3600L,
        math.rint(r.getDouble(2) * 100).toLong))
    val hourly = raw.groupBy(t => (t._1, t._2))
      .map { case ((ty, x), v) => (ty, x, v.map(_._3).sum) }
      .groupBy(_._1).map { case (ty, v) =>
        ty -> v.map(t => t._2 -> t._3).toMap }
    val want = (for {
      (ty, series) <- hourly.toSeq
      k <- 1L to 3L
    } yield {
      val ps = series.toSeq.collect {
        case (x, a) if series.contains(x - k) => (BigInt(a), BigInt(series(x - k)))
      }
      val n = BigInt(ps.size)
      val sa = ps.map(_._1).sum; val sb = ps.map(_._2).sum
      val sab = ps.map(p => p._1 * p._2).sum
      val saa = ps.map(p => p._1 * p._1).sum
      val sbb = ps.map(p => p._2 * p._2).sum
      val num = n * sab - sa * sb
      val d1 = n * saa - sa * sa; val d2 = n * sbb - sb * sb
      val r2 = if (d1 == 0 || d2 == 0) None
        else Some(((num * 1000 / d1) * (num * 1000 / d2)).toLong)
      (ty, k, n.toLong, r2, num.signum.toLong)
    }).sortBy { case (ty, k, _, _, _) => (ty, k) }
    val got = SparkEntry.queries("events_autocorr")(spark, sfTiny).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getLong(4)))
      .toSeq
    assert(got == want, s"got=$got\nwant=$want")
  }

  test("graph_triangles equals a sequential brute-force reference") {
    // independent re-derivation in driver-side Sets (no Spark, no SQL):
    // same subgraph, naive common-neighbor count per edge — pins that the
    // broadcast-adjacency sorted-intersect plan computes the DECLARED
    // embeddedness, not merely something both engines agree on
    val pairs = Tables.lineitem(spark, sfTiny)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .filter(_.getLong(1) % 2 == 0)
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val byOrder = pairs.groupBy(_._1).values.map(_.map(_._2).distinct.toSeq)
    val edges = byOrder.flatMap { ks =>
      for (a <- ks; b <- ks if a < b) yield (a, b)
    }.toSet
    val nbr = edges.toSeq.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val emb = edges.toSeq.map { case (a, b) =>
      (a, b, (nbr(a) & nbr(b)).size.toLong) }
    val nTri = emb.map(_._3).sum / 3
    val want = emb.sortBy { case (a, b, c) => (-c, a, b) }.take(10)
      .map { case (a, b, c) => (a, b, c, edges.size.toLong, nTri) }
    val got = SparkEntry.queries("graph_triangles")(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want, s"got=$got\nwant=$want")
  }

  test("events_ewma equals a sequential driver-side fold") {
    // independent re-derivation: same (ts, event_id) ordering, same
    // integer recurrence s <- (2x + 8s) div 10 in a plain foldLeft —
    // pins that the HOF aggregate computes the DECLARED recurrence
    val want = Tables.events(spark, sfTiny)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getLong(0),
        // (epoch-second, nanos) keeps the µs precision a bare getTime
        // (millis) would drop — a same-millisecond pair must order the
        // same way the engine's full-precision timestamp does
        (r.getTimestamp(1).getTime / 1000, r.getTimestamp(1).getNanos,
          r.getLong(2), math.round(r.getDouble(3) * 100))))
      .groupBy(_._1).map { case (u, rows) =>
        val xs = rows.map(_._2).sortBy(t => (t._1, t._2, t._3)).map(_._4)
        u -> xs.tail.foldLeft(xs.head)((acc, x) => (2 * x + 8 * acc) / 10)
      }
    val got = SparkEntry.queries("events_ewma")(spark, sfTiny).collect()
      .map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(got == want, s"got=$got\nwant=$want")
  }

  test("sample_split is a partition and co-assigns exact duplicates") {
    for (sf <- Seq(sfTiny, sfSmall)) {
      val rows = SparkEntry.queries("sample_split")(spark, sf).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      // partition: per-source split counts sum to the source's doc count
      val perSource = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum)
      val want = Tables.documents(spark, sf).groupBy(col("source")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(perSource.toMap == want, s"split is not a partition at $sf")
      // independent reference: recompute the content-keyed assignment
      // driver-side (JDK MessageDigest, no Spark expressions) — pins
      // that the split keys on normalized TEXT, not on the row id
      val md = java.security.MessageDigest.getInstance("MD5")
      val wantCounts = Tables.documents(spark, sf)
        .select(col("source"), col("text")).collect()
        .map { r =>
          val nt = r.getString(1).replaceAll("\\s+", " ").trim.toLowerCase
          val h = md.digest(nt.getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.substring(0, 4)
          val split = if (h < "cccd") "1_train"
            else if (h < "e666") "2_val" else "3_test"
          (r.getString(0), split)
        }
        .groupBy(identity).view.mapValues(_.length.toLong).toMap
      val gotCounts = rows.map(t => (t._1, t._2) -> t._3).toMap
      assert(gotCounts == wantCounts,
        s"split assignment diverges from the driver-side reference at $sf")
    }
  }

  test("events_rfm equals a sequential driver-side reference") {
    // independent re-derivation: per-user RFM in plain Scala, type-1
    // quintile thresholds from a sorted copy, same strictly-above
    // scoring — pins the histogram-threshold plan to the DECLARED
    // quantile definition
    val refDate = java.time.LocalDate.parse("2024-01-31")
    val perUser = Tables.events(spark, sfTiny)
      .select(col("user_id"), col("ts"), col("value")).collect()
      .map(r => (r.getLong(0),
        r.getTimestamp(1).toInstant.atZone(java.time.ZoneOffset.UTC)
          .toLocalDate,
        math.round(r.getDouble(2) * 100)))
      .groupBy(_._1).map { case (u, rows) =>
        val rDays = java.time.temporal.ChronoUnit.DAYS.between(
          rows.map(_._2).max, refDate)
        (u, rDays, rows.size.toLong, rows.map(_._3).sum)
      }.toSeq
    def thresholds(vs: Seq[Long]): Seq[Long] = {
      val sorted = vs.sorted
      Seq(20, 40, 60, 80).map(q =>
        sorted(((vs.size * q + 99) / 100 - 1).toInt))
    }
    val rT = thresholds(perUser.map(_._2))
    val fT = thresholds(perUser.map(_._3))
    val mT = thresholds(perUser.map(_._4 / 100))
    def score(v: Long, t: Seq[Long]) = 1L + t.count(v > _)
    val want = perUser
      .map { case (_, r, f, m) =>
        ((6 - score(r, rT), score(f, fT), score(m / 100, mT)), m) }
      .groupBy(_._1).map { case (k, xs) =>
        (k._1, k._2, k._3, xs.size.toLong, xs.map(_._2).sum) }
      .toSeq.sorted
    val got = SparkEntry.queries("events_rfm")(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq.sorted
    assert(got == want, s"got=$got\nwant=$want")
  }

  test("doc_winnowing equals a sequential driver-side reference") {
    // full pipeline re-derived in plain Scala: tokenize, md5 4-gram
    // stream, w=8 sliding min with rightmost tiebreak, distinct selected
    // hashes, pair + >=50% containment filter — pins the window-pass
    // selection to the DECLARED winnowing algorithm
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String) =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val fps = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val toks = r.getString(1).replaceAll("\\s+", " ").trim
          .toLowerCase.split(" ")
        r.getLong(0) -> toks
      }
      .filter(_._2.length >= 11)
      .map { case (id, toks) =>
        val hs = (0 to toks.length - 4)
          .map(i => h(toks.slice(i, i + 4).mkString(" ")))
        val sel = (7 until hs.length).map { j =>
          // min of window [j-7, j], ties -> rightmost (max index)
          (j - 7 to j).map(k => (hs(k), -k)).min._1
        }.toSet
        id -> sel
      }.toMap
    val want = (for {
      (a, fa) <- fps.toSeq; (b, fb) <- fps.toSeq if a < b
      shared = (fa & fb).size
      if shared * 2 >= math.min(fa.size, fb.size) && shared > 0
    } yield (a, b, shared.toLong, fa.size.toLong, fb.size.toLong,
      shared.toLong * 1000000L / math.min(fa.size, fb.size))).sorted
    val got = SparkEntry.queries("doc_winnowing")(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq.sorted
    assert(got == want, s"got=${got.take(5)}...\nwant=${want.take(5)}...")
  }

  test("events_paths equals a sequential driver-side reference") {
    val byUser = Tables.events(spark, sfTiny)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0),
        (r.getTimestamp(1).getTime / 1000, r.getTimestamp(1).getNanos,
          r.getLong(2), r.getString(3))))
      .groupBy(_._1)
      .map { case (u, rows) =>
        u -> rows.map(_._2).sortBy(t => (t._1, t._2, t._3)).map(_._4).toSeq }
    val tris = byUser.toSeq.flatMap { case (u, types) =>
      types.sliding(3).filter(_.size == 3)
        .map(t => (u, (t(0), t(1), t(2)))).toSeq
    }
    val want = tris.groupBy(_._2).map { case (t, xs) =>
      (t._1, t._2, t._3, xs.map(_._1).distinct.size.toLong, xs.size.toLong)
    }.toSeq
      .sortBy { case (a, b, c, u, o) => (-u, -o, a, b, c) }.take(20)
    val got = SparkEntry.queries("events_paths")(spark, sfTiny).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == want, s"got=$got\nwant=$want")
  }

  test("dq_drift equals a sequential driver-side reference") {
    val cut = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val rows = Tables.events(spark, sfTiny)
      .select(col("event_type"), col("ts"), col("value")).collect()
      .map(r => (r.getString(0),
        math.min(math.floor(r.getDouble(2) / 50).toLong, 9L),
        r.getTimestamp(1).before(cut)))
    val want = rows.groupBy(_._1).map { case (t, xs) =>
      val na = xs.count(_._3).toLong
      val nb = xs.size - na
      val terms = (0L to 9L).map { b =>
        val oa = xs.count(x => x._2 == b && x._3).toLong
        val ob = xs.count(x => x._2 == b && !x._3).toLong
        val pa = oa * 1000000L / na
        val pb = ob * 1000000L / nb
        (b, (pb - pa) * (pb - pa) / math.max(pa, 1L))
      }
      (t, na, nb, terms.map(_._2).sum,
        terms.maxBy(x => (x._2, x._1))._1)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("dq_drift")(spark, sfTiny).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want, s"got=$got\nwant=$want")
  }

  test("events_trend equals a sequential BigInt least-squares reference") {
    val epoch = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val hourly = Tables.events(spark, sfTiny)
      .select(col("event_type"), col("ts"), col("value")).collect()
      .map { r =>
        val t = r.getTimestamp(1).getTime
        ((r.getString(0), (t - Math.floorMod(t, 3600000L) - epoch) / 3600000L),
          math.round(r.getDouble(2) * 100))
      }
      .groupBy(_._1).map { case ((ty, x), xs) => (ty, x, xs.map(_._2).sum) }
    val want = hourly.groupBy(_._1).map { case (ty, pts) =>
      val n = BigInt(pts.size)
      val sx = BigInt(pts.map(_._2).sum); val sy = BigInt(pts.map(_._3).sum)
      val sxy = pts.map(p => BigInt(p._2) * BigInt(p._3)).sum
      val sxx = pts.map(p => BigInt(p._2) * BigInt(p._2)).sum
      val xmax = BigInt(pts.map(_._2).max)
      val snum = n * sxy - sx * sy
      val den = n * sxx - sx * sx
      (ty, pts.size.toLong, sy.toLong,
        ((snum * 1000000) / den).toLong,
        ((sy * den + snum * (n * (xmax + 1) - sx)) / (n * den)).toLong)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("events_trend")(spark, sfTiny).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == want, s"got=$got\nwant=$want")
  }

  test("doc_minhash_est_error matches a driver-side signature recompute") {
    // re-derive the pair rows entirely driver-side: shingle sets, the
    // 8-permutation minima (md5 4-hex chunks), exact and estimated ppm —
    // pins both the estimator definition and the pair membership to
    // doc_near_dedup's declared envelope
    val md = java.security.MessageDigest.getInstance("MD5")
    def mdHex(s: String) =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val sh = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val toks = r.getString(1).replaceAll("\\s+", " ").trim
          .toLowerCase.split(" ")
        r.getLong(0) -> toks.sliding(3).filter(_.size == 3)
          .map(_.mkString(" ")).toSet
      }.filter(_._2.nonEmpty).toMap
    val mins = sh.map { case (id, gs) =>
      val hs = gs.toSeq.map(mdHex)
      id -> (0 until 8).map(i => hs.map(_.substring(4 * i, 4 * i + 4)).min)
    }
    val want = (for {
      (a, ga) <- sh.toSeq; (b, gb) <- sh.toSeq if a < b
      // LSH candidate: some band (pair of adjacent perms) agrees
      if (0 until 4).exists(bd => mins(a)(2 * bd) == mins(b)(2 * bd) &&
        mins(a)(2 * bd + 1) == mins(b)(2 * bd + 1))
      common = (ga & gb).size
      if common.toDouble / (ga.size + gb.size - common) >= 0.5
      exact = common.toLong * 1000000L / (ga.size + gb.size - common)
      est = (0 until 8).count(i => mins(a)(i) == mins(b)(i)) * 125000L
    } yield (a, b, exact, est, math.abs(est - exact))).sorted
    val got = SparkEntry.queries("doc_minhash_est_error")(spark, sfTiny)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq.sorted
    assert(got == want, s"got=$got\nwant=$want")
  }

  test("triangle algebra holds on random graphs incl. degenerate shapes") {
    // the edge-iterator identity Σ|N(x)∩N(y)| = 3·triangles, exercised on
    // random adjacency (seeded — deterministic) plus the degenerate
    // shapes sfTiny can't produce: triangle-free stars, isolated edges,
    // and a complete clique — driven through the same broadcast-adjacency
    // sorted-intersect computation the query uses
    import spark.implicits._
    import graft.functions.VectorExprs
    val rnd = new scala.util.Random(7)
    val randomG = (1 to 60).flatMap { _ =>
      val a = rnd.nextInt(12).toLong; val b = rnd.nextInt(12).toLong
      if (a == b) None else Some((math.min(a, b), math.max(a, b)))
    }.distinct
    val star = (1L to 6L).map(i => (0L, 100L + i))         // 0 triangles
    val pair = Seq((200L, 201L))                           // isolated edge
    val k5 = for (a <- 300L to 304L; b <- a + 1 to 304L) yield (a, b) // C(5,3)=10
    for ((edges, name) <- Seq((randomG, "random"), (star, "star"),
        (pair, "edge"), ((star ++ pair ++ k5).toSeq, "mixed"))) {
      val nbr = edges.flatMap(e => Seq(e._1 -> e._2, e._2 -> e._1))
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      val expected = edges.map { case (a, b) => (nbr(a) & nbr(b)).size.toLong }
      val e0 = edges.toDF("x", "y")
      val ad = e0.unionByName(e0.select(col("y").as("x"), col("x").as("y")))
      val adj = ad.groupBy(col("x"))
        .agg(sort_array(collect_list(col("y"))).as("arr"))
      val got = e0
        .join(broadcast(adj.select(col("x"), col("arr").as("ax"))), Seq("x"))
        .join(broadcast(adj.select(col("x").as("y"), col("arr").as("ay"))),
          Seq("y"))
        .select(col("x"), col("y"),
          VectorExprs.sortedIntersectCount(col("ax"), col("ay")).as("c"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .toMap
      val want = edges.zip(expected).map { case ((a, b), c) => (a, b) -> c }
      want.foreach { case ((a, b), c) =>
        assert(got((a, b)) == c, s"$name: edge ($a,$b) embeddedness") }
      val tri3 = expected.sum
      assert(tri3 % 3 == 0, s"$name: Σ embeddedness not divisible by 3")
      if (name == "star") assert(tri3 == 0)
      if (name == "edge") assert(tri3 == 0)
      if (name == "mixed") assert(tri3 / 3 >= 10) // the K5 contributes C(5,3)
    }
  }

  test("events_seasonality equals a sequential driver-side reference") {
    val anchor = java.time.LocalDate.parse("2024-01-01")
    val cells = Tables.events(spark, sfTiny)
      .select(col("event_type"), col("ts")).collect()
      .map { r =>
        val i = r.getTimestamp(1).toInstant.atZone(java.time.ZoneOffset.UTC)
        (r.getString(0),
          java.time.temporal.ChronoUnit.DAYS.between(
            anchor, i.toLocalDate) % 7,
          i.getHour.toLong)
      }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val want = cells.groupBy(_._1._1).map { case (t, cs) =>
      val n = cs.values.sum
      val pk = cs.map { case ((_, d, h), c) => (c, d, h) }.max
      (t, n, pk._2, pk._3, pk._1 * 1000000L / n,
        cs.collect { case ((_, d, _), c) if d >= 5 => c }.sum * 1000000L / n,
        cs.collect { case ((_, _, h), c) if h < 6 || h >= 22 => c }
          .sum * 1000000L / n)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("events_seasonality")(spark, sfTiny)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == want, s"got=$got\nwant=$want")
  }

  test("events_funnel_steps stages are monotonically non-increasing") {
    for (sf <- Seq(sfTiny, sfSmall)) {
      val rows = SparkEntry.queries("events_funnel_steps")(spark, sf)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows("1_view") >= rows("2_click_after_view") &&
        rows("2_click_after_view") >= rows("3_purchase_within_48h"),
        s"funnel not monotone at $sf: $rows")
    }
  }

  test("entry smoke: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("doc_decontaminate_xl makes the identical decision to the exact plan") {
    // same oracle SQL by declaration; this pins the equivalence engine-side
    // too (a prefilter bug that DROPPED a true hit would also fail the
    // oracle, but this failure reads as what it is)
    for (sf <- Seq(sfTiny, sfSmall)) {
      val exact = operators.Pipeline.docDecontaminate(spark, sf)
        .collect().map(_.toString).toSeq
      val xl = operators.Pipeline.docDecontaminateXl(spark, sf)
        .collect().map(_.toString).toSeq
      assert(xl == exact, s"xl decontamination diverged at $sf")
    }
  }

  test("doc_shard_pack: shards partition each language's docs in order") {
    val shards = operators.Pipeline.docShardPack(spark, sfTiny).collect()
    val docs = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), col("lang"),
        size(split(lower(trim(regexp_replace(col("text"), "\\s+", " "))),
          " ")).cast("long").as("n"))
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
    val cap = 2000L
    for ((lang, ss) <- shards.groupBy(_.getString(0))) {
      val sorted = ss.sortBy(_.getLong(1))
      // shard ids contiguous from 0 (greedy packing leaves no gaps)
      assert(sorted.map(_.getLong(1)).toSeq == (0L until sorted.length).toSeq,
        s"$lang: shard ids not contiguous")
      // every doc in exactly one shard: doc counts add up
      val langDocs = docs.filter(_._1 == lang)
      assert(sorted.map(_.getLong(2)).sum == langDocs.length,
        s"$lang: shard doc counts don't cover the language")
      // doc-id ranges are disjoint and ordered (first_doc/last_doc cols)
      val ranges = sorted.map(r => (r.getLong(4), r.getLong(5)))
      for (Seq((_, aEnd), (bStart, _)) <- ranges.toSeq.sliding(2))
        assert(aEnd < bStart, s"$lang: shard doc ranges overlap")
      // greedy overflow bound: a shard exceeds cap only via its LAST doc
      val maxDoc = langDocs.map(_._3).max
      for (s <- sorted)
        assert(s.getLong(3) <= cap + maxDoc,
          s"$lang shard ${s.getLong(1)}: tokens ${s.getLong(3)} exceed cap+maxdoc")
    }
  }

  test("doc_line_dedup conserves lines and keeps one copy per distinct line") {
    val out = operators.Pipeline.docLineDedup(spark, sfTiny).collect()
    for (r <- out)
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3),
        s"doc ${r.getLong(0)}: kept+dropped != lines")
    // global invariant: total kept = number of DISTINCT lines in the corpus
    // (first-occurrence-wins keeps exactly one of each), measured by an
    // independent distinct count over the same synthetic line split
    val L = 4
    val distinctLines = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), split(lower(trim(
        regexp_replace(col("text"), "\\s+", " "))), " ").as("toks"))
      .select(explode(sequence(lit(1), size(col("toks")), lit(L))).as("s"),
        col("toks"))
      .select(concat_ws(" ", slice(col("toks"), col("s"), lit(L))).as("line"))
      .distinct().count()
    assert(out.map(_.getLong(2)).sum == distinctLines,
      "sum of kept lines != distinct corpus lines")
  }

  test("filter_pushdown actually pushes predicates into the parquet scan") {
    val df = operators.Relational.filterPushdown(spark, sfTiny)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters: ["),
      "expected parquet PushedFilters in physical plan")
    assert(physical.contains("o_orderstatus"),
      "expected o_orderstatus among pushed filters")
  }

  test("q3_join_topk plans a broadcast join and TakeOrderedAndProject") {
    val physical = operators.Relational.q3JoinTopk(spark, sfTiny)
      .queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastHashJoin"), "dim join should broadcast")
    assert(physical.contains("TakeOrderedAndProject"),
      "top-k should plan as TakeOrderedAndProject, not global sort")
  }

  test("cdc_apply equals an independent last-writer-wins fold") {
    val e = Tables.events(spark, sfTiny)
      .select("user_id", "ts", "event_id", "value", "event_type").collect()
    val expected = e
      .groupBy(_.getLong(0))
      .flatMap { case (uid, rows) =>
        val last = rows.maxBy(r => (r.getTimestamp(1).getTime, r.getLong(2)))
        if (last.getString(4) == "error") None
        else Some(uid -> last.getLong(2))
      }
      .toMap
    val got = operators.Cdc.cdcApply(spark, sfTiny).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expected)
  }

  test("window_running final value per key equals the group total") {
    val running = operators.Windows.windowRunning(spark, sfTiny)
    val cols = running.columns
    assert(cols.contains("user_id"), s"unexpected schema: ${cols.mkString(",")}")
  }

  test("doc_dedup removes exactly the duplicate rows when dups exist") {
    import spark.implicits._
    // A doubled log must collapse to the single-copy distinct counts.
    val d = Tables.documents(spark, sfTiny)
    val doubled = d.unionByName(d)
    val h = md5(lower(trim(regexp_replace(col("text"), "\\s+", " "))))
    val uniq = doubled.select(h.as("h")).distinct().count()
    assert(uniq == d.count(), "dedup hash space must ignore duplication")
  }

  test("doc_near_dedup finds the planted near-duplicate pairs at sf0.01") {
    val pairs = operators.NearDup.docNearDedup(spark, sfSmall).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // High-overlap pairs measured independently from the shingle sets.
    assert(pairs.contains((98L, 290L)) && pairs.contains((70L, 447L)),
      s"expected planted near-dup pairs in $pairs")
    assert(pairs.forall { case (a, b) => a < b }, "pair order invariant")
  }

  test("embedding_knn ranks are dense, per-query, and cosine-sorted") {
    val rows = operators.Embeddings.embeddingKnn(spark, sfTiny).collect()
    val byQ = rows.groupBy(_.getLong(0))
    byQ.foreach { case (q, rs) =>
      val ranks = rs.map(_.getLong(1)).sorted.toSeq
      assert(ranks == (1L to ranks.length), s"ranks not dense for q=$q")
      val cosines = rs.sortBy(_.getLong(1)).map(_.getDouble(3)).toSeq
      assert(cosines == cosines.sorted.reverse, s"not cosine-sorted for q=$q")
      rs.foreach(r => assert(math.abs(r.getDouble(3)) <= 1.0 + 1e-9))
    }
  }

  test("embedding_knn_lsh is a subset-of-bucket approximation of knn") {
    val exact = operators.Embeddings.embeddingKnn(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val approx = operators.Embeddings.embeddingKnnLsh(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    // Approximate cosine values must agree exactly with the brute-force
    // computation wherever the same (query, neighbor) pair appears.
    val exactMap = exact.map { case (q, n, c) => (q, n) -> c }.toMap
    approx.foreach { case (q, n, c) =>
      exactMap.get((q, n)).foreach(e => assert(e == c,
        s"cosine mismatch for ($q,$n): lsh=$c exact=$e"))
    }
  }

  test("mm_decode stub is stable: same payload, same features") {
    val a = operators.Multimodal.mmDecode(spark, sfTiny).collect().toSeq
    val b = operators.Multimodal.mmDecode(spark, sfTiny).collect().toSeq
    assert(a.map(_.toString) == b.map(_.toString))
  }

  test("connectedComponents resolves a long chain (pointer jumping converges)") {
    import spark.implicits._
    // a 60-node path graph: diameter 59 — plain neighbor propagation
    // would need ~59 rounds; pointer jumping must still converge (to the
    // single component labeled by the minimum id) in logarithmically few
    val chain = (0L until 59L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = operators.Pipeline.connectedComponents(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.keySet == (0L to 59L).toSet)
    assert(labels.values.forall(_ == 0L), s"chain must collapse to one component: $labels")
    // two disjoint components keep separate minima
    val two = Seq((10L, 11L), (11L, 12L), (20L, 21L)).toDF("doc_a", "doc_b")
    val l2 = operators.Pipeline.connectedComponents(two)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l2 == Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("dedup_clusters is a valid components partition of the pair graph") {
    val pairs = operators.NearDup.docSimhashDup(spark, sfTiny)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val clusters = operators.Pipeline.dedupClusters(spark, sfTiny).collect()
    // every cluster is labeled by its minimum member and has >= 2 members
    clusters.foreach { r =>
      assert(r.getLong(0) == r.getLong(3), s"cluster label != min member: $r")
      assert(r.getLong(1) >= 2, s"singleton cluster from a pair graph: $r")
    }
    // clusters partition exactly the nodes that appear in pairs
    assert(clusters.map(_.getLong(1)).sum == nodes.size)
    // both endpoints of every pair landed in the same cluster: rebuild
    // membership from a reference union-find and compare cluster sizes
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n).toSeq: _*)
    def find(x: Long): Long = { if (parent(x) != x) parent(x) = find(parent(x)); parent(x) }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val ref = nodes.groupBy(find).map { case (r, ms) => (ms.min, ms.size.toLong) }
    val got = clusters.map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == ref, s"cluster partition differs from union-find reference")
  }

  test("corpus_mix rebalances: dominant stratum is sampled hardest") {
    // (lang, n_docs, lang_chars, thr, n_sampled, chars_after, xor)
    val rows = operators.Pipeline.corpusMix(spark, sfSmall).collect()
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(1), s"sampled more docs than exist: $r")
      assert(r.getLong(3) >= 0 && r.getLong(3) <= 65536, s"thr out of range: $r")
      assert(r.getLong(5) <= r.getLong(2), s"kept more chars than exist: $r")
    }
    // α<1 temperature smoothing keeps MORE of small strata than of the
    // dominant one: the largest-chars lang must have the smallest threshold
    val byChars = rows.sortBy(_.getLong(2))
    assert(byChars.last.getLong(3) == rows.map(_.getLong(3)).min,
      "dominant stratum does not have the lowest keep rate")
    // global char budget: kept chars stay in the (0.5·total, total) band —
    // smoothing shifts mass to small strata (they clamp at keep-all), so
    // the realized total lands above the 0.5 target, never at/above 1.0
    val total = rows.map(_.getLong(2)).sum.toDouble
    val kept = rows.map(_.getLong(5)).sum.toDouble
    assert(kept / total > 0.4 && kept / total < 0.95,
      s"kept char fraction ${kept / total} outside the plausible band")
  }

  test("embedding_semantic_dedup: cells conserve vectors and keep a survivor") {
    // (cell, n_vecs, n_dropped, n_kept, dropped_id_xor)
    val rows = operators.Embeddings.embeddingSemanticDedup(spark, sfSmall)
      .collect()
    val nVecs = graft.Tables.embeddings(spark, sfSmall).count()
    assert(rows.map(_.getLong(1)).sum == nVecs,
      "cells do not partition the collection")
    rows.foreach { r =>
      assert(r.getLong(3) == r.getLong(1) - r.getLong(2), s"kept+dropped!=n: $r")
      // the lowest-id vector of a cell has no lower-id in-cell neighbor,
      // so a nonempty cell can never drop everything
      assert(r.getLong(3) >= 1, s"cell dropped every vector: $r")
      assert((r.getLong(2) == 0) == r.isNullAt(4),
        s"xor null-ness disagrees with drop count: $r")
    }
  }

  test("doc_bpe_pairs: ranks dense, counts monotone, pairs well-formed") {
    val rows = operators.Docs.docBpePairs(spark, sfSmall).collect()
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).toSeq == (1L to sorted.length).toSeq,
        s"$lang ranks not dense")
      val counts = sorted.map(_.getLong(3))
      assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
        s"$lang counts not non-increasing")
      sorted.foreach { r =>
        val parts = r.getString(2).split(" ", -1)
        assert(parts.length == 2 && parts.forall(_.nonEmpty),
          s"malformed pair '${r.getString(2)}'")
      }
    }
  }

  test("cdc_snapshot_diff: applying the diff to OLD reconstructs NEW") {
    // independently rebuild the two LWW snapshot states, then check the
    // algebra: NEW = OLD minus deletes, plus inserts, with updates
    // replaced — and every key NOT in the diff is identical in both
    def lww(newToo: Boolean): Map[Long, (Long, Double)] = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      graft.Tables.events(spark, sfSmall)
        .filter(if (newToo) lit(true) else !(col("event_id") % 4 === 3))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("event_type") =!= "error")
        .select(col("user_id"), col("event_id"), col("value"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
        .toMap
    }
    val (oldSt, newSt) = (lww(false), lww(true))
    val diff = operators.Cdc.cdcSnapshotDiff(spark, sfSmall).collect()
    var rebuilt = oldSt
    diff.foreach { r =>
      val (u, change) = (r.getLong(0), r.getString(1))
      change match {
        case "insert" =>
          assert(!oldSt.contains(u) && r.isNullAt(2), s"bad insert: $r")
          rebuilt += u -> (r.getLong(3), r.getDouble(5))
        case "delete" =>
          assert(oldSt.contains(u) && r.isNullAt(3), s"bad delete: $r")
          rebuilt -= u
        case "update" =>
          assert(oldSt.contains(u) && r.getLong(2) != r.getLong(3),
            s"bad update: $r")
          rebuilt += u -> (r.getLong(3), r.getDouble(5))
      }
    }
    assert(rebuilt == newSt, "diff applied to OLD does not reconstruct NEW")
    val touched = diff.map(_.getLong(0)).toSet
    (oldSt.keySet ++ newSt.keySet).filterNot(touched).foreach { u =>
      assert(oldSt.get(u) == newSt.get(u), s"suppressed key $u changed")
    }
    assert(diff.map(_.getString(1)).toSet.subsetOf(
      Set("insert", "update", "delete")))
  }

  test("agg_bitmap_distinct bitmap popcounts equal plain countDistinct") {
    // the oracle already proves this cross-engine; this pins it ENGINE-side
    // so a bitmap-arithmetic regression fails fast with a readable diff
    val bitmap = operators.Olap.aggBitmapDistinct(spark, sfSmall).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val exact = graft.Tables.events(spark, sfSmall)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bitmap == exact, s"bitmap=$bitmap exact=$exact")
  }

  test("events_gapfill forward-fills exactly the last observation <= slot") {
    val rows = operators.TimeSeries.eventsGapfill(spark, sfSmall).collect()
    // independent LOCF reference: replay each user's observed (hour, value)
    // stream in order and carry the last value forward across the grid
    val byUser = rows.groupBy(_.getLong(0))
    byUser.foreach { case (_, rs) =>
      var carried: Option[Double] = None
      rs.sortBy(_.getString(1)).foreach { r =>
        if (!r.isNullAt(3)) carried = Some(r.getDouble(3))
        (carried, if (r.isNullAt(4)) None else Some(r.getDouble(4))) match {
          case (Some(c), Some(f)) => assert(c == f, s"LOCF mismatch: $r")
          case (None, None) => // before first observation: stays null
          case other => fail(s"fill null-ness diverged $other: $r")
        }
        // a slot with observations must surface its own last value
        if (r.getLong(2) > 0)
          assert(!r.isNullAt(3) && r.getDouble(4) == r.getDouble(3),
            s"observed slot not self-filled: $r")
      }
    }
    // the grid is complete: every user has every hour exactly once
    byUser.foreach { case (u, rs) =>
      assert(rs.length == 72 && rs.map(_.getString(1)).distinct.length == 72,
        s"user $u grid incomplete: ${rs.length}")
    }
  }

  test("join_bucketed equals the same aggregation over the flat tables") {
    val bucketed = SparkEntry.queries("join_bucketed")(spark, sfTiny)
      .collect().map(_.toSeq)
    val l = graft.Tables.lineitem(spark, sfTiny)
    val o = graft.Tables.orders(spark, sfTiny)
    val flat = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(l("l_orderkey").as("orderkey"), o("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
        graft.functions.Det.dsum6(
          l("l_extendedprice") * (lit(1) - l("l_discount"))).as("revenue"))
      .filter(col("n_lines") >= 6)
      .orderBy(col("orderkey"))
      .collect().map(_.toSeq)
    assert(bucketed.nonEmpty && bucketed.toSeq == flat.toSeq,
      "bucketed result diverged from flat-table result")
  }

  test("cdc_jsonl_apply equals cdc_apply: the JSONL round-trip is lossless") {
    val fromParquet = operators.Cdc.cdcApply(spark, sfTiny)
      .collect().map(_.toSeq)
    val fromJsonl = sources.ChangeLog.cdcJsonlApply(spark, sfTiny)
      .collect().map(_.toSeq)
    assert(fromParquet.nonEmpty && fromJsonl.toSeq == fromParquet.toSeq,
      "JSONL-sourced apply diverged from the parquet-sourced apply")
  }

  test("doc_dup_spans equals a brute-force span-coverage recount") {
    // independent reference: materialize every 8-token gram per doc in
    // plain Scala, find grams in ≥2 docs, union their covered positions
    val docs = graft.Tables.documents(spark, sfTiny)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).trim.toLowerCase.split("\\s+").toSeq))
    val gramDocs = scala.collection.mutable.Map.empty[Seq[String], Set[Long]]
    docs.foreach { case (id, _, toks) =>
      toks.sliding(8).filter(_.length == 8).foreach { g =>
        gramDocs(g) = gramDocs.getOrElse(g, Set.empty) + id
      }
    }
    val sharedG = gramDocs.filter(_._2.size >= 2).keySet
    val refPerLang = docs.groupBy(_._2).map { case (lang, ds) =>
      val perDoc = ds.map { case (id, _, toks) =>
        val covered = toks.sliding(8).zipWithIndex
          .filter { case (g, _) => g.length == 8 && sharedG(g) }
          .flatMap { case (_, i) => i until i + 8 }.toSet
        (id, covered.size)
      }
      val hits = perDoc.filter(_._2 > 0)
      lang -> (ds.length.toLong, hits.length.toLong,
        hits.map(_._2.toLong).sum, ds.map(_._3.length.toLong).sum,
        hits.map(_._1).foldLeft(0L)(_ ^ _))
    }
    val got = operators.Pipeline.docDupSpans(spark, sfTiny).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got == refPerLang, s"got=$got ref=$refPerLang")
  }

  test("events_anomaly agrees with an independently-computed 3-sigma rule") {
    import org.apache.spark.sql.functions.{abs => fAbs}
    val rows = operators.Analytics.eventsAnomaly(spark, sfSmall).collect()
    // independent recompute with Spark's own Welford aggregates: counts
    // must agree (the 3σ boundary sits far from any float-rounding edge)
    val ev = graft.Tables.events(spark, sfSmall)
    val ref = ev.groupBy(col("event_type"))
      .agg(avg(col("value")).as("mu"),
        stddev_pop(col("value")).as("sigma"))
    val refCounts = ev.join(ref, Seq("event_type"))
      .filter(fAbs(col("value") - col("mu")) > col("sigma") * lit(3.0))
      .groupBy(col("event_type")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (et, n) = (r.getString(0), r.getLong(4))
      assert(n == refCounts.getOrElse(et, 0L),
        s"$et anomaly count $n != welford-reference ${refCounts.get(et)}")
      // >= not >: max_z is rounded to 6dp, which can floor a just-past-3σ
      // z (e.g. 3.0000004) back onto the boundary
      if (n > 0) assert(r.getDouble(6) >= 3.0, s"$et max_z not beyond 3σ: $r")
      assert((n == 0) == r.isNullAt(5), s"$et xor null-ness wrong: $r")
    }
  }

  test("join_interval_bins matches the unbinned brute-force overlap join") {
    // ground truth: the same sessions, joined by the RAW overlap predicate
    // (no bins, no canonical-bin dedup) — if binning dropped or
    // double-counted any pair the counts diverge
    val e = graft.Tables.events(spark, sfTiny)
    val ord = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(ord))
    val sess = e.withColumn("is_start",
        when(gapUs.isNull || gapUs > 1800L * 1000000L, 1L).otherwise(0L))
      .withColumn("sno", sum(col("is_start")).over(ord.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sno"))
      .agg(min(unix_micros(col("ts"))).as("s"), max(unix_micros(col("ts"))).as("en"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ref = sess.map { case (u, no, s, en) =>
      (u, no) -> sess.count { case (u2, _, s2, e2) =>
        u2 != u && s <= e2 && s2 <= en }.toLong
    }.toMap
    val got = operators.Intervals.joinIntervalBins(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(got == ref, s"binned overlap counts diverge from brute force")
  }

  test("agg_hist_quantile brackets the exact quantile within one bin") {
    val prices = graft.Tables.lineitem(spark, sfTiny)
      .select(col("l_extendedprice")).collect().map(_.getDouble(0)).sorted
    val n = prices.length
    operators.Analytics.aggHistQuantile(spark, sfTiny).collect().foreach { r =>
      val (q, est) = (r.getLong(0), r.getDouble(1))
      val exact = prices(((n * q + 99) / 100 - 1).toInt)
      // estimate = upper edge of the crossing bin: never below the exact
      // quantile, and at most one $108 bin above it
      assert(est >= exact && est - exact <= 108.0,
        s"p$q est $est vs exact $exact not within one bin")
      assert(r.getLong(2) == n.toLong, s"n_rows ${r.getLong(2)} != $n")
    }
  }

  test("agg_hist_rollup partial-merge equals a direct per-quarter sketch") {
    val rows = graft.Tables.lineitem(spark, sfTiny)
      .select(date_format(date_trunc("quarter", col("l_shipdate")), "yyyy-MM-dd"),
        col("l_extendedprice"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val ref = rows.groupBy(_._1).toSeq.flatMap { case (q, g) =>
      val bins = g.map { case (_, p) => ((p * 100 + 0.5).toLong) / 10800L }
      val n = bins.length.toLong
      val hist = bins.groupBy(identity).view.mapValues(_.length.toLong)
      val sortedBins = hist.keys.toSeq.sorted
      Seq(25L, 50L, 75L, 95L).map { qp =>
        val rank = (n * qp + 99) / 100
        var cum = 0L
        val qbin = sortedBins.find { b => cum += hist(b); cum >= rank }.get
        (q, qp, (qbin + 1) * 10800 / 100.0, n)
      }
    }.sortBy(t => (t._1, t._2))
    val got = operators.Analytics.aggHistRollup(spark, sfTiny).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
    assert(got == ref, "rolled-up quantiles diverge from direct per-quarter sketch")
  }

  test("events_transitions mass balance: sum(n_ab) = n_events - n_users") {
    val e = graft.Tables.events(spark, sfTiny)
    val expected = e.count() - e.select(col("user_id")).distinct().count()
    val rows = operators.TimeSeries.eventsTransitions(spark, sfTiny).collect()
    assert(rows.map(_.getLong(2)).sum == expected,
      "per-user bigram counts must total events minus one per user")
    // lift sanity: Σ n_ab·lift over the independence model reconstructs ~n
    rows.foreach(r => assert(r.getLong(3) > 0, s"nonpositive lift: $r"))
  }

  test("doc_heavy_hitters equals a driver-side brute-force exact recount") {
    val toks = graft.Tables.documents(spark, sfSmall)
      .select(col("text")).collect().map(_.getString(0))
      .flatMap(_.replaceAll("\\s+", " ").trim.toLowerCase.split(" "))
      .filter(_.nonEmpty)
    val n = toks.length.toLong
    val ref = toks.groupBy(identity).map { case (t, g) => (t, g.length.toLong) }
      .filter { case (_, f) => f * 200 > n }
      .map { case (t, f) => (t, f, f * 1000000L / n) }
      .toSeq.sortBy { case (t, f, _) => (-f, t) }
    val got = operators.Docs.docHeavyHitters(spark, sfSmall).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == ref, s"sketch+exact-verify diverges from brute force")
  }

  test("property: Misra-Gries candidates ⊇ all >n/K items under arbitrary split+merge") {
    val agg = graft.functions.MisraGriesAgg.mg
    val K = graft.functions.MisraGriesAgg.K
    for (seed <- 1L to 5L) {
      // zipf-ish stream: heavy head over a long uniform tail, so some items
      // genuinely cross the n/K guarantee line
      val stream = sample(org.scalacheck.Gen.listOfN(4000,
        org.scalacheck.Gen.frequency(
          30 -> org.scalacheck.Gen.oneOf("hh1", "hh2", "hh3"),
          70 -> org.scalacheck.Gen.choose(1, 5000).map("t" + _))), seed)
      val n = stream.length
      val exact = stream.groupBy(identity).view.mapValues(_.size).toMap
      val mustKeep = exact.collect { case (t, f) if f.toLong * K > n => t }.toSet
      // fold in uneven chunks, merge in a shuffled order — the partition
      // layout a real cluster would produce
      val chunks = stream.grouped(700).toSeq
      val partials = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
      val shuffled = new scala.util.Random(seed).shuffle(partials)
      val cands = agg.finish(shuffled.reduce(agg.merge)).toSet
      assert(mustKeep.subsetOf(cands),
        s"seed=$seed lost guaranteed items: ${mustKeep -- cands}")
      assert(cands.size <= K, s"seed=$seed sketch exceeded K: ${cands.size}")
    }
  }

  test("events_bitmap_overlap equals a direct distinct-set recount") {
    val rows = graft.Tables.events(spark, sfTiny)
      .filter(col("event_type").isin("click", "purchase"))
      .select(date_format(to_date(col("ts")), "yyyy-MM-dd"),
        col("user_id"), col("event_type"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val ref = rows.groupBy(_._1).toSeq.map { case (d, g) =>
      val c = g.filter(_._3 == "click").map(_._2).toSet
      val p = g.filter(_._3 == "purchase").map(_._2).toSet
      val both = (c & p).size.toLong
      (d, c.size.toLong, p.size.toLong, both,
        both * 1000000L / (c.size + p.size - both))
    }.sortBy(_._1)
    val got = operators.Olap.eventsBitmapOverlap(spark, sfTiny).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == ref, "bitmap AND algebra diverges from set recount")
    // algebraic sanity independent of the recount
    got.foreach { case (d, c, p, both, _) =>
      assert(both <= math.min(c, p), s"$d: intersection exceeds a side")
    }
  }

  test("agg_hist_quantile estimates are monotone in q") {
    val ests = operators.Analytics.aggHistQuantile(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).map(_._2)
    assert(ests.zip(ests.tail).forall { case (a, b) => a <= b },
      s"quantile estimates not monotone: ${ests.mkString(",")}")
  }

  test("sample_weighted priorities match a direct per-doc recompute") {
    val docs = graft.Tables.documents(spark, sfTiny)
      .select(col("doc_id"), col("n_chars")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val ref = docs.map { case (id, nc) =>
      val copies = ((nc + 63) / 64).toInt
      (id, nc, (1 to copies).map(i => md5hex(s"$id#$i")).min)
    }.sortBy(t => (t._3, t._1)).take(20).toSeq
    val got = operators.Pipeline.sampleWeighted(spark, sfTiny).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == ref, s"weighted sample diverges from direct recompute")
  }

  test("cdc_forget_audit equals a sequential per-key replay reference") {
    // replay the log per key driver-side: a key is forget-requested iff
    // it ever saw a delete; it violates iff ANY op (of either kind)
    // lands strictly after its latest delete on the (ts, event_id)
    // total order — including the equal-ts-higher-id edge
    val rows = Tables.events(spark, sfTiny)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000 +
        r.getTimestamp(1).getNanos / 1000 % 1000, r.getLong(2),
        r.getString(3) == "error"))
    val byKey = rows.groupBy(_._1)
    val forget = byKey.filter(_._2.exists(_._4))
    val stats = forget.map { case (uid, ops) =>
      val ld = ops.filter(_._4).map(o => (o._2, o._3)).max
      val la = ops.map(o => (o._2, o._3)).max
      val viol = Ordering[(Long, Long)].gt(la, ld)
      (uid, ops.length.toLong, viol,
        if (viol) (la._1 - ld._1) / 1000000L else 0L)
    }.toSeq
    val wantViol = stats.filter(_._3)
    val want = (forget.size.toLong, wantViol.size.toLong,
      (forget.size - wantViol.size).toLong,
      if (wantViol.isEmpty) 0L else wantViol.map(_._1).reduce(_ ^ _),
      if (wantViol.isEmpty) 0L else wantViol.map(_._4).max,
      stats.map(_._2).sum)
    val got = SparkEntry.queries("cdc_forget_audit")(spark, sfTiny)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).head
    assert(got == want, s"got=$got\nwant=$want")
  }

  test("cdc_inc_apply equals a sequential ordered replay") {
    // fold each key's ops in (ts, event_id) order: reset zeroes the
    // counter and its inc count, an increment adds — the op-based apply
    // must equal the ordered replay even though it computes order-free
    val rows = Tables.events(spark, sfTiny)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"),
        col("event_type")).collect()
      .map(r => (r.getLong(0),
        (r.getTimestamp(1).getTime * 1000 +
          r.getTimestamp(1).getNanos / 1000 % 1000, r.getLong(2)),
        math.rint(r.getDouble(3) * 100).toLong, r.getString(4) == "error"))
    val want = rows.groupBy(_._1).toSeq.flatMap { case (uid, ops) =>
      var n = 0L; var sum = 0L
      var last: Option[(Long, Long)] = None
      for ((_, ord, cents, isReset) <- ops.sortBy(_._2)) {
        if (isReset) { n = 0; sum = 0; last = None }
        else { n += 1; sum += cents; last = Some(ord) }
      }
      last.map(l => (uid, n, sum, l._2))
    }.sortBy(_._1)
    val got = SparkEntry.queries("cdc_inc_apply")(spark, sfTiny)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(4))).toSeq
    assert(got == want, s"got=$got\nwant=$want")
  }

  test("cdc_gap_detection recovers exactly the dropped offsets") {
    // the detector must find EXACTLY the simulated drops (event_id %
    // 101 == 0) that precede each partition's last received offset —
    // tail losses are undetectable by declared semantics (none exist
    // here: the max id is not a multiple of 101 at this SF)
    val n = Tables.events(spark, sfTiny).count()
    val want = (0L until n).filter(_ % 101 == 0).groupBy(_ % 8)
      .map { case (p, ids) => p -> (ids.size.toLong,
        ids.reduce(_ ^ _)) }
    val got = SparkEntry.queries("cdc_gap_detection")(spark, sfTiny)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(4), r.getLong(5))).toMap
    for ((p, (cnt, xor)) <- want) {
      assert(got(p) == ((cnt, xor)),
        s"partition $p: got ${got(p)}, want ($cnt, $xor)")
    }
    assert(got.values.map(_._1).sum == want.values.map(_._1).sum,
      "phantom missing offsets reported")
  }

  test("cdc_dual_wire_merge: wire round-trip is identity and state ≡ cdc_apply") {
    // the dual-wire hub must produce EXACTLY cdc_apply's state on the
    // shared columns (encode→decode→normalize is the identity on every
    // row), plus correct wire provenance and per-wire censuses
    val got = SparkEntry.queries("cdc_dual_wire_merge")(spark, sfTiny)
      .collect()
    val plain = SparkEntry.queries("cdc_apply")(spark, sfTiny).collect()
    assert(got.length == plain.length, "row-count drift vs cdc_apply")
    for ((g, p) <- got.zip(plain)) {
      assert((g.getLong(0), g.getString(1), g.getLong(2)) ==
        ((p.getLong(0), p.getString(1), p.getLong(2))), s"key/ts drift: $g vs $p")
      assert(g.isNullAt(3) == p.isNullAt(3) &&
        (g.isNullAt(3) || g.getDouble(3) == p.getDouble(3)),
        s"value did not survive the wire round-trip: $g vs $p")
      // provenance = parity of the winning op id; censuses partition the
      // user's ops between the wires
      assert(g.getString(4) == (if (g.getLong(2) % 2 == 0) "mongo" else "mysql"),
        s"wire provenance wrong: $g")
    }
    val censuses = got.map(r => r.getLong(5) + r.getLong(6)).sum
    val deleted = Tables.events(spark, sfTiny)
      .groupBy(col("user_id")).count().count() - got.length
    assert(censuses > 0 && deleted >= 0, "degenerate census")
  }

  test("cdc_chunked_snapshot: chunked bootstrap reconstructs cdc_apply exactly") {
    // the union of all chunk bootstraps must be EXACTLY the atomic
    // full-log apply: same live-key count, same key xor — at every chunk
    // granularity the algebra holds (the oracle checks per-chunk; this
    // pins the cross-operator global identity)
    val rows = SparkEntry.queries("cdc_chunked_snapshot")(spark, sfTiny)
      .collect()
    val plain = SparkEntry.queries("cdc_apply")(spark, sfTiny)
      .collect().map(_.getLong(0))
    assert(rows.map(_.getLong(4)).sum == plain.length,
      "chunked live count != cdc_apply live count")
    val gotXor = rows.map(r => if (r.isNullAt(5)) 0L else r.getLong(5))
      .reduce(_ ^ _)
    assert(gotXor == plain.reduce(_ ^ _), "chunked live xor != cdc_apply")
    // every chunk that saw ops reports, even with an empty snapshot
    assert(rows.map(_.getLong(0)).toSet.size == rows.length)
  }

  test("orders_fill_rate equals a sequential SLA-band reference") {
    val ship = Tables.lineitem(spark, sfTiny)
      .select(col("l_orderkey"), to_date(col("l_shipdate")).as("d"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).max }
    val orders = Tables.orders(spark, sfTiny)
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("d"))
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val spans = orders.flatMap { case (k, od) =>
      ship.get(k).map { ls =>
        (od.withDayOfMonth(1).toString,
          java.time.temporal.ChronoUnit.DAYS.between(od, ls)) }
    }
    val want = spans.groupBy(_._1).toSeq.sortBy(_._1).map { case (m, v) =>
      val n = v.length.toLong
      val c = (b: Long) => v.count(_._2 <= b).toLong
      (m, n, c(30) * 1000000L / n, c(60) * 1000000L / n,
        c(90) * 1000000L / n, v.map(_._2).max)
    }
    val got = SparkEntry.queries("orders_fill_rate")(spark, sfTiny)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == want, s"got=$got\nwant=$want")
  }

  test("events_dau_mau bitmask fold equals naive distinct-set counting") {
    // independent re-derivation with plain Sets — no bitmasks: pins that
    // the packed day-bit OR-fold computes the DECLARED MAU / ΣDAU /
    // active-day semantics, not merely something both engines agree on
    val rows = Tables.events(spark, sfTiny)
      .select(date_format(col("ts"), "yyyy-MM").as("m"), col("event_type"),
        col("user_id"), dayofmonth(col("ts")).as("d"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    val want = rows.groupBy(t => (t._1, t._2)).toSeq.sortBy(_._1).map {
      case ((m, ty), v) =>
        val byUser = v.groupBy(_._3).map { case (_, es) =>
          es.map(_._4).toSet }
        val mau = byUser.size.toLong
        val dauTotal = byUser.map(_.size.toLong).sum
        val nDays = byUser.flatten.toSet.size.toLong
        (m, ty, mau, dauTotal, nDays, dauTotal * 1000000L / (mau * nDays))
    }
    val got = SparkEntry.queries("events_dau_mau")(spark, sfTiny)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == want, s"got=$got\nwant=$want")
  }

  test("q21_sole_returner equals the textbook EXISTS/NOT-EXISTS evaluation") {
    // literal quantifier semantics over driver-side collections: supplier
    // s qualifies on order o iff s shipped an R-flagged line of o, SOME
    // other supplier shipped a line of o, and NO other supplier shipped
    // an R-flagged line of o — pins that the grouped fold implements the
    // quantifier pair, not merely something both engines agree on
    val fOrders = Tables.orders(spark, sfTiny)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey")).collect().map(_.getLong(0)).toSet
    val lines = Tables.lineitem(spark, sfTiny)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_returnflag"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .filter(t => fOrders.contains(t._1))
    val byOrder = lines.groupBy(_._1)
    val counts = scala.collection.mutable.Map.empty[Long, Long]
    for ((_, ls) <- byOrder) {
      val supps = ls.map(_._2).toSet
      for (s <- supps) {
        val sHasR = ls.exists(l => l._2 == s && l._3 == "R")
        val otherExists = (supps - s).nonEmpty
        val otherHasR = ls.exists(l => l._2 != s && l._3 == "R")
        if (sHasR && otherExists && !otherHasR)
          counts(s) = counts.getOrElse(s, 0L) + 1L
      }
    }
    val want = counts.toSeq.sortBy { case (s, n) => (-n, s) }.take(10)
    val got = SparkEntry.queries("q21_sole_returner")(spark, sfTiny)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(got == want, s"got=$got\nwant=$want")
  }

  test("q2_min_cost_supp equals a direct per-part argmin recompute") {
    val parts = Tables.part(spark, sfTiny)
      .filter(col("p_size").between(10, 20) && col("p_type") === "STANDARD")
      .select(col("p_partkey")).collect().map(_.getLong(0)).toSet
    val cost = Tables.lineitem(spark, sfTiny)
      .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        math.round(r.getDouble(2) * 100)))
      .filter(t => parts.contains(t._1._1))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val want = cost.groupBy(_._1._1).map { case (pk, m) =>
      val (sk, c) = m.toSeq.map { case ((_, s), c) => (s, c) }
        .minBy { case (s, c) => (c, s) }
      (pk, sk, c)
    }.toSeq.sortBy { case (pk, _, c) => (c, pk) }.take(20)
    val got = SparkEntry.queries("q2_min_cost_supp")(spark, sfTiny)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4))).toSeq
    assert(got == want, s"got=$got\nwant=$want")
  }

  test("events_benford digits partition the rows and expectations sum to 1e6") {
    val got = SparkEntry.queries("events_benford")(spark, sfTiny).collect()
    val n = Tables.events(spark, sfTiny)
      .filter(graft.functions.Det.scaledLong(col("value"), 100L) > 0).count()
    assert(got.map(_.getLong(1)).sum == n,
      "digit census does not partition the positive-cents rows")
    assert(got.map(_.getLong(3)).sum == 1000000L,
      "Benford expected shares must sum to exactly 1e6 ppm")
    // independent digit extraction: numeric first-significant-digit
    val cents = Tables.events(spark, sfTiny)
      .select(graft.functions.Det.scaledLong(col("value"), 100L).as("c"))
      .collect().map(_.getLong(0)).filter(_ > 0)
    val want = cents.map { c =>
      var x = c; while (x >= 10) x /= 10; x
    }.groupBy(identity).map { case (d, v) => d -> v.size.toLong }
    val gotMap = got.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotMap == want, s"got=$gotMap\nwant=$want")
  }

  test("cdc_replication_lag equals a sequential batch-close replay") {
    val lags = Tables.events(spark, sfTiny)
      .select(col("event_type"), expr("unix_micros(ts)").as("us"))
      .collect().map(r => (r.getString(0), {
        val s = r.getLong(1) / 1000000L
        (s / 300L + 1L) * 300L - s
      }))
    val want = lags.groupBy(_._1).toSeq.sortBy(_._1).map { case (ty, v) =>
      val ls = v.map(_._2).sorted
      val n = ls.length.toLong
      // p95 = smallest lag whose cumulative count clears 95% (integer
      // cross-multiply) — same rule as the query
      val p95 = ls.zipWithIndex
        .find { case (_, i) => (i + 1) * 100L >= n * 95L }.get._1
      (ty, n, ls.max, ls.sum * 1000L / n, p95)
    }
    val got = SparkEntry.queries("cdc_replication_lag")(spark, sfTiny)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == want, s"got=$got\nwant=$want")
  }

  // ---- round-9 sequential references ------------------------------------

  private def scaled(d: Double, s: Long): Long =
    if (d >= 0) (d * s + 0.5).toLong else (d * s - 0.5).toLong

  test("agg_weighted_median equals a sequential weighted-walk reference") {
    val rows = Tables.lineitem(spark, sfTiny)
      .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
      .collect()
      .map(r => (r.getString(0), scaled(r.getDouble(1), 100L),
        scaled(r.getDouble(2), 1L)))
    val want = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (f, v) =>
      val byCents = v.groupBy(_._2).map { case (c, g) =>
        c -> g.map(_._3).sum }.toSeq.sortBy(_._1)
      val totw = byCents.map(_._2).sum
      var cum = 0L
      val med = byCents.find { case (_, w) =>
        cum += w; cum * 2 >= totw }.get._1
      (f, med, totw)
    }
    val got = SparkEntry.queries("agg_weighted_median")(spark, sfTiny)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want, s"got=$got\nwant=$want")
  }

  test("dq_ks_test equals a sequential exact-CDF-gap reference") {
    val cut = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val rows = Tables.events(spark, sfTiny)
      .select(col("event_type"), col("value"), col("ts")).collect()
      .map(r => (r.getString(0), scaled(r.getDouble(1), 100L),
        r.getTimestamp(2).before(cut)))
    val want = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (ty, v) =>
      val na = v.count(_._3).toLong; val nb = v.size - na
      val domain = v.map(_._2).distinct.sorted
      var cuma = 0L; var cumb = 0L
      var bestGap = -1L; var bestCents = 0L
      for (c <- domain) {
        cuma += v.count(e => e._2 == c && e._3)
        cumb += v.count(e => e._2 == c && !e._3)
        val gap = math.abs(cuma * nb - cumb * na)
        if (gap > bestGap) { bestGap = gap; bestCents = c }
      }
      val drift = bestGap.toDouble / (na.toDouble * nb.toDouble) >
        1.358 * math.sqrt((na + nb).toDouble / (na.toDouble * nb.toDouble))
      (ty, na, nb, bestGap * 1000 / (na * nb), bestCents, drift)
    }
    val got = SparkEntry.queries("dq_ks_test")(spark, sfTiny)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))).toSeq
    assert(got == want, s"got=$got\nwant=$want")
  }

  test("corpus_dsir equals a sequential importance-ratio reference") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def bucket(tok: String): Long =
      java.lang.Long.parseLong(md5hex(tok).take(8), 16) % 1024L
    val docs = Tables.documents(spark, sfTiny)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).trim.toLowerCase.split("\\s+").toSeq))
    val toks = docs.flatMap { case (id, lang, ts) =>
      ts.map(t => (id, lang, bucket(t))) }
    val byBucket = toks.groupBy(_._3)
    val wppm = byBucket.map { case (b, v) =>
      b -> ((v.count(_._2 == "en") + 1L) * 1000000L / (v.size + 1L)) }
    val want = docs.map { case (id, lang, ts) =>
      val n = ts.size.toLong
      val sw = ts.map(t => wppm(bucket(t))).sum
      (id, lang, n, sw / n)
    }.sortBy(t => (-t._4, t._1)).take(100).toSeq
    val got = SparkEntry.queries("corpus_dsir")(spark, sfTiny)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == want, s"got=${got.take(5)}...\nwant=${want.take(5)}...")
  }

  test("embedding_bq_knn equals a sequential sign-bit Hamming reference") {
    val vecs = Tables.embeddings(spark, sfTiny)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def words(e: Array[Float]): (Long, Long) = {
      def w(lo: Int, hi: Int): Long =
        (hi to lo by -1).foldLeft(0L)((acc, i) =>
          acc * 2 + (if (e(i - 1) >= 0f) 1L else 0L))
      (w(1, 32), w(33, 64))
    }
    def dotS(a: Array[Float], b: Array[Float]): Long =
      (0 until 64).map(i =>
        math.floor(a(i).toDouble * b(i).toDouble * 1e14).toLong).sum
    val bq = vecs.map { case (id, e) => (id, words(e), e) }
    val want = bq.filter(_._1 < 8).sortBy(_._1).flatMap {
      case (q, (qw0, qw1), qe) =>
        val top = bq.filter(_._1 != q).map { case (c, (w0, w1), _) =>
          (c, java.lang.Long.bitCount(w0 ^ qw0) +
            java.lang.Long.bitCount(w1 ^ qw1)) }
          .sortBy { case (c, h) => (h, c) }.take(5)
        top.zipWithIndex.map { case ((c, h), i) =>
          val ce = vecs.find(_._1 == c).get._2
          val cos = dotS(qe, ce).toDouble /
            math.sqrt(dotS(qe, qe).toDouble * dotS(ce, ce).toDouble)
          (q, (i + 1).toLong, c, h.toLong, cos)
        }
    }.toSeq
    val got = SparkEntry.queries("embedding_bq_knn")(spark, sfTiny)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got == want, s"got=${got.take(6)}\nwant=${want.take(6)}")
  }
}
