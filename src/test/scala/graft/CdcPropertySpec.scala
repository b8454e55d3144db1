package graft

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.streaming.Streams
import graft.streaming.Streams.ChangeEvent

/** Property-based checks of the CDC apply/merge algebra (SURVEY.md §5.4):
  * over random op logs, the distributed last-writer-wins collapse must
  * agree with a sequential reference fold, splitting the log into
  * arbitrary micro-batches must not change the result (associativity — the
  * exactly-once restart story), and applying twice must be a no-op
  * (idempotence). Uses raw ScalaCheck generators over fixed seeds (the
  * scalatest bridge artifact isn't on the offline classpath).
  */
class CdcPropertySpec extends SparkSpec {

  private val genEvent: Gen[ChangeEvent] = for {
    id <- Gen.choose(1L, 500L)
    tsMin <- Gen.choose(0, 1000)
    user <- Gen.choose(1L, 8L)
    typ <- Gen.oneOf("view", "click", "purchase", "error")
    value <- Gen.choose(0, 10000).map(_ / 100.0)
  } yield ChangeEvent(id, new Timestamp(1700000000000L + tsMin * 60000L),
    user, typ, value, "{}")

  /** Unique event ids: (ts, event_id) is the apply order's tiebreaker. */
  private val genLog: Gen[List[ChangeEvent]] =
    Gen.listOfN(60, genEvent).map(
      _.groupBy(_.event_id).values.map(_.head).toList)

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  /** Sequential reference: fold the log in (ts, id) order into a map. */
  private def referenceFold(log: Seq[ChangeEvent]): Map[Long, Long] =
    log.sortBy(e => (e.ts.getTime, e.event_id))
      .foldLeft(Map.empty[Long, (Long, Boolean)]) { (m, e) =>
        m.updated(e.user_id, (e.event_id, e.event_type == "error"))
      }
      .collect { case (u, (id, dead)) if !dead => u -> id }

  private def stateToMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    Streams.finalState(df).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap

  test("applyLog over random logs equals the sequential reference fold") {
    import spark.implicits._
    for (seed <- 1L to 12L) {
      val log = sample(genLog, seed)
      assert(stateToMap(Streams.applyLog(log.toDF())) == referenceFold(log),
        s"seed=$seed")
    }
  }

  test("resume from committed offsets equals the unbroken apply at every cut") {
    // the cdc_resume_offsets contract: key-hash partition routing + a
    // per-partition committed offset; a consumer that applies the prefix
    // (offset <= cut per partition), persists state, restarts, and
    // applies only ops AFTER its committed offsets must converge to the
    // unbroken full apply — for ANY per-partition cut vector
    import spark.implicits._
    for (seed <- 1L to 8L) {
      val log = sample(genLog, seed)
      val full = stateToMap(Streams.applyLog(log.toDF()))
      // per-partition cut: commit the offset at a seed-dependent fraction
      val byPart = log.groupBy(_.user_id % 4)
      val cut: Map[Long, Long] = byPart.map { case (p, ops) =>
        val ids = ops.map(_.event_id).sorted
        p -> ids((ids.size * ((seed % 3) + 1) / 4).toInt.min(ids.size - 1))
      }
      val prefix = log.filter(e => e.event_id <= cut(e.user_id % 4))
      val suffix = log.filter(e => e.event_id > cut(e.user_id % 4))
      // resume = LWW over (prefix-state ∪ suffix): state rows —
      // INCLUDING tombstones, which must survive the restart or a
      // lower-ts suffix op resurrects a deleted key — re-enter carrying
      // their original (ts, id), the Kafka-compaction rebuild path
      val state1 = Streams.applyLog(prefix.toDF())
      val stateAsOps = state1.collect().map(r =>
        prefix.find(_.event_id == r.getLong(2)).get)
      val resumed = stateToMap(
        Streams.applyLog((stateAsOps.toList ++ suffix).toDF()))
      assert(resumed == full, s"seed=$seed cut=$cut")
    }
  }

  test("compaction's upsert records ARE cdc_apply's state") {
    import org.apache.spark.sql.functions._
    // replaying only the compacted log's live records must rebuild the
    // exact applied state — the guarantee log compaction exists to give
    val compacted = operators.Cdc.cdcCompaction(spark, sfTiny)
      .filter(col("op") === "upsert")
      .select(col("user_id"), col("last_ts"), col("last_event_id"),
        col("last_value"))
    val applied = operators.Cdc.cdcApply(spark, sfTiny)
    assert(compacted.collect().toSeq == applied.collect().toSeq)
    // tombstones survive ONLY inside the retention horizon
    val e = Tables.events(spark, sfTiny)
    val horizonUs = e.agg(
      expr("unix_micros(max(ts) - INTERVAL 7 DAY)")).collect()(0).getLong(0)
    val tombs = operators.Cdc.cdcCompaction(spark, sfTiny)
      .filter(col("op") === "delete")
      .select(expr("unix_micros(to_timestamp(last_ts))")).collect()
    assert(tombs.forall(_.getLong(0) >= horizonUs))
  }

  test("at-least-once apply converges to the exactly-once state") {
    import org.apache.spark.sql.functions._
    // the duplicated-wire apply's state columns must be ROW-IDENTICAL to
    // cdc_apply (idempotence-key dedup makes redelivery invisible), and
    // the audit must account every duplicate (delivered - unique =
    // #odd event_ids, the declared amplification)
    val alo = operators.Cdc.cdcAtLeastOnce(spark, sfTiny).collect()
    val exact = operators.Cdc.cdcApply(spark, sfTiny).collect()
    assert(alo.map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.getDouble(3))).toSeq ==
      exact.map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq,
      "at-least-once state diverges from exactly-once")
    val nOdd = Tables.events(spark, sfTiny)
      .filter(col("event_id") % 2 === 1).count()
    val (delivered, unique) = (alo.head.getLong(4), alo.head.getLong(5))
    assert(delivered - unique == nOdd,
      s"audit mismatch: delivered=$delivered unique=$unique odd=$nOdd")
  }

  test("incremental mergeState over any batch split equals one-shot apply") {
    import spark.implicits._
    for (seed <- 1L to 8L) {
      val log = sample(genLog, seed)
      val nSplits = 1 + (seed % 4).toInt
      val batches = log.grouped(math.max(1, log.size / nSplits)).toSeq
      val incremental = batches.map(b => Streams.applyLog(b.toDF()))
        .reduce((s, b) => Streams.mergeState(s, b))
      assert(stateToMap(incremental) == referenceFold(log), s"seed=$seed")
    }
  }

  test("incremental join view equals a sequential reference over random interleaved logs") {
    import spark.implicits._
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneOffset.UTC)
    def f(t: Timestamp): String = fmt.format(t.toInstant)
    for (seed <- 30L to 36L) {
      val log = sample(genLog, seed)
      // delta membership is event_id % 4 == 3 (the query's split), which
      // interleaves with base TIME — the tombstone-retention edge: a
      // base-final 'error' must not be resurrected by an older delta row
      val got = graft.operators.Cdc.incrementalJoin(log.toDF())
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
          r.getString(3), r.getDouble(4))).toSet
      def side(keep: String): Map[Long, ChangeEvent] =
        log.filter(e => e.event_type == keep || e.event_type == "error")
          .sortBy(e => (e.ts.getTime, e.event_id))
          .foldLeft(Map.empty[Long, ChangeEvent])(
            (m, e) => m.updated(e.user_id, e))
          .filter { case (_, e) => e.event_type == keep }
      val a = side("view")
      val b = side("click")
      val want = a.keySet.intersect(b.keySet).map(u =>
        (u, f(a(u).ts), a(u).value, f(b(u).ts), b(u).value))
      assert(got == want, s"seed=$seed: got=$got want=$want")
    }
  }

  test("merging a state with itself is a no-op (idempotent restart replay)") {
    import spark.implicits._
    for (seed <- 20L to 24L) {
      val log = sample(genLog, seed)
      val once = Streams.applyLog(log.toDF())
      assert(stateToMap(Streams.mergeState(once, once)) == referenceFold(log),
        s"seed=$seed")
    }
  }

  test("snapshot∪tail bootstrap reconciles events racing the snapshot cut") {
    // The S4 overlap window, made explicit: the initial snapshot is the LWW
    // state AT the cut, but a resume token always rewinds the tail to
    // BEFORE the cut (events that committed while the snapshot was being
    // read would otherwise be lost), so every event in (cut−overlap, cut]
    // is applied TWICE — once inside the snapshot state, once replayed by
    // the tail. The bootstrap is correct iff that double-application is
    // invisible: snapshot-state ∪ overlapping-tail collapses to the same
    // final state as the one-shot apply of the full log. Checked across
    // random logs × cut positions × overlap widths, including overlap 0
    // (the clean cut) and an overlap wide enough to replay deletes.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    for (seed <- 30L to 35L) {
      val log = sample(genLog, seed)
      val df = log.toDF()
      val times = log.map(_.ts.getTime).sorted
      for (cutFrac <- Seq(4, 2); overlapMs <- Seq(0L, 10L * 60000L, 500L * 60000L)) {
        val cut = times(times.length / cutFrac)
        // snapshot state at the cut: each key's surviving row keeps its
        // ORIGINAL changelog envelope (that's what a snapshot read emits:
        // current documents, stamped with their last-modified position)
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").desc, col("event_id").desc)
        val snap = df.filter(col("ts") <= new Timestamp(cut))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1 && col("event_type") =!= "error")
          .drop("rn")
        val tail = df.filter(col("ts") > new Timestamp(cut - overlapMs))
        val got = graft.operators.Cdc.applyLww(snap.unionByName(tail))
          .collect().toSeq
        val want = graft.operators.Cdc.applyLww(df).collect().toSeq
        assert(got == want, s"seed=$seed cutFrac=$cutFrac overlap=$overlapMs")
      }
    }
  }

  test("transactional apply is all-or-nothing at every capture cut") {
    // The cross-table atomicity invariant behind cdc_txn_apply: a capture
    // cut that lands mid-transaction must withhold the WHOLE transaction,
    // so the distributed apply over the captured prefix equals a
    // sequential LWW fold over ONLY the transactions whose every member
    // made the cut — and a reader can never observe e.g. the inventory
    // half of a txn without its ledger half. Dense event_ids (txn = id
    // div 5) with randomly shuffled timestamps make most cuts land
    // mid-flight; checked across seeds × cut fractions, including the
    // degenerate cuts (nothing captured / everything captured).
    import spark.implicits._
    for (seed <- 40L to 44L) {
      val rnd = new scala.util.Random(seed)
      val n = 60
      val times = rnd.shuffle((0 until n).toList)
      val log = (0 until n).map { id =>
        ChangeEvent(
          id.toLong, new Timestamp(1700000000000L + times(id) * 60000L),
          1L + rnd.nextInt(8), // user
          if (rnd.nextInt(5) == 0) "error" else "view",
          rnd.nextInt(10000) / 100.0, "{}")
      }
      val sortedTs = log.map(_.ts.getTime).sorted
      for (cutIdx <- Seq(0, n / 4, n / 2, n - 1)) {
        val cut = sortedTs(cutIdx)
        val captured = log.filter(_.ts.getTime <= cut)
        val whole = captured.groupBy(_.event_id / 5)
          .filter(_._2.size == 5).values.flatten.toSeq
        val want = whole.sortBy(e => (e.ts.getTime, e.event_id))
          .foldLeft(Map.empty[(String, Long), ChangeEvent]) { (m, e) =>
            val tbl = if (e.user_id % 2 == 0) "inventory" else "ledger"
            m.updated((tbl, e.user_id), e)
          }
          .collect { case ((tbl, u), e) if e.event_type != "error" =>
            (tbl, u, e.event_id, e.value)
          }.toSet
        val got = graft.operators.Cdc.txnApplyCore(captured.toDF())
          .collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getDouble(4)))
          .toSet
        assert(got == want, s"seed=$seed cutIdx=$cutIdx")
        // no event of an in-flight (partial) transaction leaks: every
        // surviving last_event_id belongs to a fully-captured txn
        val wholeTxns = whole.map(_.event_id / 5).toSet
        assert(got.forall(r => wholeTxns.contains(r._3 / 5)), s"seed=$seed leak")
      }
    }
  }

  test("Debezium-envelope partial fold over ANY random batch split equals " +
      "the single-shot partials (the streaming consumer's contract)") {
    import graft.operators.Cdc
    import spark.implicits._
    def docsOf(evs: Seq[ChangeEvent]): org.apache.spark.sql.DataFrame = {
      import org.apache.spark.sql.functions._
      // the envelope encode is exercised by the oracle row; here the
      // property under test is the FOLD algebra, so a synthetic doc
      // column built from the same fields suffices
      evs.toDF().select(to_json(struct(
        struct(lit(1L).as("id")).as("schema"),
        struct(
          struct(col("user_id"), col("value")).as("after"),
          struct(lit("app").as("db"), lit("t").as("tbl"),
            col("event_id").as("lsn")).as("source"),
          when(col("event_type") === "error", "d").otherwise("u").as("op"),
          unix_millis(col("ts")).as("ts_ms")).as("payload")))
        .as("value"))
    }
    def partialMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0),
        (r.getStruct(1).toString, r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))).toMap
    for (seed <- 1L to 6L) {
      val log = sample(genLog, seed)
      val oneShot = partialMap(
        Cdc.debeziumPartials(Cdc.debeziumDecode(docsOf(log))))
      // random contiguous split into 1..5 batches, folded pairwise
      val nCuts = sample(Gen.choose(0, 4), seed * 31)
      val cuts = sample(
        Gen.listOfN(nCuts, Gen.choose(1, math.max(log.size - 1, 1))),
        seed * 131).distinct.sorted
      val bounds = (0 +: cuts :+ log.size).distinct.sorted
      val batches = bounds.sliding(2).map {
        case Seq(a, b) => log.slice(a, b)
      }.filter(_.nonEmpty).toSeq
      val folded = batches
        .map(b => Cdc.debeziumPartials(Cdc.debeziumDecode(docsOf(b))))
        .reduce(Cdc.debeziumMerge)
      assert(partialMap(folded) == oneShot,
        s"seed=$seed: fold over ${batches.size} batches diverged")
    }
  }
}
