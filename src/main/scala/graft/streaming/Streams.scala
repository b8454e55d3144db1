package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming forms of the engine's CDC/analytics operators
  * (SURVEY.md §2.9 rows ST1–ST7). Each transformation takes a DataFrame
  * that may be bounded (batch replay — what the DuckDB-oracled twins in
  * graft.operators run) or unbounded (readStream/MemoryStream — what the
  * ScalaTest suite runs), because Structured Streaming's contract is
  * exactly that the incremental plan computes the batch answer.
  *
  * Scale notes (100 TB/day of change events): all stateful ops key their
  * state by a high-cardinality column (user_id), so state shards across
  * executors via the same hash partitioning as the shuffle; watermarks
  * bound state size by evicting windows/sessions/dedup keys older than the
  * lateness budget. The foreachBatch upsert emits one idempotent MERGE per
  * micro-batch — the pattern that scales to a real MySQL/warehouse sink
  * because the per-batch work is proportional to the batch, not the table.
  */
object Streams {

  /** Debezium-style change-event envelope (the `events` table's shape). */
  case class ChangeEvent(
      event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  /** A closed (or final) user session emitted by the stateful sessionizer. */
  case class UserSession(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long)

  /** ST1 — tumbling 1-hour windows with a 10-minute watermark: count +
    * value sum per (window, event_type). Append-mode-safe.
    */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (sum(graft.functions.Det.scaledLong(col("value"), 100))
          .cast("double") / 100).as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** ST2 — sliding 1-hour windows every 15 minutes. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"))

  /** ST3 — gap-based session windows (30-minute inactivity gap) via the
    * native session_window; watermark closes sessions and evicts state.
    */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))

  /** ST3 (custom-state form) — sessionization with explicit per-user state
    * via flatMapGroupsWithState + event-time timeout: demonstrates the
    * KeyValueGroupedDataset state API for semantics session_window can't
    * express (e.g. emitting session *updates*, per-key session caps).
    * State per user is the single open session; a closed session is
    * emitted when a new event starts a later session or when the watermark
    * times the state out.
    */
  def sessionizeWithState(events: Dataset[ChangeEvent], gapMinutes: Int)
      : Dataset[UserSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60L * 1000L
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[(Timestamp, Timestamp, Long), UserSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, it: Iterator[ChangeEvent],
         state: GroupState[(Timestamp, Timestamp, Long)]) =>
          if (state.hasTimedOut) {
            val (s, e, n) = state.get
            state.remove()
            Iterator(UserSession(userId, s, e, n))
          } else {
            val sorted = it.toSeq.sortBy(ev => (ev.ts.getTime, ev.event_id))
            var open = state.getOption
            val closed = Seq.newBuilder[UserSession]
            sorted.foreach { ev =>
              open match {
                case Some((s, e, n)) if ev.ts.getTime - e.getTime <= gapMs =>
                  open = Some((s, ev.ts, n + 1))
                case Some((s, e, n)) =>
                  closed += UserSession(userId, s, e, n)
                  open = Some((ev.ts, ev.ts, 1L))
                case None =>
                  open = Some((ev.ts, ev.ts, 1L))
              }
            }
            open.foreach { st =>
              state.update(st)
              state.setTimeoutTimestamp(st._2.getTime + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** One materialized (user, hour) slot of the streaming LOCF grid. */
  case class FilledSlot(
      user_id: Long, hour: Timestamp, n_obs: Long, filled: Double)

  /** ST10 — streaming LOCF materialization (the deployed form of W5's
    * events_gapfill): for every user, emit one row per completed hour —
    * observation count and the last-observation-carried-forward value —
    * including hours with NO data, where the carried value is re-emitted.
    * This is the feature-store serving pattern ("current value of every
    * key at every tick") that a batch gap-fill can only approximate after
    * the fact.
    *
    * The state primitive is the REPEATED event-time timer: each user's
    * state holds the next hour to emit plus per-open-hour pending
    * aggregates; the timer is re-armed for the end of that hour, and when
    * the watermark passes it the flush emits every newly-completed slot
    * (observed hours finalize their own last value; silent hours re-emit
    * the carried one). A silent user keeps emitting because OTHER users'
    * events advance the watermark and fire its timer — exactly LOCF.
    *
    * Scale: state is O(users), each O(lateness horizon / hour) pending
    * entries, sharded by the group key with the shuffle; emission work is
    * proportional to completed slots. The watermark contract means no
    * event can arrive for an already-emitted hour (late rows are dropped
    * upstream), so emitted slots are final — Append mode is sound.
    * The stream's grid starts at each user's first observation (a stream
    * cannot know a global grid start); the batch twin pins the LOCF
    * arithmetic itself on a fixed window.
    */
  def gapfillStream(events: Dataset[ChangeEvent]): Dataset[FilledSlot] = {
    import events.sparkSession.implicits._
    val HOUR = 3600L * 1000L
    // state: (next hour to emit (start ms, -1 = unset), carried LOCF value,
    //         open hours → (n_obs, best ts, best event_id, best value))
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[
        (Long, Double, Map[Long, (Long, Long, Long, Double)]), FilledSlot](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, it: Iterator[ChangeEvent],
         state: GroupState[(Long, Double, Map[Long, (Long, Long, Long, Double)])]) =>
          val wm = state.getCurrentWatermarkMs()
          var (cursor, carried, pending) =
            state.getOption.getOrElse(
              (-1L, 0.0, Map.empty[Long, (Long, Long, Long, Double)]))
          it.foreach { e =>
            val h = Math.floorDiv(e.ts.getTime, HOUR) * HOUR
            if (cursor == -1L) cursor = h
            val (n, bts, bid, bv) =
              pending.getOrElse(h, (0L, Long.MinValue, Long.MinValue, 0.0))
            val better = e.ts.getTime > bts ||
              (e.ts.getTime == bts && e.event_id > bid)
            pending += h -> (n + 1,
              if (better) e.ts.getTime else bts,
              if (better) e.event_id else bid,
              if (better) e.value else bv)
          }
          val out = Seq.newBuilder[FilledSlot]
          if (cursor != -1L) {
            while (cursor + HOUR <= wm) { // hour END has passed the watermark
              pending.get(cursor) match {
                case Some((n, _, _, v)) =>
                  carried = v
                  pending -= cursor
                  out += FilledSlot(userId, new Timestamp(cursor), n, carried)
                case None =>
                  out += FilledSlot(userId, new Timestamp(cursor), 0L, carried)
              }
              cursor += HOUR
            }
            state.update((cursor, carried, pending))
            // re-arm for the end of the now-open hour: fires on the first
            // batch whose watermark passes it, observed data or not
            state.setTimeoutTimestamp(cursor + HOUR)
          }
          out.result().iterator
      }
  }

  /** ST5 — streaming exactly-once-per-key dedup: drops events whose
    * event_id was already seen within the watermark horizon (the resume-
    * token replay guard of a CDC consumer restart).
    */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark(Seq("event_id"))

  /** One per-user EWMA point: the running smooth after the latest
    * applied event. */
  case class EwmaPoint(user_id: Long, n_events: Long, ewma_cents: Long)

  /** ST13 — streaming per-user EWMA, the deployed form of W10's
    * events_ewma: `mapGroupsWithState` carries (n, ewma_cents) — two
    * i64 per user, sharded with the group key — and each micro-batch
    * folds its (ts, event_id)-sorted slice onto the carry with the SAME
    * integer recurrence as the batch twin (s ← (2x + 8s) div 10 in
    * cents), emitting the updated point in Update mode. A sequential
    * recurrence is exactly what the windowed/aggregate streaming ops
    * cannot express and what the state API exists for.
    *
    * Ordering contract: the fold is left-to-right in event order, so
    * per-key arrival must be in order ACROSS micro-batches — the
    * changelog/resume-token contract every CDC tail satisfies (an
    * out-of-order source would first pass a watermark-sorted stage).
    * Under that contract ANY prefix split of the stream converges to
    * the batch fold — StreamingSpec pins 1-batch ≡ 3-batch ≡ the
    * sequential reference.
    */
  def ewmaWithState(events: Dataset[ChangeEvent]): Dataset[EwmaPoint] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[(Long, Long), EwmaPoint](
        GroupStateTimeout.NoTimeout) {
        (u: Long, it: Iterator[ChangeEvent], state: GroupState[(Long, Long)]) =>
          val sorted = it.toSeq
            .sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
          var (n, s) = state.getOption.getOrElse((0L, 0L))
          sorted.foreach { e =>
            val x = math.round(e.value * 100)
            s = if (n == 0) x else (2 * x + 8 * s) / 10
            n += 1
          }
          state.update((n, s))
          EwmaPoint(u, n, s)
      }
  }

  /** ST12 — streaming heavy-hitter candidates: the Misra-Gries
    * `Aggregator` (`functions/MisraGriesAgg`) as a STREAMING aggregate.
    * Because MG partial states merge associatively, Structured Streaming
    * maintains the sketch incrementally — each micro-batch folds into the
    * per-group state exactly like a built-in agg, with ≤K counters of
    * state per group forever (the bounded-state property that makes a
    * frequency sketch streamable where a full per-key count would grow
    * without bound). Same contract as the batch form: the emitted
    * candidate ARRAY is a guaranteed superset of every item with
    * frequency > n/K; exact membership below that line depends on batch
    * arrival order, so downstream consumers re-verify candidates exactly
    * (doc_heavy_hitters' second pass) before acting on counts.
    */
  def heavyHitterCandidates(events: DataFrame): DataFrame = {
    val mg = udaf(graft.functions.MisraGriesAgg.mg)
    events.groupBy(col("event_type"))
      .agg(mg(col("user_id").cast("string")).as("candidates"))
  }

  /** ST7 — stream ⋈ static dimension enrichment (broadcast the dim). */
  def enrich(events: DataFrame, customerDim: DataFrame): DataFrame =
    events.join(broadcast(customerDim),
      events("user_id") === customerDim("c_custkey"))

  /** ST8 — stream ⋈ STREAM interval join: purchases attributed to the same
    * user's clicks from the preceding hour, the two-changelog join a CDC
    * consumer needs when both sides are live (e.g. correlating a clickstream
    * topic with an order topic). The join itself is
    * Cdc.attributionJoin — identical to the batch twin
    * (`events_attribution`), which carries the DuckDB oracle; this form adds
    * the watermarks that let Spark expire buffered rows once no future match
    * can arrive: a click can only match purchases up to 1 hour later, so
    * with both watermarks at 2 hours every buffered row has a provable
    * expiry. Inner join ⇒ matches emit as soon as both sides arrive
    * (Append mode); state stays bounded by (watermark horizon × arrival
    * rate), not stream length.
    */
  def joinStreams(clicks: DataFrame, purchases: DataFrame): DataFrame =
    graft.operators.Cdc.attributionJoin(
      clicks.withWatermark("ts", "2 hours"),
      purchases.withWatermark("ts", "2 hours"))

  /** ST11 — stream⋈stream LEFT OUTER interval join: as joinStreams, but a
    * purchase with no click in its window still emits (null click
    * columns). The engine can only emit those rows once the CLICK side's
    * watermark has passed the purchase's whole match window — before
    * that, a matching click might still arrive — so unmatched results
    * trail matched ones by the watermark delay: the state-timeout
    * semantics that distinguish outer from inner stream joins (batch
    * twin: Cdc.eventsAttributionOuter's underlying join).
    */
  def joinStreamsOuter(clicks: DataFrame, purchases: DataFrame): DataFrame =
    graft.operators.Cdc.attributionJoin(
      clicks.withWatermark("ts", "2 hours"),
      purchases.withWatermark("ts", "2 hours"), "left_outer")

  /** ST9 — streaming telemetry outlier gate: the deployed form of
    * events_anomaly (L20). The per-type moments (μ/σ) come from the batch
    * two-pass job (`Analytics.eventMoments`) as a STATIC broadcast table —
    * the standard train-in-batch / serve-on-the-stream split — so the gate
    * is a stateless map-side filter: no watermark, no state store, no
    * shuffle; each micro-batch flags in one narrow pass, and the moment
    * table refreshes by restarting the query (or a foreachBatch re-read)
    * exactly like any model-serving join. Flag arithmetic is the batch
    * twin's, so stream and batch agree row-for-row.
    */
  def anomalyGate(events: DataFrame, moments: DataFrame): DataFrame = {
    val anom = abs(col("value") - col("mu")) > col("sigma") * lit(3.0)
    events.join(
        broadcast(moments.select(col("event_type"), col("mu"),
          col("sigma"))),
        Seq("event_type"))
      .filter(anom)
      .withColumn("z", abs(col("value") - col("mu")) / col("sigma"))
      .select(col("event_id"), col("ts"), col("event_type"), col("value"),
        col("z"))
  }

  /** Last-writer-wins collapse of a change log fragment: one row per key,
    * ordered by (ts, event_id); 'error' events are tombstones. Pure — the
    * same function serves the batch twin (Cdc.cdcApply), the per-batch
    * step of the streaming upsert, and the associativity test that proves
    * incremental == batch.
    */
  def applyLog(log: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    log
      .select(col("user_id"), col("ts"), col("event_id"), col("value"),
        when(col("event_type") === "error", "delete").otherwise("upsert")
          .as("op"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"),
        col("op"))
  }

  /** Merge a collapsed micro-batch into the collapsed sink state
    * (associative: applying batches incrementally ≡ applying the whole
    * log at once). Tombstones persist in state so late duplicates of
    * deleted keys stay dead; `finalState` filters them for presentation.
    */
  def mergeState(state: DataFrame, batch: DataFrame): DataFrame =
    applyLog(state.withColumn("event_type",
        when(col("op") === "delete", "error").otherwise("upsert"))
      .drop("op")
      .unionByName(batch.withColumn("event_type",
        when(col("op") === "delete", "error").otherwise("upsert"))
        .drop("op")))

  /** Live rows of a collapsed state (tombstones dropped). */
  def finalState(state: DataFrame): DataFrame =
    state.filter(col("op") =!= "delete").drop("op")

  /** ST6 — the streaming CDC upsert: foreachBatch collapses each
    * micro-batch and MERGEs it into a parquet-backed sink table (the
    * stand-in for `INSERT … ON DUPLICATE KEY UPDATE` on MySQL). Returns
    * the started query; sink state lives at `sinkDir`.
    */
  def cdcUpsertQuery(spark: SparkSession, events: DataFrame,
      sinkDir: String, checkpointDir: String,
      availableNow: Boolean = false)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = events.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
    // AvailableNow = the S4 bootstrap: drain everything currently in the
    // landing zone in bounded micro-batches, then terminate; a later
    // restart with the same checkpoint tails only what arrived since.
    (if (availableNow)
       writer.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else writer)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        val collapsed = applyLog(batch.toDF())
        val sink = new java.io.File(sinkDir)
        val merged =
          if (sink.exists() && sink.listFiles().exists(_.getName.endsWith(".parquet")))
            mergeState(spark.read.parquet(sinkDir), collapsed)
          else collapsed
        val tmp = sinkDir + ".tmp"
        merged.coalesce(1).write.mode("overwrite").parquet(tmp)
        val committed = spark.read.parquet(tmp)
        committed.coalesce(1).write.mode("overwrite").parquet(sinkDir)
        ()
      }
      .start()
  }

  /** ST6 (relational form) — the same foreachBatch upsert, but the sink is
    * a REAL keyed SQL table behind a JDBC url (the MySQL side of the CDC
    * pipeline; embedded Derby in SinkSpec). Each micro-batch collapses to
    * one row per key and applies as batched portable DELETE+INSERT — see
    * graft.sources.JdbcApply for the dialect/ordering/scale reasoning.
    */
  def cdcUpsertJdbcQuery(events: DataFrame, url: String, table: String,
      checkpointDir: String, availableNow: Boolean = false)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = events.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
    (if (availableNow)
       writer.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
     else writer)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.sources.JdbcApply.upsertDelete(applyLog(batch.toDF()), url, table)
        ()
      }
      .start()
  }

  // ---- ST14: transformWithState (arbitrary-state v2 API) ----------------

  /** The live per-user profile row ST14 maintains. */
  case class UserProfile(
      user_id: Long, n_events: Long, total_cents: Long,
      n_types: Long, top_type: String)

  /** ST14 — per-entity live profile via `transformWithState`, Structured
    * Streaming's arbitrary-state v2 API (Spark 4.x): the successor to
    * mapGroupsWithState that ST13/ST10 use. What v2 uniquely adds — and
    * what this operator exercises — is MULTIPLE independently-typed state
    * variables per key: a ValueState[(n, Σcents)] running total next to a
    * MapState[event_type → count] census, each with its own encoder and
    * (optional) TTL, instead of one monolithic case-class blob that every
    * update must rewrite in full. On the RocksDB state store the map's
    * per-type entries are separate KV pairs, so a 1-type update writes one
    * entry, not the whole profile.
    *
    * Determinism contract (the suite's discipline): cents accumulate with
    * the SAME half-away-from-zero rounding as Det.scaledLong, and top_type
    * breaks count ties lexicographically — so any prefix split of a
    * per-key-ordered feed converges to the batch fold (pinned in
    * StreamingSpec: 1-batch ≡ 3-batch ≡ batch-twin recompute).
    *
    * Scale: state is keyed by user_id and shards with the groupByKey hash
    * partitioning; per-key state is O(distinct types) — bounded by the
    * event-type vocabulary, not the stream length. TimeMode.None: no
    * timers; eviction policy belongs to TTLConfig when a deployment needs
    * it (a one-line change per state var).
    */
  class ProfileProcessor extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, ChangeEvent, UserProfile] {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{MapState, TTLConfig, ValueState}
    @transient private var totals: ValueState[(Long, Long)] = _
    @transient private var typeCounts: MapState[String, Long] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
      totals = getHandle.getValueState[(Long, Long)](
        "totals", Encoders.product[(Long, Long)], TTLConfig.NONE)
      typeCounts = getHandle.getMapState[String, Long](
        "typeCounts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[ChangeEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[UserProfile] = {
      var (n, cents) =
        if (totals.exists()) totals.get() else (0L, 0L)
      rows.foreach { e =>
        n += 1
        // half-away-from-zero ×100 — the exact integer image Det.scaledLong
        // gives the batch twin, so stream and batch folds are bit-equal
        cents += (if (e.value >= 0) (e.value * 100 + 0.5).toLong
                  else (e.value * 100 - 0.5).toLong)
        val c = if (typeCounts.containsKey(e.event_type))
          typeCounts.getValue(e.event_type) else 0L
        typeCounts.updateValue(e.event_type, c + 1)
      }
      totals.update((n, cents))
      var nTypes = 0L
      var topT = ""
      var topC = -1L
      typeCounts.iterator().foreach { case (t, c) =>
        nTypes += 1
        if (c > topC || (c == topC && t < topT)) { topC = c; topT = t }
      }
      Iterator.single(UserProfile(key, n, cents, nTypes, topT))
    }
  }

  /** ST14 entry: one UserProfile row per (key, micro-batch) in Update
    * mode; the LAST emission per key is the live profile. Requires the
    * RocksDB state store provider (the v2 API's backing store).
    */
  def liveProfile(events: Dataset[ChangeEvent]): Dataset[UserProfile] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new ProfileProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** Batch twin of ST14's fold (the Structured Streaming contract: the
    * incremental plan must compute the batch answer). */
  def liveProfileBatch(events: DataFrame): DataFrame = {
    val cents = graft.functions.Det.scaledLong(col("value"), 100)
    val perType = events.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("tc"), sum(cents).as("tcents"))
    perType.groupBy(col("user_id"))
      .agg(sum(col("tc")).as("n_events"),
        sum(col("tcents")).as("total_cents"),
        count(lit(1)).as("n_types"),
        // same (max count, lexicographically-smallest) tie-break as the
        // processor: maximize count, then minimize type string
        min(struct((lit(Long.MaxValue) - col("tc")).as("negc"),
          col("event_type").as("t"))).getField("t").as("top_type"))
  }

  // ---- ST15: event-time TIMERS in transformWithState --------------------

  /** ST15 — timer-closed sessionization: the v2 API's EVENT-TIME TIMER
    * surface (registerTimer / deleteTimer / handleExpiredTimer), which
    * neither mapGroupsWithState's GroupStateTimeout (coarse, one timeout
    * per key, checked only when the key sees traffic or the batch ends)
    * nor the native session_window (fixed emission at window close, no
    * custom per-key logic) exposes. Each key keeps ONE armed timer at
    * `last_event + gap`; a new event disarms and re-arms it (deleteTimer
    * + registerTimer — the store holds timers as their own keyed
    * namespace, so re-arming is two KV ops, not a state rewrite). When
    * the WATERMARK passes the armed expiry, handleExpiredTimer fires:
    * the closed session emits in Append mode and the key's state clears
    * to empty — state lifetime is bounded by (gap + lateness budget), the
    * 100-TB property.
    *
    * Determinism: emission happens at watermark crossings, so WHICH batch
    * emits a session depends on feed slicing, but the SET of closed
    * sessions for a fully-drained feed is slicing-invariant (pinned in
    * StreamingSpec against the batch sessionizer twin on the same gap).
    */
  class SessionTimerProcessor(gapMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, ChangeEvent, UserSession] {
    import org.apache.spark.sql.Encoders
    import org.apache.spark.sql.streaming.{TTLConfig, ValueState}
    @transient private var session: ValueState[(Long, Long, Long)] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      session = getHandle.getValueState[(Long, Long, Long)](
        "session", Encoders.product[(Long, Long, Long)], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[ChangeEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[UserSession] = {
      // gap-splitting happens at EVENT time (deterministic, slicing-
      // invariant): an event past last+gap closes the open session right
      // here; the timer only flushes the final TRAILING session once the
      // watermark passes it. Late events inside the watermark budget
      // merge into the open session (extending it backwards if needed).
      var st = if (session.exists()) Some(session.get()) else None
      val oldLast = st.map(_._2)
      val closed = scala.collection.mutable.ArrayBuffer.empty[UserSession]
      rows.toArray.sortBy(_.ts.getTime).foreach { e =>
        val t = e.ts.getTime
        st match {
          case Some((s, l, n)) if t <= l + gapMs =>
            st = Some((math.min(s, t), math.max(l, t), n + 1))
          case Some((s, l, n)) =>
            closed += UserSession(key, new Timestamp(s), new Timestamp(l), n)
            st = Some((t, t, 1L))
          case None =>
            st = Some((t, t, 1L))
        }
      }
      if (st.isEmpty) return closed.iterator
      val (start, last, n) = st.get
      if (oldLast.exists(_ != last)) getHandle.deleteTimer(
        oldLast.get + gapMs)
      session.update((start, last, n))
      getHandle.registerTimer(last + gapMs)
      closed.iterator
    }

    override def handleExpiredTimer(key: Long,
        timerValues: org.apache.spark.sql.streaming.TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[UserSession] = {
      // the armed timer is always last+gap; an expiry with no state (or a
      // stale one from a lost delete) emits nothing
      if (!session.exists()) return Iterator.empty
      val (start, last, n) = session.get()
      if (expiredTimerInfo.getExpiryTimeInMs() != last + gapMs)
        return Iterator.empty
      session.clear()
      Iterator.single(UserSession(
        key, new Timestamp(start), new Timestamp(last), n))
    }
  }

  /** ST15 entry: Append-mode closed sessions; the watermark drives the
    * timers, so `events` must carry one. RocksDB-backed like ST14.
    */
  def timerSessions(events: Dataset[ChangeEvent],
      gapMinutes: Int = 30): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .transformWithState(new SessionTimerProcessor(gapMinutes * 60000L),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
  }
}
