package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.{TxLog, TxSql}
import java.io.File

/** cdc_e2e_pipeline (round-15) — the COMPOSED end-to-end CDC topology,
  * every stage an individually-green operator, run as ONE pipeline:
  *
  *   Avro BINARY wire (S74 landing)
  *     → native [[graft.functions.AvroEnvelopeDecode]] decode
  *     → per-key LWW collapse (S6's argmax)
  *     → TxLog seed + one atomic [[TxLog.applyChanges]] commit (S60)
  *     → `table_changes('t', v0, v1)` statement-surface feed (S53)
  *     → incremental AGGREGATE VIEW absorbed algebraically (S9).
  *
  * The schema-registry epoch IS the bootstrap/tail split: epoch-1
  * frames (registry id 1, the old double-money wire) are the initial
  * snapshot that seeds the table at v0; epoch-2 frames (id 2, i64
  * cents) are the live tail that lands as ONE collapsed upsert/delete
  * batch at v1. Because the epoch boundary is strict in event time,
  * every tail event supersedes the seeded state — incremental apply ≡
  * the full LWW recompute, so the DuckDB oracle can rebuild the WHOLE
  * pipeline from the raw event log: final per-band census from the
  * all-events LWW, feed insert/delete counts from the s1∖s0 / s0∖s1
  * row differences (exactly what the CDF's add/remove netting emits
  * for the apply's rewritten files).
  *
  * The VERIFIED query is the downstream consumer's plan: the v0 view
  * (seed-snapshot census) merged with the per-band deltas of the CDF —
  * the view never re-reads the raw wire, the events table, or the full
  * post-apply snapshot; its inputs are the seed files and the apply
  * commit's delta files only (pinned in PlanSpec). Scale: every stage
  * is the same shape its standalone row ships — decode is one codegen
  * library call per frame, the apply rewrites |affected files|, the
  * feed is |delta| rows, the view merge is |bands| — so the composed
  * pipeline inherits each stage's 100-TB story instead of adding one.
  */
object CdcE2e {
  import graft.functions.Det.scaledLong
  import graft.sources.TxFeatures.demoDir

  private val e2eDone =
    scala.collection.concurrent.TrieMap.empty[String, File]

  /** The decoded change frame off the binary landing — the SAME scan →
    * native-decode plan `cdc_avro_apply` times (one decode site,
    * codegen-resident).
    */
  private def decoded(spark: SparkSession, dir: String): DataFrame =
    AvroWire.decodeFrame(
      spark.read.parquet(AvroWire.avroLanding(spark, dir)))

  /** Collapse one wire slice to its per-key final state + `_op` — the
    * applyChanges input contract (≤1 row per key).
    */
  private def lwwOf(slice: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_ms").desc, col("lsn").desc)
    slice.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("ts_ms").as("last_ts_ms"),
        col("lsn").as("last_event_id"), col("value").as("last_value"),
        when(col("op") === "d", "delete").otherwise("upsert").as("_op"))
  }

  /** Build the pipeline's table once per (JVM, corpus): v0 = epoch-1
    * bootstrap state, v1 = the epoch-2 tail as one atomic CDC apply.
    */
  private[graft] def e2eDemo(spark: SparkSession, dir: String): File =
    TxSql.demoLock.synchronized {
      e2eDone.getOrElseUpdate(dir, {
        val t = demoDir(dir, "e2e")
        val d = decoded(spark, dir)
        if (TxLog.versions(t).isEmpty)                              // v0
          TxLog.append(
            lwwOf(d.filter(col("schema_id") === 1L))
              .filter(col("_op") === "upsert").drop("_op"), t)
        if (TxLog.versions(t).size < 2)                             // v1
          TxLog.applyChanges(spark, t,
            lwwOf(d.filter(col("schema_id") === 2L)), Seq("user_id"))
        t
      })
    }

  /** The downstream consumer: v0's band census + the CDF's per-band
    * deltas = the maintained view, plus the feed's own insert/delete
    * census (the delta really flowed — an empty feed would zero them
    * and the hash-compare would catch it).
    */
  def cdcE2ePipeline(spark: SparkSession, dir: String): DataFrame = {
    val t = e2eDemo(spark, dir)
    val feed = TxSql.demoLock.synchronized {
      TxSql.register("e2e_state", t)
      // start is INCLUSIVE (the Delta convention S53 pins): the delta
      // window is exactly the apply commit, v1..v1 — including v0 would
      // re-count the seed rows as feed inserts
      TxSql.sql(spark, "SELECT * FROM table_changes('e2e_state', 1, 1)")
    }
    val v0 = TxLog.snapshot(spark, t, Some(0L))
      .groupBy((col("user_id") % 10).as("band"))
      .agg(count(lit(1)).as("n_users"),
        sum(scaledLong(col("last_value"), 100L)).as("total_cents"))
    val delta = feed
      .select((col("user_id") % 10).as("band"),
        (col("_change_type") === "insert").as("ins"),
        scaledLong(col("last_value"), 100L).as("cents"))
      .groupBy(col("band"))
      .agg(
        sum(when(col("ins"), 1L).otherwise(-1L)).as("d_users"),
        sum(when(col("ins"), col("cents")).otherwise(-col("cents")))
          .as("d_cents"),
        sum(when(col("ins"), 1L).otherwise(0L)).as("n_feed_inserts"),
        sum(when(!col("ins"), 1L).otherwise(0L)).as("n_feed_deletes"))
    v0.join(delta, Seq("band"), "full_outer")
      .select(col("band"),
        (coalesce(col("n_users"), lit(0L)) +
          coalesce(col("d_users"), lit(0L))).as("n_users"),
        (coalesce(col("total_cents"), lit(0L)) +
          coalesce(col("d_cents"), lit(0L))).as("total_cents"),
        coalesce(col("n_feed_inserts"), lit(0L)).as("n_feed_inserts"),
        coalesce(col("n_feed_deletes"), lit(0L)).as("n_feed_deletes"))
      // a band whose last member was deleted leaves the view (the
      // oracle censuses the final state, where the band has no rows)
      .filter(col("n_users") > 0)
      .orderBy(col("band"))
  }

  /** Oracle: the WHOLE pipeline rebuilt from the raw event log — wire
    * value semantics per epoch (the cdc_avro_apply rule), bootstrap
    * state s0 = epoch-1 LWW, final state s1 = all-events LWW, feed
    * deltas = the row differences the CDF's netting surfaces for the
    * apply commit.
    */
  val cdcE2ePipelineSql: String =
    """WITH log AS (
      |  SELECT user_id, epoch_ms(ts) AS ts_ms, event_id,
      |    CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN value
      |      ELSE CAST(round(value * 100) AS BIGINT) / 100.0 END AS value,
      |    event_type = 'error' AS is_del,
      |    CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN 1 ELSE 2 END
      |      AS epoch
      |  FROM events),
      |s0 AS (SELECT user_id, ts_ms, event_id, value FROM (
      |    SELECT *, row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts_ms DESC, event_id DESC) AS rn
      |    FROM log WHERE epoch = 1) WHERE rn = 1 AND NOT is_del),
      |s1 AS (SELECT user_id, ts_ms, event_id, value FROM (
      |    SELECT *, row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts_ms DESC, event_id DESC) AS rn
      |    FROM log) WHERE rn = 1 AND NOT is_del),
      |ins AS (SELECT * FROM s1 EXCEPT SELECT * FROM s0),
      |del AS (SELECT * FROM s0 EXCEPT SELECT * FROM s1),
      |v AS (SELECT user_id % 10 AS band, COUNT(*) AS n_users,
      |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
      |      AS total_cents
      |  FROM s1 GROUP BY 1),
      |fi AS (SELECT user_id % 10 AS band, COUNT(*) AS n FROM ins GROUP BY 1),
      |fd AS (SELECT user_id % 10 AS band, COUNT(*) AS n FROM del GROUP BY 1)
      |SELECT v.band, v.n_users, v.total_cents,
      |  CAST(COALESCE(fi.n, 0) AS BIGINT) AS n_feed_inserts,
      |  CAST(COALESCE(fd.n, 0) AS BIGINT) AS n_feed_deletes
      |FROM v LEFT JOIN fi ON fi.band = v.band
      |LEFT JOIN fd ON fd.band = v.band
      |ORDER BY v.band""".stripMargin

  // ---- the same topology DEPLOYED: a live stream applying into the
  // ---- table format with exactly-once txn markers ---------------------------

  /** Time-ordered binary topic: the events log encoded through the SAME
    * capture-agent writer, landed as four ts-quartile segment files
    * with ascending mtimes — the per-partition ORDER a real Kafka topic
    * delivers per key, which is what makes per-batch LWW collapse +
    * sequential apply ≡ the global LWW (quartiles split on (ts,
    * event_id), the exact order the apply's argmax tie-breaks on, so a
    * later batch's rows always supersede).
    */
  private def orderedAvroLanding(spark: SparkSession, dir: String)
      : String = {
    val safe = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    val seg = new File(sys.props("java.io.tmpdir"),
      // path v2: the quartile split moved to (millis, event_id) — a v1
      // landing under the same source stamp must not be re-claimed
      s"graft_avroseq_$safe/envelopes_seq2_" +
        graft.Tables.srcStamp(new File(dir, "events.parquet")))
    graft.Tables.publishOnce(seg) { tmp =>
      tmp.mkdirs()
      // quartile on (MILLIS, event_id) — the exact order the apply's
      // LWW argmax tie-breaks on (ts_ms, lsn). Splitting on raw micros
      // could put the (same-ms, lower-lsn) twin of a pair in a LATER
      // batch, letting sequential apply crown the wrong winner the day
      // the corpus carries sub-millisecond timestamps (r15 review).
      val ev = graft.Tables.events(spark, dir).withColumn("_q",
        ntile(4).over(org.apache.spark.sql.expressions.Window
          .orderBy(unix_millis(col("ts")), col("event_id"))))
      (1 to 4).foreach(i => graft.Tables.landSegment(tmp,
        AvroWire.encodeFrames(spark,
          ev.filter(col("_q") === i).drop("_q")), i))
    }
    seg.getAbsolutePath
  }

  private val streamDone =
    scala.collection.concurrent.TrieMap.empty[String, File]

  /** cdc_e2e_stream (r15) — the replication loop LIVE: `readStream`
    * tails the binary topic, every micro-batch decodes through the
    * native expression, collapses to its per-key LWW batch, and lands
    * as one atomic [[TxLog.applyChanges]] commit stamped with the
    * exactly-once txn marker (app, batchId) — the streaming
    * foreachBatch contract where a replayed batch id no-ops (S26). The
    * oracle is the canonical full recompute: stream slicing, per-batch
    * collapse, marker bookkeeping, and file-pruned applies lose
    * nothing.
    */
  def cdcE2eStream(spark: SparkSession, dir: String): DataFrame = {
    val t = TxSql.demoLock.synchronized {
      streamDone.getOrElseUpdate(dir, {
        val table = demoDir(dir, "e2es")
        if (TxLog.versions(table).isEmpty)
          TxLog.createEmpty(table, "user_id BIGINT, last_ts_ms BIGINT, " +
            "last_event_id BIGINT, last_value DOUBLE")
        val landing = orderedAvroLanding(spark, dir)
        val base = new File(sys.props("java.io.tmpdir"),
          s"graft_e2es_${ProcessHandle.current.pid}_" +
            dir.replaceAll("[^A-Za-z0-9._-]", "_"))
        val ckpt = new File(base, s"ckpt_${System.nanoTime()}")
        val q = spark.readStream
          .option("maxFilesPerTrigger", "1")
          .schema(org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("value",
              org.apache.spark.sql.types.BinaryType))))
          .parquet(landing)
          .writeStream
          .option("checkpointLocation", ckpt.getAbsolutePath)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .foreachBatch {
            (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                id: Long) =>
              TxLog.applyChanges(spark, table,
                lwwOf(AvroWire.decodeFrame(batch.toDF())),
                Seq("user_id"),
                txnApp = Some("cdc_e2e_stream"), txnBatch = id)
              ()
          }
          .start()
        q.awaitTermination()
        graft.Tables.rmTree(ckpt) // drain done — reap the checkpoint
        table
      })
    }
    TxLog.snapshot(spark, t)
      .groupBy((col("user_id") % 10).as("band"))
      .agg(count(lit(1)).as("n_users"),
        sum(scaledLong(col("last_value"), 100L)).as("total_cents"))
      .orderBy(col("band"))
  }

  /** Oracle: the final replicated state from raw events — the
    * cdc_avro_apply value semantics, censused per band.
    */
  val cdcE2eStreamSql: String =
    """WITH log AS (
      |  SELECT user_id, epoch_ms(ts) AS ts_ms, event_id,
      |    CASE WHEN ts < TIMESTAMP '2024-01-16 00:00:00' THEN value
      |      ELSE CAST(round(value * 100) AS BIGINT) / 100.0 END AS value,
      |    event_type = 'error' AS is_del
      |  FROM events),
      |s1 AS (SELECT user_id, value FROM (
      |    SELECT *, row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts_ms DESC, event_id DESC) AS rn
      |    FROM log) WHERE rn = 1 AND NOT is_del)
      |SELECT user_id % 10 AS band, COUNT(*) AS n_users,
      |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
      |    AS total_cents
      |FROM s1 GROUP BY 1 ORDER BY band""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cdc_e2e_pipeline" -> (cdcE2ePipeline _),
    "cdc_e2e_stream" -> (cdcE2eStream _))

  def oracle: Map[String, String] = Map(
    "cdc_e2e_pipeline" -> cdcE2ePipelineSql,
    "cdc_e2e_stream" -> cdcE2eStreamSql)
}
