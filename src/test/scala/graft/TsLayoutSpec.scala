package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Timestamp-layout independence (VERDICT r6 item 8): the catalog must read
  * the events landing whatever physical type upstream chose for `ts` —
  * int64 epoch-nanos (how TIMESTAMP(NANOS) surfaces under the legacy
  * nanosAsLong conf, and how a raw epoch column lands), TIMESTAMP(MICROS)
  * without UTC adjustment (reads as TIMESTAMP_NTZ — the current driver
  * layout), and TIMESTAMP(MILLIS) adjusted-to-UTC (reads as TIMESTAMP) —
  * and produce IDENTICAL query results. Round 6 regressed precisely here:
  * the driver regenerated testdata from nanos to micros and every pinned
  * `ts div 1000` threw at analysis time.
  *
  * The base rows are ms-truncated before landing so all three layouts can
  * represent them exactly; each fixture dir is a one-table catalog root and
  * the comparisons run real registered queries through Tables.events.
  */
class TsLayoutSpec extends SparkSpec {

  private lazy val fixtures: Map[String, String] = {
    val s = spark
    val base = Tables.events(s, sfTiny)
      .withColumn("ts", timestamp_millis((unix_micros(col("ts")) / 1000L)
        .cast("long")))
    val root = java.nio.file.Files.createTempDirectory("graft_tslayout")
    def dir(n: String) = new java.io.File(root.toFile, n).getAbsolutePath

    // ns-int64: a plain BIGINT epoch-nanos column — byte-identical to what
    // the vectorized reader exposes for parquet TIMESTAMP(NANOS) under the
    // legacy conf (Spark cannot WRITE physical NANOS, so this lands the
    // post-read representation directly)
    base.select(col("event_id"),
        (unix_micros(col("ts")) * 1000L).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .coalesce(1).write.parquet(s"${dir("ns")}/events.parquet")

    // µs without UTC adjustment → reads back TIMESTAMP_NTZ (driver layout)
    base.withColumn("ts", col("ts").cast("timestamp_ntz"))
      .coalesce(1).write.parquet(s"${dir("us")}/events.parquet")

    // ms adjusted-to-UTC → reads back TIMESTAMP (session-TZ passthrough)
    val prev = s.conf.get("spark.sql.parquet.outputTimestampType")
    s.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
    try base.coalesce(1).write.parquet(s"${dir("ms")}/events.parquet")
    finally s.conf.set("spark.sql.parquet.outputTimestampType", prev)

    Map("ns" -> dir("ns"), "us" -> dir("us"), "ms" -> dir("ms"))
  }

  test("fixtures load as the three distinct physical ts types") {
    val raw = fixtures.map { case (k, d) =>
      k -> spark.read.parquet(s"$d/events.parquet").schema("ts").dataType
    }
    assert(raw("ns") == LongType)
    assert(raw("us") == TimestampNTZType)
    assert(raw("ms") == TimestampType)
  }

  test("catalog normalizes every layout to a session-TZ timestamp") {
    fixtures.foreach { case (k, d) =>
      val t = Tables.events(spark, d).schema("ts").dataType
      assert(t == TimestampType, s"layout $k resolved ts as $t")
    }
  }

  test("the STREAM source normalizes every layout too (footer-derived schema)") {
    // ChangeLog.stream must pin its readStream schema from the ACTUAL
    // footer and normalize exactly like the batch catalog — round 6's
    // regression would have broken the tail path identically.
    fixtures.foreach { case (k, d) =>
      val t = graft.sources.ChangeLog.stream(spark, d).schema("ts").dataType
      assert(t == TimestampType, s"stream over layout $k resolved ts as $t")
    }
  }

  for (q <- Seq("cdc_apply", "events_ohlc", "window_lag_gap")) {
    test(s"$q result is identical across ns/us/ms layouts") {
      val fn = SparkEntry.queries(q)
      val rows = fixtures.map { case (k, d) =>
        k -> fn(spark, d).collect().toSeq
      }
      assert(rows("ns") == rows("us"),
        s"$q diverges between int64-nanos and us-NTZ layouts")
      assert(rows("ns") == rows("ms"),
        s"$q diverges between int64-nanos and ms-UTC layouts")
    }
  }
}
