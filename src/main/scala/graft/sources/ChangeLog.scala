package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.Streams.ChangeEvent

/** The CDC change-log source (SURVEY.md §2.1 rows S2/S4), in both forms the
  * engine consumes it:
  *
  *  - `batch` — the bounded snapshot read every DuckDB-oracled batch twin
  *    uses, typed to the Debezium-style `ChangeEvent` envelope.
  *  - `stream` — the unbounded form: a file-based Structured Streaming
  *    source over the same parquet (schema pinned up front, as readStream
  *    requires), which is exactly how a production tail would consume a
  *    CDC landing zone; `Trigger.AvailableNow` over it implements the
  *    standard snapshot-then-tail bootstrap (S4).
  *
  * The parquet stores `ts` as TIMESTAMP(NANOS), which Spark's vectorized
  * reader only exposes as int64 (legacy nanosAsLong conf); both forms share
  * the same floor-division conversion to microsecond timestamps so batch
  * and stream agree to the microsecond with the DuckDB oracle.
  *
  * Scale note: the file stream source checkpoints consumed files exactly
  * like a resume token — restart-safe, no reprocessing — and partitions
  * work by file/row-group, so a 100-TB landing zone tails with
  * data-proportional parallelism.
  */
object ChangeLog {

  /** Physical read schema of events.parquet under nanosAsLong. */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def convertTs(df: DataFrame): DataFrame =
    df.withColumn("ts", timestamp_micros(expr("ts div 1000")))

  def batch(spark: SparkSession, sfDir: String): Dataset[ChangeEvent] = {
    import spark.implicits._
    graft.Tables.events(spark, sfDir).as[ChangeEvent]
  }

  def stream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // the file-stream source wants a directory; the glob filter narrows it
    // to the events landing files among the other tables
    convertTs(
      spark.readStream
        .schema(rawSchema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sfDir))
  }
}
