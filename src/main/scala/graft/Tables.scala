package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central table catalog over the driver-provided parquet star schema
  * (TESTDATA.md). One parquet file per table; `spark.read.parquet` gives the
  * vectorized columnar scan, and Catalyst pushes filters/projections into it.
  *
  * At 100 TB the only change is the path: a partitioned parquet/iceberg
  * layout (e.g. orders partitioned by month) makes the same calls
  * partition-pruned. Nothing downstream of this object assumes single-file
  * inputs.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects; read it as a long (legacy conf) and convert to a microsecond
    * timestamp with exact integer division (floor — matching DuckDB's
    * epoch_us truncation, so oracle twins agree to the microsecond).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
