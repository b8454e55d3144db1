package graft

import org.apache.spark.sql.functions._

/** Bucketing (SURVEY.md §4 "co-locate joins via bucketing"): writing both
  * join sides bucketed on the join key lets the join run with NO shuffle
  * exchange — the pre-partitioning strategy that, at 100 TB, turns every
  * repeated fact-fact join on the same key from a full-network shuffle
  * into a local merge.
  */
class BucketedJoinSpec extends SparkSpec {

  test("ensureClusteredTable retries a failed first INSERT instead of " +
      "serving the empty table (r15 review regression)") {
    import spark.implicits._
    // simulate the failure mode: CREATE TABLE succeeded but the INSERT
    // never finished — the table exists, the location has no _SUCCESS.
    // The old nested gating skipped the insert on retry and served an
    // empty scan (kcore then returned all-zero censuses).
    val loc = new java.io.File(java.nio.file.Files
      .createTempDirectory("graft_ect").toFile, "data")
    val name = "graft_ect_probe"
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(
      s"""CREATE TABLE $name (id BIGINT) USING parquet
         |CLUSTERED BY (id) INTO 4 BUCKETS
         |LOCATION '${loc.getAbsolutePath}'""".stripMargin)
    val got = graft.sources.Bucketed.ensureClusteredTable(spark, name,
      "id BIGINT", "CLUSTERED BY (id) INTO 4 BUCKETS", loc)(
      Seq(1L, 2L, 3L).toDF("id").repartition(4, col("id")))
    assert(spark.table(got).count() == 3,
      "retry served the half-created (empty) table")
    // and the landed state is idempotent: a second call neither
    // duplicates nor rewrites
    graft.sources.Bucketed.ensureClusteredTable(spark, name,
      "id BIGINT", "CLUSTERED BY (id) INTO 4 BUCKETS", loc)(
      sys.error("must not rebuild a landed table"))
    assert(spark.table(name).count() == 3)
  }

  test("bucketed tables join without a shuffle exchange") {
    val o = Tables.orders(spark, sfTiny)
    val l = Tables.lineitem(spark, sfTiny)
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    o.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    l.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")

    val joined = spark.table("orders_b")
      .join(spark.table("lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
    // disable broadcast so the join must pick a shuffle-free SMJ over the
    // bucketed layout
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joinedNoB = spark.table("orders_b")
        .join(spark.table("lineitem_b"),
          col("o_orderkey") === col("l_orderkey"))
      joinedNoB.collect()
      val plan = joinedNoB.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joinedNoB.count() ==
        o.join(l, col("o_orderkey") === col("l_orderkey")).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }
}
