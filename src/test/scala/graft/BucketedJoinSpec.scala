package graft

import org.apache.spark.sql.functions._

/** Bucketing (SURVEY.md §4 "co-locate joins via bucketing"): writing both
  * join sides bucketed on the join key lets the join run with NO shuffle
  * exchange — the pre-partitioning strategy that, at 100 TB, turns every
  * repeated fact-fact join on the same key from a full-network shuffle
  * into a local merge.
  */
class BucketedJoinSpec extends SparkSpec {

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
