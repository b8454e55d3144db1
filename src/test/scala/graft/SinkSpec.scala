package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Sink/source surface (SURVEY.md §2.1 rows S1/S5): partitioned parquet
  * writes with partition pruning on read-back — the layout that makes the
  * 100-TB story work (Tables.scala scale note) — plus CSV and JSON
  * round-trips (the interchange formats of a CDC landing zone).
  */
class SinkSpec extends SparkSpec {

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-$tag").toString

  test("partitionBy write + partition-pruned read-back") {
    val dir = tmp("part")
    val docs = Tables.documents(spark, sfTiny)
    docs.write.mode("overwrite").partitionBy("lang").parquet(dir)

    val back = spark.read.parquet(dir)
    assert(back.count() == docs.count())

    val en = back.filter(col("lang") === "en")
    val plan = en.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("lang"),
      s"expected lang partition filter in scan:\n$plan")
    val expected = docs.filter(col("lang") === "en")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val got = en.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == expected)
  }

  test("schema drift: mergeSchema reads v1+v2 landing files as one table") {
    // CDC landing zones drift: a new upstream field appears mid-stream.
    // Old files lack the column (null-filled on read), new files carry it.
    val dir = tmp("drift")
    val v1 = Tables.events(spark, sfTiny)
      .select("event_id", "user_id", "event_type")
      .filter(col("event_id") % 2 === 0)
    val v2 = Tables.events(spark, sfTiny)
      .select("event_id", "user_id", "event_type", "value")
      .filter(col("event_id") % 2 === 1)
    v1.write.parquet(s"$dir/batch=1")
    v2.write.parquet(s"$dir/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet ==
      Set("event_id", "user_id", "event_type", "value", "batch"))
    assert(merged.count() == Tables.events(spark, sfTiny).count())
    assert(merged.filter(col("value").isNull).count() == v1.count(),
      "pre-drift rows must null-fill the new column")
  }

  test("csv round-trip preserves the relational core") {
    val dir = tmp("csv")
    val li = Tables.lineitem(spark, sfTiny)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    li.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema(li.schema).csv(dir)
    assert(back.collect().map(_.toString).sorted.toSeq ==
      li.collect().map(_.toString).sorted.toSeq)
  }

  test("json-lines round-trip preserves nested-friendly types") {
    val dir = tmp("json")
    val e = Tables.events(spark, sfTiny)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("props"))
    e.write.mode("overwrite").json(dir)
    val back = spark.read.schema(e.schema).json(dir)
    assert(back.collect().map(_.toString).sorted.toSeq ==
      e.collect().map(_.toString).sorted.toSeq)
  }
}
