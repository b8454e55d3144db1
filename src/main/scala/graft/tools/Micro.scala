package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch micro-benchmark main for isolating operator costs; edit freely
  * between uses (builder-side only, never part of the driver contract).
  */
object Micro {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String, n: Int = 3)(f: => Long): Unit = {
      for (_ <- 1 to n) {
        val t0 = System.nanoTime()
        val r = f
        println(f"$tag%-30s ${(System.nanoTime()-t0)/1e9}%.3f s  (n=$r)")
      }
    }
    import graft.Tables
    // kcore pieces
    time("edges0_build") {
      val baskets = Tables.lineitem(spark, sfDir)
        .filter(col("l_partkey") % 2 === 0)
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_set(col("l_partkey"))).as("items"))
      val pairsCol = expr(
        "flatten(transform(items, (v, i) -> " +
          "transform(slice(items, i + 2, size(items)), " +
          "w -> struct(v AS x, w AS y))))")
      val edges0 = baskets.select(explode(pairsCol).as("pr"))
        .select(col("pr.x").as("x"), col("pr.y").as("y"))
        .distinct().localCheckpoint()
      edges0.count()
    }
    time("kcore_full") {
      graft.SparkEntry.queries("graph_kcore")(spark, sfDir).count()
    }
    time("gsp_full") {
      graft.SparkEntry.queries("graph_shortest_paths")(spark, sfDir).count()
    }
    time("gsp_cp_build") {
      val o = Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey"))
      val li = Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_partkey"))
      val cp = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
        .localCheckpoint()
      cp.count()
    }
    spark.stop()
  }
}
