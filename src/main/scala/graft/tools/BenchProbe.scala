package graft.tools
import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Builder-side probe: run each query twice to split codegen/warmup from
  * steady-state. Not part of the driver contract. */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session: tiny job
    spark.range(1000000).selectExpr("sum(id)").collect()
    // optional args = query-name substrings to probe (default: all)
    val wanted = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      args.isEmpty || args.exists(n.contains)
    }
    for ((name, fn) <- wanted) {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        // same full-plan forcer as Bench: count() would let Catalyst prune
        // every computed column out of a pure-projection query
        fn(spark, sfDir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-20s cold=${times(0)}%.3f warm=${times(1)}%.3f warm2=${times(2)}%.3f")
    }
    spark.stop()
  }
}
