package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Builder-side A/B harness (not part of the library surface): times
  * variant implementations of a query INTERLEAVED in a single JVM and
  * session, taking the per-variant min across rounds — ambient host-load
  * bursts hit both arms alike, which cross-run Bench comparisons on this
  * VM cannot guarantee (measured: the same implementation varies ±60%
  * across separate JVM runs under external load, while interleaved
  * minima rank variants consistently). Edit `variants` to point at the
  * candidates while iterating; registered queries can be compared by
  * name via SparkEntry. Nothing here registers in SparkEntry.
  */
object AB {
  private def force(df: DataFrame): Long = df.queryExecution.toRdd.count()

  /** Scratch map: point entries at candidate implementations while
    * iterating (e.g. a rewritten operator vs the registered one). */
  def variants: Map[String, (SparkSession, String) => DataFrame] =
    graft.SparkEntry.queries

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = args.lift(0).map(_.split(',').toSeq)
      .getOrElse(variants.keys.toSeq.sorted)
    val rounds = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    force(graft.SparkEntry.queries("q1_pricing")(spark, sfDir)) // warm
    val best = scala.collection.mutable.Map.empty[String, Double]
    for (r <- 1 to rounds; n <- names) {
      val t0 = System.nanoTime()
      force(variants(n)(spark, sfDir))
      val t = (System.nanoTime() - t0) / 1e9
      best(n) = math.min(best.getOrElse(n, Double.MaxValue), t)
      println(f"round $r $n%-24s $t%8.3f s   (best ${best(n)}%8.3f)")
    }
    println(best.toSeq.sortBy(_._1)
      .map { case (k, v) => f"$k=$v%.3f" }.mkString("BEST: ", "  ", ""))
    spark.stop()
  }
}
