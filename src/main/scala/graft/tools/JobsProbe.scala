package graft.tools
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Builder-side probe: per-query warm time + Spark job count (job count is
  * the local-mode floor driver — each job is a driver round-trip). */
object JobsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    })
    spark.range(1000000).selectExpr("sum(id)").collect()
    val out = for ((name, fn) <- graft.SparkEntry.queries.toSeq.sortBy(_._1)) yield {
      fn(spark, sfDir).queryExecution.toRdd.count()  // warmup (codegen)
      Thread.sleep(100); jobs.set(0)
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      val t = (System.nanoTime()-t0)/1e9
      Thread.sleep(100)
      (name, t, jobs.get())
    }
    println("== sorted by warm time ==")
    for ((n, t, j) <- out.sortBy(-_._2))
      println(f"$n%-24s t=$t%.3f jobs=$j")
    println(f"TOTAL t=${out.map(_._2).sum}%.2f jobs=${out.map(_._3).sum}")
    spark.stop()
  }
}
