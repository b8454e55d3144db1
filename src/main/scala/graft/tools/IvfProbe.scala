package graft.tools
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object IvfProbe {
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
    for (rep <- 1 to 2) {
      var t0 = System.nanoTime()
      def lap(tag: String): Unit = {
        println(f"rep=$rep $tag%-12s t=${(System.nanoTime()-t0)/1e9}%.3f jobs=${jobs.get()}")
        jobs.set(0); t0 = System.nanoTime()
      }
      jobs.set(0)
      val pairs = graft.operators.NearDup.docSimhashDup(spark, sfDir)
        .select(col("doc_a"), col("doc_b")).localCheckpoint()
      lap("pairs")
      val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      var labels = edges.groupBy(col("src"))
        .agg(least(min(col("dst")), col("src")).as("label"))
        .select(col("src").as("id"), col("label")).localCheckpoint()
      lap("seed")
      val savedAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
      val savedPart = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.shuffle.partitions", "1")
      var changed = 1L
      var round = 0
      while (changed > 0) {
        round += 1
        val prop = edges.join(labels, col("src") === col("id"))
          .groupBy(col("dst")).agg(min(col("label")).as("nbr_min"))
        val next = labels.as("x")
          .join(prop, col("x.id") === col("dst"), "left")
          .withColumn("l1", least(col("x.label"), coalesce(col("nbr_min"), col("x.label"))))
          .join(labels.as("y").select(col("id").as("yid"), col("label").as("ylabel")),
            col("l1") === col("yid"), "left")
          .withColumn("l2", least(col("l1"), coalesce(col("ylabel"), col("l1"))))
          .select(col("x.id").as("id"), col("l2").as("label"),
            (col("l2") < col("x.label")).as("chg"))
          .localCheckpoint()
        lap(s"round$round-ckpt")
        changed = next.filter(col("chg")).count()
        labels = next.select(col("id"), col("label"))
        lap(s"round$round-cnt(changed=$changed)")
      }
      spark.conf.set("spark.sql.adaptive.enabled", savedAqe)
      spark.conf.set("spark.sql.shuffle.partitions", savedPart)
    }
    spark.stop()
  }
}
