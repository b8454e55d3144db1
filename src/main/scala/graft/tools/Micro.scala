package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch micro-benchmark main for isolating operator costs; edit freely
  * between uses (builder-side only, never part of the driver contract).
  *
  * Current probe (r15): connectedComponents loop variants —
  *   A: shipped shape (1 pointer jump/round, count every round)
  *   B: 3 pointer jumps per round
  *   C: B + edges pre-partitioned on src (exchange reuse across rounds)
  */
object Micro {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[micro] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }

    // variant: "ship" = shipped shape (jump via OLD labels);
    // "new" = jump via NEW tentative labels, un-checkpointed self-join;
    // "newck" = NEW-deref with cur checkpointed before the jump;
    // "both" = OLD-labels jump then NEW-deref jump
    def ccLoop(edges0: DataFrame, variant: String): DataFrame = {
      val spark = edges0.sparkSession
      val aqePrev = spark.conf.get("spark.sql.adaptive.enabled", "true")
      val partPrev = spark.conf.get("spark.sql.shuffle.partitions", "32")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      try {
        val edges = edges0
        var labels = edges
          .groupBy(col("src"))
          .agg(least(min(col("dst")), col("src")).as("label"))
          .select(col("src").as("id"), col("label"))
          .localCheckpoint()
        var changed = 1L
        var round = 0
        while (changed > 0) {
          round += 1
          val prop = edges.join(labels, col("src") === col("id"))
            .groupBy(col("dst"))
            .agg(min(col("label")).as("nbr_min"))
          var cur = labels.as("x")
            .join(prop, col("x.id") === col("dst"), "left")
            .select(col("x.id").as("id"), col("x.label").as("old"),
              least(col("x.label"), coalesce(col("nbr_min"), col("x.label")))
                .as("l"))
          if (variant == "ship" || variant == "both") {
            cur = cur
              .join(labels.select(col("id").as("yid"),
                col("label").as("ylabel")), col("l") === col("yid"), "left")
              .select(col("id"), col("old"),
                least(col("l"), coalesce(col("ylabel"), col("l"))).as("l"))
          }
          if (variant == "newck") cur = cur.localCheckpoint()
          if (variant != "ship") {
            val deref = cur.select(col("id").as("zid"), col("l").as("zl"))
            cur = cur
              .join(deref, col("l") === col("zid"), "left")
              .select(col("id"), col("old"),
                least(col("l"), coalesce(col("zl"), col("l"))).as("l"))
          }
          val next = cur
            .select(col("id"), col("l").as("label"),
              (col("l") < col("old")).as("chg"))
            .localCheckpoint()
          changed = next.filter(col("chg")).count()
          labels = next.select(col("id"), col("label"))
        }
        println(s"[micro]   rounds = $round")
        labels
      } finally {
        spark.conf.set("spark.sql.adaptive.enabled", aqePrev)
        spark.conf.set("spark.sql.shuffle.partitions", partPrev)
      }
    }

    def checksum(l: DataFrame): Long =
      l.agg(sum(col("id") * col("label"))).collect()(0).getLong(0)

    for (rep <- 1 to 4) {
      println(s"--- rep $rep ---")
      val pairs = graft.operators.NearDup.docSimhashDup(spark, sfDir)
        .select(col("doc_a"), col("doc_b")).localCheckpoint()
      pairs.count()
      val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
        .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      for (variant <- Seq("ship", "new", "newck", "both")) {
        val l = t(variant)(ccLoop(edges, variant))
        println(s"[micro]   checksum = ${checksum(l)}")
      }
    }
    spark.stop()
  }
}
