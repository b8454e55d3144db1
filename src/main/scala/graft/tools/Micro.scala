package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch micro-benchmark main for isolating operator costs; edit freely
  * between uses (builder-side only, never part of the driver contract).
  *
  * Current probe (r15): graph_pagerank edge-build duplication — the
  * shipped shape recomputes the li⋈o join in both union legs of `edges`,
  * and again for edgesD (4 executions); variant B pins cp once.
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
    def force(df: DataFrame): Long = df.queryExecution.toRdd.count()

    def pagerank(pinCp: Boolean): DataFrame = {
      val o = graft.Tables.orders(spark, sfDir)
        .select(col("o_orderkey"), col("o_custkey"))
      val li = graft.Tables.lineitem(spark, sfDir)
        .select(col("l_orderkey"), col("l_partkey"))
      val cp0 = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_partkey") * 2 + 1).as("dst"))
      val cp = if (pinCp) cp0.localCheckpoint() else cp0
      val edges = cp.unionByName(
          cp.select(col("dst").as("src"), col("src").as("dst")))
      val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .localCheckpoint()
      val edgesD = edges.join(broadcast(outdeg), Seq("src"))
        .coalesce(8).localCheckpoint()
      val n = outdeg.count()
      val r0 = 1000000000000000L / n
      val base = (15L * r0) / 100L
      var ranks = outdeg.select(col("src").as("node"), lit(r0).as("rank"))
      for (_ <- 1 to 3) {
        ranks = edgesD
          .join(broadcast(ranks.select(col("node").as("src"), col("rank"))),
            Seq("src"))
          .select(col("dst").as("node"), expr("rank div deg").as("contrib"))
          .groupBy(col("node")).agg(sum(col("contrib")).as("s"))
          .select(col("node"),
            (lit(base) + expr("(85 * s) div 100")).as("rank"))
      }
      ranks
        .select(
          when(col("node") % 2 === 0, lit("customer")).otherwise(lit("part"))
            .as("kind"),
          expr("node div 2").as("id"), col("rank"))
        .orderBy(col("rank").desc, col("kind"), col("id"))
        .limit(20)
    }

    for (rep <- 1 to 5) {
      println(s"--- rep $rep ---")
      t("A: shipped (cp unpinned)")(force(pagerank(false)))
      t("B: cp pinned")(force(pagerank(true)))
    }
    spark.stop()
  }
}
