package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch micro-benchmark main for isolating operator costs; edit freely
  * between uses (builder-side only, never part of the driver contract).
  *
  * Current probe (r15): doc_ngram_jaccard salt grid S ∈ {4, 8, 16}.
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
    def norm(c: Column) = lower(trim(regexp_replace(c, "\\s+", " ")))

    def packedGram4Arrays(base: DataFrame): DataFrame = {
      def packed(g: Column): Column =
        ((ascii(g.substr(1, 1)).cast("long") * 65536L +
          ascii(g.substr(2, 1)).cast("long")) * 65536L +
          ascii(g.substr(3, 1)).cast("long")) * 65536L +
          ascii(g.substr(4, 1)).cast("long")
      base
        .select(col("doc_id"), col("nt"),
          explode(sequence(lit(1), length(col("nt")) - 3)).as("i"))
        .select(col("doc_id"),
          packed(col("nt").substr(col("i"), lit(4))).as("g"))
        .distinct()
        .groupBy(col("doc_id"))
        .agg(sort_array(collect_list(col("g"))).as("gs"),
          count(lit(1)).as("ng"))
    }

    def ngramJaccard(S: Int): DataFrame = {
      val base = graft.Tables.documentsWide(spark, sfDir)
        .select(col("doc_id"), norm(col("text")).as("nt"))
        .filter(length(col("nt")) >= 4)
      val arr = packedGram4Arrays(base)
      val posts = base.select(col("doc_id"),
          (length(col("nt")).cast("long") / lit(4L)).cast("long").as("band"))
        .select(col("doc_id"),
          explode(array(col("band"), col("band") + 1)).as("pband"))
        .join(arr, Seq("doc_id"))
      val nPart = spark.sparkContext.defaultParallelism * 2
      val saltKeys = Seq(col("pband"), col("si"), col("sj"))
      val pa = posts
        .withColumn("si", pmod(hash(col("doc_id")), lit(S)))
        .withColumn("sj", explode(sequence(lit(0), lit(S - 1))))
        .repartition(nPart, saltKeys: _*)
      val pb = posts
        .withColumn("sj", pmod(hash(col("doc_id")), lit(S)))
        .withColumn("si", explode(sequence(lit(0), lit(S - 1))))
        .repartition(nPart, saltKeys: _*)
      pa.as("a")
        .join(pb.as("b"),
          col("a.pband") === col("b.pband") &&
            col("a.si") === col("b.si") && col("a.sj") === col("b.sj") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          graft.functions.VectorExprs.sortedIntersectCount(
            col("a.gs"), col("b.gs")).as("n_common"),
          col("a.ng").as("nga"), col("b.ng").as("ngb"))
        .distinct()
        .withColumn("jaccard",
          col("n_common").cast("double") /
            (col("nga") + col("ngb") - col("n_common")).cast("double"))
        .filter(col("jaccard") >= 0.5)
        .select(col("doc_a"), col("doc_b"), col("n_common"), col("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    }

    for (rep <- 1 to 5) {
      println(s"--- rep $rep ---")
      t("S=8 (shipped)")(force(ngramJaccard(8)))
      t("S=4")(force(ngramJaccard(4)))
      t("S=16")(force(ngramJaccard(16)))
    }
    spark.stop()
  }
}
