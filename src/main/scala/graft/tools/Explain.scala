package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Builder-side `.explain("formatted")` dump for the r15 optimization
  * evidence files (plans/r15/<query>_{before,after}.txt). Runs under the
  * SAME session confs as graft.Bench (local[32], 32 shuffle partitions,
  * AQE on) so the captured plan is the plan the bench times — Plan.scala's
  * local[4] tree is the PlanSpec pin surface, not the bench shape.
  *
  * Usage: Explain <query[,query…]> [sfDir] [outDir] [tag]
  * Writes outDir/<query>_<tag>.txt with the formatted plan (scan pushdown,
  * ReadSchema, exchange placement, join strategy, codegen spans) followed
  * by the post-execution executedPlan (AQE-final shape).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 2) args(2) else "plans/r15"
    val tag = if (args.length > 3) args(3) else "before"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val qe = df.queryExecution
      val formatted = qe.explainString(ExplainMode.fromString("formatted"))
      // execute so the AQE-final executed plan is real, not isFinalPlan=false
      qe.toRdd.count()
      val executed = qe.executedPlan.toString
      val txt = s"===== $name — explain(formatted), sf=$sfDir, " +
        s"local[$cpus] =====\n$formatted\n" +
        s"===== $name — executedPlan after execution (AQE final) =====\n" +
        s"$executed\n"
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${name}_$tag.txt"),
        txt.getBytes("UTF-8"))
      println(s"[explain] wrote $outDir/${name}_$tag.txt")
    }
    spark.stop()
  }
}
