package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Builder-side single-query plan dump, PRE-AQE (`sparkPlan`, the same
  * tree PlanSpec's exchange/window pins collect over) plus the executed
  * plan. Usage: Plan <query[,query…]> [sfDir]. PlanAudit dumps every
  * query's executed plan to PLANS.md; this is the fast iteration loop for
  * one query while tuning a pin.
  */
object Plan {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      val qe = SparkEntry.queries(name)(spark, sfDir).queryExecution
      println(s"===== $name sparkPlan (pre-AQE) =====")
      println(qe.sparkPlan.toString)
      println(s"===== $name executedPlan =====")
      println(qe.executedPlan.toString)
    }
    spark.stop()
  }
}
