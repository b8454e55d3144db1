package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch micro-benchmark main for isolating operator costs; edit freely
  * between uses (builder-side only, never part of the driver contract).
  */
object Micro {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    val p = spark.sessionState.sqlParser.parsePlan(
      "SELECT o_orderpriority, count(*) AS n FROM ord VERSION AS OF 3 " +
        "GROUP BY 1 ORDER BY 1")
    println(p.treeString)
    val p2 = spark.sessionState.sqlParser.parsePlan(
      "SELECT * FROM ord TIMESTAMP AS OF '2024-01-01'")
    println(p2.treeString)
    spark.stop()
  }
}
