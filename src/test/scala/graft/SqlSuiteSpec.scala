package graft

import org.apache.spark.sql.functions.col

/** The SQL-text entry surface (operators/SqlSuite.scala): view
  * registration, parser-path equivalence with the DataFrame API, and the
  * one-string-two-engines contract's Spark leg.
  */
class SqlSuiteSpec extends SparkSpec {

  test("registerViews exposes all ten tables to the SQL catalog") {
    operators.SqlSuite.registerViews(spark, sfTiny)
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      assert(spark.catalog.tableExists(t), s"view $t not registered")
      assert(spark.sql(s"SELECT * FROM $t LIMIT 1").count() == 1,
        s"view $t is empty or unreadable through the parser")
    }
    // idempotent: a second registration must not throw or duplicate
    operators.SqlSuite.registerViews(spark, sfTiny)
  }

  test("sql_q1 through the parser returns exactly q1_pricing's rows") {
    val viaSql = SparkEntry.queries("sql_q1")(spark, sfSmall)
    val viaApi = SparkEntry.queries("q1_pricing")(spark, sfSmall)
    // same column set, same row order (both ORDER BY flag, status)
    assert(viaSql.columns.sorted.sameElements(viaApi.columns.sorted))
    val s = viaSql.collect().map(_.toSeq)
    val a = viaApi.collect().map(_.toSeq)
    assert(s.length == a.length && s.indices.forall(i => s(i) == a(i)),
      "parser path diverged from the DataFrame path")
  }

  test("sql_window ranks deterministically through the parser") {
    val r = SparkEntry.queries("sql_window")(spark, sfTiny)
    val rows = r.collect()
    assert(rows.nonEmpty)
    // per customer at most 2 rows, rnk in {1, 2}, price non-increasing
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.length <= 2)
      val byRnk = rs.sortBy(_.getLong(3))
      assert(byRnk.map(_.getLong(3)).sameElements(1L to byRnk.length))
      assert(byRnk.sliding(2).forall {
        case Array(x, y) => x.getDouble(2) >= y.getDouble(2)
        case _ => true
      })
    }
  }

  test("sql queries plan through the same physical machinery (broadcast dims)") {
    val p = SparkEntry.queries("sql_q5")(spark, sfTiny)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"SQL-text q5 lost the broadcast dim joins:\n$p")
  }

  test("sql_params: bound plan equals the inlined plan (rows + pushdown)") {
    operators.SqlSuite.registerViews(spark, sfTiny)
    val bound = operators.SqlSuite.sqlParams(spark, sfTiny)
    val inlined = spark.sql(operators.SqlSuite.sqlParamsOracle)
    assert(bound.collect().toSeq == inlined.collect().toSeq)
    // binding must not defeat the optimizer: the price predicate still
    // reaches the parquet scan as a pushed filter
    val plan = bound.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("o_totalprice"),
      s"bound parameter lost predicate pushdown:\n$plan")
  }

  test("events view serves the normalized timestamp frame") {
    operators.SqlSuite.registerViews(spark, sfTiny)
    val t = spark.sql("SELECT ts FROM events").schema("ts").dataType
    assert(t == org.apache.spark.sql.types.TimestampType,
      s"events.ts through SQL is $t, not the normalized TimestampType")
    assert(spark.sql("SELECT * FROM events WHERE ts IS NOT NULL").count() > 0)
  }
}
