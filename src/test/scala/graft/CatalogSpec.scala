package graft

import org.apache.spark.sql.functions._

/** Catalog surface (S19): external tables + persistent view registered in
  * the shared catalog, visible across sessions, and serving the same rows
  * the code-level readers produce.
  */
class CatalogSpec extends SparkSpec {

  test("register creates the database, external tables, and the view") {
    val db = sources.Catalog.register(spark, sfTiny)
    assert(spark.catalog.databaseExists(db))
    val names = spark.catalog.listTables(db).collect().map(_.name).toSet
    sources.Catalog.tables.foreach(t => assert(names.contains(t), t))
    assert(names.contains("v_customer_orders"))
    // re-registration is a metadata no-op, not an error
    assert(sources.Catalog.register(spark, sfTiny) == db)
  }

  test("catalog objects are visible from a NEW session (shared state)") {
    val db = sources.Catalog.register(spark, sfTiny)
    val other = spark.newSession()
    assert(other.catalog.databaseExists(db))
    assert(other.catalog.tableExists(s"$db.nation"))
    // the view resolves and serves rows in the other session too
    assert(other.table(s"$db.v_customer_orders").count() > 0)
  }

  test("distinct source dirs register distinct databases") {
    assert(sources.Catalog.dbName(sfTiny) != sources.Catalog.dbName(sfSmall))
  }

  test("sql_ctas: partition overwrite is idempotent, partitions complete") {
    val first = sources.Catalog.sqlCtas(spark, sfTiny).collect().toSeq
    val db = sources.Catalog.dbName(sfTiny)
    assert(spark.catalog.tableExists(s"$db.t_order_half"))
    // both halves landed, and they partition the orders table exactly
    val halves = first.map(_.getString(0)).toSet
    assert(halves == Set("h1", "h2"), s"halves=$halves")
    val total = first.map(_.getLong(2)).sum
    assert(total == Tables.orders(spark, sfTiny).count())
    // re-running the backfill INSERT OVERWRITE must REPLACE its own
    // partition, not append — the daily-rerun idempotence contract
    spark.sql(
      s"""INSERT OVERWRITE TABLE $db.t_order_half PARTITION (half = 'h2')
         |SELECT o_orderkey, o_orderpriority,
         |  CAST(o_totalprice * 100 + 0.5 AS BIGINT) AS cents
         |FROM $db.orders
         |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'""".stripMargin)
    val again = sources.Catalog.sqlCtas(spark, sfTiny).collect().toSeq
    assert(again == first, "partition overwrite changed the table content")
  }

  test("row-level DML statements re-run idempotently") {
    // every statement re-executes per call (there is no DML memo): the
    // second run must find nothing to do (UPDATE's assignment falsified
    // its own predicate, DELETE's rows are gone, MERGE re-asserts the
    // same absolute values) and the readback must be bit-identical.
    for (q <- Seq("sql_update", "sql_delete", "sql_merge")) {
      val first = SparkEntry.queries(q)(spark, sfTiny).collect().toSeq
      val second = SparkEntry.queries(q)(spark, sfTiny).collect().toSeq
      assert(first == second, s"$q drifted on re-run")
      assert(first.nonEmpty, s"$q returned no rows")
    }
    // DELETE actually removed the rows (no negative balance survives)
    val db = sources.Catalog.dbName(sfTiny)
    assert(spark.sql(
      s"SELECT count(*) FROM $db.t_dml_del WHERE cents < 0")
      .head().getLong(0) == 0L)
    // MERGE inserted the synthetic segment exactly once
    val n = spark.sql(
      s"SELECT count(*) FROM $db.t_dml_merge WHERE seg = 'NEWSEG'")
      .head().getLong(0)
    val expect = spark.table(s"$db.customer")
      .filter(col("c_custkey") % 1000 === 0).count()
    assert(n == expect, s"NEWSEG rows $n != $expect")
  }

  test("catalog_view equals the direct-reader computation") {
    val viaCatalog = sources.Catalog.catalogView(spark, sfTiny)
    val c = Tables.customer(spark, sfTiny)
    val n = Tables.nation(spark, sfTiny)
    val r = Tables.region(spark, sfTiny)
    val o = Tables.orders(spark, sfTiny)
    val direct = c
      .join(n, col("n_nationkey") === col("c_nationkey"))
      .join(r, col("r_regionkey") === col("n_regionkey"))
      .join(o, col("o_custkey") === col("c_custkey"), "left")
      .groupBy(col("r_name").as("region"), col("c_mktsegment"))
      .agg(
        countDistinct(col("c_custkey")).as("n_customers"),
        count(col("o_orderkey")).as("n_orders"),
        (functions.Det.splitSum(
            (col("o_totalprice") * 100 + lit(0.5)).cast("long"))
          .cast("double") / 100).as("total_value"))
      .orderBy(col("region"), col("c_mktsegment"))
    assert(viaCatalog.collect().toSeq == direct.collect().toSeq)
  }

  test("catalog_stats: ANALYZE stats are exact and visible cross-session") {
    val got = sources.Catalog.catalogStats(spark, sfTiny).collect()
    assert(got.length == 3)
    val exactRows = Tables.customer(spark, sfTiny).count()
    assert(got.forall(_.getLong(1) == exactRows),
      "stats rowCount diverges from exact count")
    assert(got.forall(_.getBoolean(5)), "an NDV sketch left its 10% bound")
    // the analyzed stats live in the SHARED catalog: a fresh session on
    // the same SparkContext reads them without re-running ANALYZE
    val s2 = spark.newSession()
    val db = sources.Catalog.dbName(sfTiny)
    val meta = s2.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("customer", Some(db)))
    assert(meta.stats.exists(_.colStats.contains("c_custkey")),
      "column stats not visible from a new session")
  }

  test("sql_alter_table: ALTER ADD COLUMNS is run-once idempotent, " +
      "pre-ALTER files read NULL, the schema holds the column exactly once") {
    val first = sources.Catalog.sqlAlterTable(spark, sfTiny).collect()
    // re-running the query function must neither re-ALTER (which would
    // throw on a duplicate column) nor change the census
    val second = sources.Catalog.sqlAlterTable(spark, sfTiny).collect()
    assert(first.toSeq == second.toSeq,
      "sql_alter_table is not idempotent across calls")
    val db = sources.Catalog.dbName(sfTiny)
    val fields = spark.table(s"$db.t_alter_orders").schema.fieldNames.toSeq
    assert(fields.count(_ == "ship_latency_days") == 1,
      s"evolved column appears ${fields.count(_ == "ship_latency_days")}x")
    // epoch split: pre-ALTER rows must serve NULL for the evolved column
    val nulls = spark.table(s"$db.t_alter_orders")
      .filter("ship_latency_days IS NULL").count()
    val pre = spark.table(s"$db.orders")
      .filter("o_orderdate < TIMESTAMP '1997-01-01 00:00:00'").count()
    assert(nulls == pre,
      s"pre-ALTER rows should all read NULL ($nulls != $pre)")
  }

  test("catalog objects persist across JVM RESTART via the Derby-backed " +
      "Hive metastore: tables, view, and ANALYZE stats (S64)") {
    // r12 verdict task 6: the in-memory ExternalCatalog pins
    // cross-SESSION visibility; durable deployment needs cross-JVM. Two
    // forked JVMs share one embedded-Derby metastore dir: the first runs
    // the SAME Catalog.register + ANALYZE the suite uses, the second
    // must discover every object by name with ZERO registration calls.
    val meta = java.nio.file.Files.createTempDirectory("graft_meta").toFile
    val opens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    def run(phase: String): String = {
      val cmd = Seq(s"${sys.props("java.home")}/bin/java", "-Xmx4g") ++
        opens ++ Seq("-cp", sys.props("java.class.path"),
          "graft.tools.DurableCatalogProbe", phase,
          meta.getAbsolutePath, s"${meta.getAbsolutePath}/wh", sfTiny)
      val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      val out = scala.io.Source.fromInputStream(p.getInputStream).mkString
      assert(p.waitFor() == 0,
        s"$phase phase failed:\n${out.takeRight(3000)}")
      out
    }
    run("create")
    val read = run("read").linesIterator
      .find(_.startsWith("PROBE_READ")).getOrElse(
        fail("read phase printed no PROBE_READ line"))
    // 10 catalog objects (9 tables + the view), nation census, view
    // census, and the metastore-persisted ANALYZE row count — all from
    // a JVM that never called register()
    assert(read.contains("tables=10"), read)
    assert(read.contains("nations=25"), read)
    assert(read.contains("stats_rows=25"), read)
    val viewRows = "view_rows=(\\d+)".r.findFirstMatchIn(read)
      .map(_.group(1).toLong).getOrElse(-1L)
    assert(viewRows > 0, read)
  }
}
