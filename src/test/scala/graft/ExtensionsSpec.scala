package graft

import org.apache.spark.sql.functions._
import graft.functions.{MinHashAgg, VectorExprs}
import graft.operators.Skew
import graft.sources.ChangeLog

/** Specs for the extension/plumbing surface: the typed CDC source (batch
  * and file-stream forms), the deterministic salted join, the typed
  * MinHash Aggregator, and the SQL registration of the native expression.
  */
class ExtensionsSpec extends SparkSpec {

  test("ChangeLog.stream over the parquet landing zone equals batch") {
    val q = ChangeLog.stream(spark, sfTiny)
      .writeStream.format("memory").queryName("cdc_src")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("cdc_src")
      val batch = ChangeLog.batch(spark, sfTiny).toDF()
      assert(streamed.count() == batch.count())
      val sCols = streamed.select("event_id", "ts", "user_id")
        .collect().map(_.toString).sorted.toSeq
      val bCols = batch.select("event_id", "ts", "user_id")
        .collect().map(_.toString).sorted.toSeq
      assert(sCols == bCols, "stream and batch reads must agree row-for-row")
    } finally q.stop()
  }

  test("S4 bootstrap: AvailableNow over the landing zone equals batch apply") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-s4").toString
    val q = graft.streaming.Streams.cdcUpsertQuery(spark,
      ChangeLog.stream(spark, sfTiny), s"$tmp/sink", s"$tmp/ckpt",
      availableNow = true)
    try q.awaitTermination(120000)
    finally q.stop()
    val got = graft.streaming.Streams
      .finalState(spark.read.parquet(s"$tmp/sink"))
      .select("user_id", "event_id")
      .collect().map(_.toString).sorted.toSeq
    val expected = graft.streaming.Streams
      .finalState(graft.streaming.Streams.applyLog(
        Tables.events(spark, sfTiny)))
      .select("user_id", "event_id")
      .collect().map(_.toString).sorted.toSeq
    assert(got == expected && got.nonEmpty)
  }

  test("saltedJoin is row-identical to the plain join") {
    val e = Tables.events(spark, sfTiny)
      .select(col("event_id"), col("user_id"), col("value"))
    val dim = Tables.customer(spark, sfTiny)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
    val plain = e.join(dim, Seq("user_id"))
      .collect().map(_.toString).sorted.toSeq
    val salted = Skew.saltedJoin(e, dim, "user_id",
        discriminator = col("event_id"), fanout = 8)
      .select(e.columns.map(col) :+ col("c_mktsegment"): _*)
      .collect().map(_.toString).sorted.toSeq
    // same multiset of rows (column order normalized via explicit select)
    val plainNorm = e.join(dim, Seq("user_id"))
      .select(e.columns.map(col) :+ col("c_mktsegment"): _*)
      .collect().map(_.toString).sorted.toSeq
    assert(salted == plainNorm && plain.size == salted.size)
  }

  test("MinHashAgg Aggregator equals the relational min(substring(md5)) form") {
    val sh = Tables.documents(spark, sfTiny)
      .select(col("doc_id"),
        explode(split(lower(trim(regexp_replace(col("text"), "\\s+", " "))),
          " ")).as("g"))
      .distinct()
    val relational = sh
      .withColumn("h", md5(col("g")))
      .groupBy(col("doc_id"))
      .agg(min(substring(col("h"), 1, 4)).as("h0"),
        (1 until 8).map(i =>
          min(substring(col("h"), 1 + 4 * i, 4)).as(s"h$i")): _*)
      .collect()
      .map(r => r.getLong(0) -> (0 until 8).map(i => r.getString(i + 1)))
      .toMap
    val typed = sh
      .groupBy(col("doc_id"))
      .agg(MinHashAgg.minhashSig(col("g")).as("sig"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toIndexedSeq)
      .toMap
    assert(typed == relational)
  }

  test("dot_scaled is callable from SQL after registration") {
    VectorExprs.register(spark)
    Tables.embeddings(spark, sfTiny).createOrReplaceTempView("emb_sql")
    val viaSql = spark.sql(
      "SELECT vec_id, dot_scaled(embedding, embedding) AS d FROM emb_sql")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaColumn = Tables.embeddings(spark, sfTiny)
      .select(col("vec_id"),
        VectorExprs.dotScaled(col("embedding"), col("embedding")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaColumn)
  }

  test("native top-k operator plans two-phase heaps and matches the window form") {
    val native = operators.Windows.topkNative(spark, sfTiny)
    val physical = native.queryExecution.executedPlan.toString
    // custom Strategy fired: both phases present, and the partial runs
    // BELOW the exchange (map-side, k-bounded shuffle)
    assert(physical.contains("TopKPerGroup"), s"strategy did not fire:\n$physical")
    assert(physical.contains("TopKPartial"), s"no map-side partial:\n$physical")
    val window = operators.Windows.topkPerGroup(spark, sfTiny)
    assert(native.columns.toSeq == window.columns.toSeq)
    val n = native.collect().map(_.toString).toSeq
    val w = window.collect().map(_.toString).toSeq
    assert(n == w, "native top-k differs from the window formulation")
  }
}
