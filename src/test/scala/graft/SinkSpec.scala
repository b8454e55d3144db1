package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Sink/source surface (SURVEY.md §2.1 rows S1/S5): partitioned parquet
  * writes with partition pruning on read-back — the layout that makes the
  * 100-TB story work (Tables.scala scale note) — plus CSV and JSON
  * round-trips (the interchange formats of a CDC landing zone).
  */
class SinkSpec extends SparkSpec {

  private def tmp(tag: String): String =
    Files.createTempDirectory(s"graft-$tag").toString

  test("partitionBy write + partition-pruned read-back") {
    val dir = tmp("part")
    val docs = Tables.documents(spark, sfTiny)
    docs.write.mode("overwrite").partitionBy("lang").parquet(dir)

    val back = spark.read.parquet(dir)
    assert(back.count() == docs.count())

    val en = back.filter(col("lang") === "en")
    val plan = en.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("lang"),
      s"expected lang partition filter in scan:\n$plan")
    val expected = docs.filter(col("lang") === "en")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val got = en.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == expected)
  }

  test("schema drift: mergeSchema reads v1+v2 landing files as one table") {
    // CDC landing zones drift: a new upstream field appears mid-stream.
    // Old files lack the column (null-filled on read), new files carry it.
    val dir = tmp("drift")
    val v1 = Tables.events(spark, sfTiny)
      .select("event_id", "user_id", "event_type")
      .filter(col("event_id") % 2 === 0)
    val v2 = Tables.events(spark, sfTiny)
      .select("event_id", "user_id", "event_type", "value")
      .filter(col("event_id") % 2 === 1)
    v1.write.parquet(s"$dir/batch=1")
    v2.write.parquet(s"$dir/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet ==
      Set("event_id", "user_id", "event_type", "value", "batch"))
    assert(merged.count() == Tables.events(spark, sfTiny).count())
    assert(merged.filter(col("value").isNull).count() == v1.count(),
      "pre-drift rows must null-fill the new column")
  }

  test("csv round-trip preserves the relational core") {
    val dir = tmp("csv")
    val li = Tables.lineitem(spark, sfTiny)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    li.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema(li.schema).csv(dir)
    assert(back.collect().map(_.toString).sorted.toSeq ==
      li.collect().map(_.toString).sorted.toSeq)
  }

  test("json-lines round-trip preserves nested-friendly types") {
    val dir = tmp("json")
    val e = Tables.events(spark, sfTiny)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("props"))
    e.write.mode("overwrite").json(dir)
    val back = spark.read.schema(e.schema).json(dir)
    assert(back.collect().map(_.toString).sorted.toSeq ==
      e.collect().map(_.toString).sorted.toSeq)
  }

  // ---- JDBC sink (S5 relational form): embedded Derby stands in for the
  // MySQL side of the CDC pipeline; same statements, different URL. ----

  private def withDerby(db: String)(f: java.sql.Connection => Unit): Unit = {
    val conn = java.sql.DriverManager
      .getConnection(s"jdbc:derby:memory:$db;create=true")
    try f(conn) finally conn.close()
  }

  private def tableState(conn: java.sql.Connection): Map[Long, (Long, Double)] = {
    val rs = conn.createStatement()
      .executeQuery("SELECT user_id, event_id, value FROM sink_t")
    val b = Map.newBuilder[Long, (Long, Double)]
    while (rs.next()) b += (rs.getLong(1) -> (rs.getLong(2), rs.getDouble(3)))
    b.result()
  }

  test("JDBC sink: insert, upsert, delete round-trip against Derby") {
    import spark.implicits._
    import graft.streaming.Streams
    val url = "jdbc:derby:memory:graftjdbc;create=true"
    withDerby("graftjdbc") { conn =>
      conn.createStatement().execute(
        """CREATE TABLE sink_t (user_id BIGINT PRIMARY KEY,
          |ts TIMESTAMP, event_id BIGINT, value DOUBLE)""".stripMargin)
      def ev(id: Long, minute: Int, user: Long, typ: String, value: Double) =
        Streams.ChangeEvent(id, new java.sql.Timestamp(
          1704067200000L + minute * 60000L), user, typ, value, """{"k": 1}""")
      // batch 1: three inserts
      graft.sources.JdbcApply.upsertDelete(Streams.applyLog(Seq(
        ev(1, 0, 1, "view", 1.0), ev(2, 1, 2, "view", 2.0),
        ev(3, 2, 3, "view", 3.0)).toDF()), url, "sink_t")
      assert(tableState(conn) ==
        Map(1L -> (1L, 1.0), 2L -> (2L, 2.0), 3L -> (3L, 3.0)))
      // batch 2: update user 1, DELETE user 2 (tombstone), insert user 4
      graft.sources.JdbcApply.upsertDelete(Streams.applyLog(Seq(
        ev(4, 10, 1, "click", 9.5), ev(5, 11, 2, "error", 0.0),
        ev(6, 12, 4, "view", 4.0)).toDF()), url, "sink_t")
      assert(tableState(conn) ==
        Map(1L -> (4L, 9.5), 3L -> (3L, 3.0), 4L -> (6L, 4.0)),
        "upsert must replace, delete must remove, insert must add")
    }
  }

  test("JDBC sink: streaming foreachBatch upsert equals the batch apply") {
    import spark.implicits._
    import graft.streaming.Streams
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val url = "jdbc:derby:memory:graftstream;create=true"
    withDerby("graftstream") { conn =>
      conn.createStatement().execute(
        """CREATE TABLE sink_t (user_id BIGINT PRIMARY KEY,
          |ts TIMESTAMP, event_id BIGINT, value DOUBLE)""".stripMargin)
      def ev(id: Long, minute: Int, user: Long, typ: String, value: Double) =
        Streams.ChangeEvent(id, new java.sql.Timestamp(
          1704067200000L + minute * 60000L), user, typ, value, """{"k": 1}""")
      val events1 = Seq(ev(1, 0, 1, "view", 1.0), ev(2, 1, 2, "view", 2.0))
      val events2 = Seq(ev(3, 10, 1, "click", 5.0), ev(4, 11, 2, "error", 0.0),
        ev(5, 12, 3, "view", 3.0))
      val input = MemoryStream[Streams.ChangeEvent](spark)
      val q = Streams.cdcUpsertJdbcQuery(input.toDF(), url, "sink_t",
        tmp("jdbc-ckpt"))
      try {
        input.addData(events1); q.processAllAvailable()
        input.addData(events2); q.processAllAvailable()
      } finally q.stop()
      val expected = Streams.finalState(
          Streams.applyLog((events1 ++ events2).toDF()))
        .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3)))
        .toMap
      assert(tableState(conn) == expected,
        "incremental JDBC apply must equal the one-shot batch apply")
    }
  }

  test("JDBC sink: kill + restart from checkpoint converges (exactly-once)") {
    // The crash-restart boundary SURVEY §3.2 names: a consumer dies after
    // the sink commit + offset commit of batch 1, restarts FROM THE SAME
    // CHECKPOINT against a source whose early offsets are replayed. The
    // restarted query must (a) skip the already-committed offset — proven
    // by poisoning the replayed batch with a tombstone that would delete a
    // live key if reprocessed — and (b) keep applying new offsets, so the
    // Derby table converges to exactly applyLog's one-shot batch answer.
    import spark.implicits._
    import graft.streaming.Streams
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val url = "jdbc:derby:memory:graftrestart;create=true"
    withDerby("graftrestart") { conn =>
      conn.createStatement().execute(
        """CREATE TABLE sink_t (user_id BIGINT PRIMARY KEY,
          |ts TIMESTAMP, event_id BIGINT, value DOUBLE)""".stripMargin)
      def ev(id: Long, minute: Int, user: Long, typ: String, value: Double) =
        Streams.ChangeEvent(id, new java.sql.Timestamp(
          1704067200000L + minute * 60000L), user, typ, value, """{"k": 1}""")
      val ckpt = tmp("jdbc-restart-ckpt")
      val events1 = Seq(ev(1, 0, 1, "view", 1.0), ev(2, 1, 2, "view", 2.0))
      val events2 = Seq(ev(3, 10, 2, "click", 9.0), ev(4, 11, 3, "view", 3.0))

      val input1 = MemoryStream[Streams.ChangeEvent](spark)
      val q1 = Streams.cdcUpsertJdbcQuery(input1.toDF(), url, "sink_t", ckpt)
      try {
        input1.addData(events1); q1.processAllAvailable()
      } finally q1.stop() // the "crash": query killed, checkpoint survives
      assert(tableState(conn) == Map(1L -> (1L, 1.0), 2L -> (2L, 2.0)))

      val input2 = MemoryStream[Streams.ChangeEvent](spark)
      // replayed offset 0: a poison tombstone for user 1 — if the restart
      // reprocessed it, user 1 would vanish from the sink
      input2.addData(Seq(ev(99, 50, 1, "error", 0.0)))
      val q2 = Streams.cdcUpsertJdbcQuery(input2.toDF(), url, "sink_t", ckpt)
      try {
        q2.processAllAvailable()
        input2.addData(events2); q2.processAllAvailable()
      } finally q2.stop()

      val expected = Streams.finalState(
          Streams.applyLog((events1 ++ events2).toDF()))
        .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3)))
        .toMap
      assert(tableState(conn) == expected,
        "restart must skip committed offsets, apply new ones, and " +
          s"converge to the batch answer; got ${tableState(conn)}")
    }
  }

  test("S2 live tail: file-stream over a GROWING landing, kill + restart, " +
      "each file applied exactly once") {
    // The end-to-end CDC shape VERDICT r6 called the last [K] gap: a real
    // landing directory that keeps receiving parquet fragments, tailed by
    // the FILE stream source (not MemoryStream) into the JDBC sink.
    // Fragment f1 lands before the stream starts (the snapshot), f2 lands
    // WHILE the query runs (the live tail), the query is killed, f3 lands
    // during the outage, and a restart from the same checkpoint must apply
    // exactly f3 — the file source's consumed-files log is the resume
    // token. Exactly-once is asserted directly from the restarted query's
    // progress (numInputRows == |f3|): a re-read of f1/f2 would inflate
    // it even though LWW ordering could mask resurrection in final state.
    import spark.implicits._
    import graft.streaming.Streams
    val url = "jdbc:derby:memory:graftlive;create=true"
    withDerby("graftlive") { conn =>
      conn.createStatement().execute(
        """CREATE TABLE sink_t (user_id BIGINT PRIMARY KEY,
          |ts TIMESTAMP, event_id BIGINT, value DOUBLE)""".stripMargin)
      def ev(id: Long, minute: Int, user: Long, typ: String, value: Double) =
        Streams.ChangeEvent(id, new java.sql.Timestamp(
          1704067200000L + minute * 60000L), user, typ, value, """{"k": 1}""")
      val landing = tmp("live-landing")
      val ckpt = tmp("live-ckpt")
      def land(evs: Seq[Streams.ChangeEvent]): Unit =
        evs.toDF().coalesce(1).write.mode("append").parquet(landing)
      val schema = org.apache.spark.sql.Encoders.product[Streams.ChangeEvent].schema
      def tail() = Streams.cdcUpsertJdbcQuery(
        spark.readStream.schema(schema).parquet(landing), url, "sink_t", ckpt)

      val f1 = Seq(ev(1, 0, 1, "view", 1.0), ev(2, 1, 2, "view", 2.0))
      val f2 = Seq(ev(3, 10, 2, "click", 9.0))
      val f3 = Seq(ev(4, 20, 1, "error", 0.0), ev(5, 21, 3, "view", 3.0))

      land(f1)
      val q1 = tail()
      try {
        q1.processAllAvailable()
        assert(tableState(conn) == Map(1L -> (1L, 1.0), 2L -> (2L, 2.0)),
          "snapshot fragment must be applied before the tail continues")
        land(f2) // arrives while the query is LIVE
        q1.processAllAvailable()
        assert(tableState(conn) == Map(1L -> (1L, 1.0), 2L -> (3L, 9.0)),
          "fragment landed mid-stream must be picked up by the running tail")
      } finally q1.stop() // the crash; checkpoint + consumed-file log survive

      land(f3) // arrives during the outage
      val q2 = tail()
      try q2.processAllAvailable() finally q2.stop()

      val expected = Streams.finalState(
          Streams.applyLog((f1 ++ f2 ++ f3).toDF()))
        .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3)))
        .toMap
      assert(tableState(conn) == expected,
        s"restarted tail must converge to the batch answer; got ${tableState(conn)}")
      val replayed = q2.recentProgress.map(_.numInputRows).sum
      assert(replayed == f3.size,
        s"restart must read ONLY the outage fragment (${f3.size} rows), read $replayed")
    }
  }

  test("JDBC sink: the upsert pipeline runs end-to-end off a RATE source") {
    // The non-Memory live-source leg (r7/r8 verdict carry-over): the same
    // cdcUpsertJdbcQuery that SinkSpec drives from MemoryStream here
    // consumes Spark's built-in rate source — a genuinely asynchronous,
    // wall-clock-driven stream (the sandbox's stand-in for a Kafka-class
    // bus) — and applies LWW upserts into Derby. Rate row COUNTS are
    // nondeterministic, so the assertions are prefix-stable invariants:
    // processed offsets form a prefix 0..N-1, events map user_id =
    // event_id % 50, no deletes occur, so the table holds one row per
    // user whose stored event_id is the LARGEST processed id of that
    // residue class — all 50 users present once N >= 50, every stored id
    // within a 50-wide tail window, ids ≡ user (mod 50), value = 1.0.
    import graft.streaming.Streams
    val url = "jdbc:derby:memory:graftrate;create=true"
    withDerby("graftrate") { conn =>
      conn.createStatement().execute(
        """CREATE TABLE sink_t (user_id BIGINT PRIMARY KEY,
          |ts TIMESTAMP, event_id BIGINT, value DOUBLE)""".stripMargin)
      val rate = spark.readStream.format("rate")
        .option("rowsPerSecond", "500").option("numPartitions", "1").load()
      val base = 1704067200L
      val events = rate.select(
        col("value").as("event_id"),
        timestamp_seconds(lit(base) + col("value")).as("ts"),
        (col("value") % 50).as("user_id"),
        lit("click").as("event_type"),
        lit(1.0).as("value"),
        lit("""{"k": 1}""").as("props"))
      val q = Streams.cdcUpsertJdbcQuery(events, url, "sink_t",
        tmp("rate-jdbc-ckpt"))
      try {
        var tries = 0
        while (tableState(conn).size < 50 && tries < 60) {
          Thread.sleep(500); q.processAllAvailable(); tries += 1
        }
      } finally q.stop()
      val state = tableState(conn)
      assert(state.size == 50, s"expected all 50 users, got ${state.size}")
      val ids = state.map { case (_, (eid, _)) => eid }
      assert(ids.max - ids.min < 50,
        s"stored ids must be the per-user maxima of one prefix: $ids")
      state.foreach { case (user, (eid, v)) =>
        assert(eid % 50 == user, s"event $eid landed on wrong user $user")
        assert(v == 1.0, s"value drifted for user $user: $v")
      }
    }
  }
}
