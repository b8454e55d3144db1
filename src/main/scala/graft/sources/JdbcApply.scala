package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.{DataFrame, Row}

/** Relational (JDBC) sink for the CDC apply path (SURVEY.md §2.1 row S5 /
  * §2.9 row ST6): applies a COLLAPSED micro-batch — one row per key, op ∈
  * {upsert, delete}, exactly what Streams.applyLog emits — to a keyed
  * table with per-partition batched statements. This is the real
  * MySQL-sink shape of the CDC pipeline; SinkSpec exercises it against
  * embedded Derby (the only SQL engine baked into the Spark jars), and the
  * statements are deliberately dialect-free so the same code targets
  * MySQL/Postgres by swapping the URL.
  *
  * Why DELETE-then-INSERT per upserted key rather than vendor MERGE / ON
  * DUPLICATE KEY UPDATE: identical observable state for full-image CDC
  * rows, portable across every JDBC dialect, and batchable. The
  * one-row-per-key input contract makes statement order within a batch
  * irrelevant — each flush runs the DELETE batch, then the INSERT batch,
  * and no key appears twice — so executeBatch round trips stay maximal.
  *
  * Scale: foreachPartition opens one connection per partition and ships
  * `batchSize` statements per round trip; work per micro-batch is
  * proportional to the BATCH, never the table, and partitions write in
  * parallel exactly like df.write.jdbc's INSERT path. Note the sink table
  * is live state, not a log: a delete physically removes the row, so a
  * late duplicate of a deleted key would resurrect it — retention of
  * tombstones (the parquet-state sink's choice) is traded for the
  * relational table a downstream application actually reads.
  */
object JdbcApply {

  /** Apply a collapsed change batch with columns
    * (user_id, ts, event_id, value, op) to `table`, which must exist with
    * primary/unique key user_id.
    */
  def upsertDelete(batch: DataFrame, url: String, table: String,
      batchSize: Int = 500): Unit = {
    val (u, t, bs) = (url, table, batchSize) // serializable closure locals
    batch.select("user_id", "ts", "event_id", "value", "op")
      .foreachPartition { rows: Iterator[Row] =>
        if (rows.nonEmpty) {
          val conn = DriverManager.getConnection(u)
          try {
            conn.setAutoCommit(false)
            val del = conn.prepareStatement(
              s"DELETE FROM $t WHERE user_id = ?")
            val ins = conn.prepareStatement(
              s"INSERT INTO $t (user_id, ts, event_id, value) VALUES (?, ?, ?, ?)")
            var n = 0
            def flush(): Unit = {
              del.executeBatch(); ins.executeBatch(); conn.commit()
            }
            rows.foreach { r =>
              val uid = r.getLong(0)
              del.setLong(1, uid)
              del.addBatch()
              if (r.getString(4) == "upsert") {
                ins.setLong(1, uid)
                ins.setTimestamp(2, r.getTimestamp(1))
                ins.setLong(3, r.getLong(2))
                ins.setDouble(4, r.getDouble(3))
                ins.addBatch()
              }
              n += 1
              if (n % bs == 0) flush()
            }
            flush()
          } finally conn.close()
        }
      }
  }
}
