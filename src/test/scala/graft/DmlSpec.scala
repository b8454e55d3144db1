package graft

import graft.sources.{Catalog, Dml}

/** Row-level DML execution layer (S39) — the r9-advice hardening: the
  * partition scoping must come from the CATALOG, not an assumed column
  * name; unpartitioned tables take the full-rewrite path; assignments to
  * partition columns are rejected (dynamic overwrite would silently wipe
  * destination partitions).
  */
class DmlSpec extends SparkSpec {

  private lazy val db = Catalog.register(spark, sfTiny)

  private def freshLoc(tag: String): String = {
    val f = java.nio.file.Files
      .createTempDirectory(s"graft_dmlspec_$tag").toFile
    f.deleteOnExit()
    f.getAbsolutePath
  }

  test("UPDATE/DELETE scope partitions resolved from the catalog, " +
      "whatever the partition column is named") {
    // partitioned on `grp` — a name nothing in Dml may assume
    spark.sql(s"DROP TABLE IF EXISTS $db.t_dml_grp")
    spark.sql(
      s"""CREATE TABLE $db.t_dml_grp USING parquet PARTITIONED BY (grp)
         |LOCATION '${freshLoc("grp")}' AS
         |SELECT n_nationkey AS k, CAST(n_nationkey * 10 AS BIGINT) AS v,
         |  n_name AS name, r_name AS grp
         |FROM $db.nation JOIN $db.region ON n_regionkey = r_regionkey
         |""".stripMargin)
    Dml.exec(spark, s"UPDATE $db.t_dml_grp SET v = 0 WHERE k % 2 = 0")
    val t = spark.table(s"$db.t_dml_grp")
    assert(t.filter("k % 2 = 0 AND v <> 0").isEmpty)
    assert(t.filter("k % 2 = 1 AND v <> k * 10").isEmpty)
    // delete that empties whole partitions on the renamed column
    Dml.exec(spark, s"DELETE FROM $db.t_dml_grp WHERE grp = 'ASIA'")
    val t2 = spark.table(s"$db.t_dml_grp")
    assert(t2.filter("grp = 'ASIA'").isEmpty)
    assert(t2.filter("grp <> 'ASIA'").count() > 0)
  }

  test("UPDATE/DELETE on an UNPARTITIONED table take the full-rewrite " +
      "path") {
    spark.sql(s"DROP TABLE IF EXISTS $db.t_dml_flat")
    spark.sql(
      s"""CREATE TABLE $db.t_dml_flat USING parquet
         |LOCATION '${freshLoc("flat")}' AS
         |SELECT n_nationkey AS k, CAST(n_nationkey AS BIGINT) AS v
         |FROM $db.nation""".stripMargin)
    Dml.exec(spark, s"UPDATE $db.t_dml_flat SET v = -1 WHERE k < 5")
    assert(spark.table(s"$db.t_dml_flat")
      .filter("k < 5 AND v <> -1").isEmpty)
    assert(spark.table(s"$db.t_dml_flat")
      .filter("k >= 5 AND v <> k").isEmpty)
    Dml.exec(spark, s"DELETE FROM $db.t_dml_flat WHERE v = -1")
    assert(spark.table(s"$db.t_dml_flat").count() == 20)
  }

  test("DELETE keeps rows whose condition evaluates to NULL " +
      "(three-valued logic: only TRUE deletes)") {
    spark.sql(s"DROP TABLE IF EXISTS $db.t_dml_null")
    spark.sql(
      s"""CREATE TABLE $db.t_dml_null USING parquet
         |LOCATION '${freshLoc("null")}' AS
         |SELECT n_nationkey AS k,
         |  CASE WHEN n_nationkey < 10 THEN CAST(NULL AS BIGINT)
         |    ELSE CAST(n_nationkey AS BIGINT) END AS v
         |FROM $db.nation""".stripMargin)
    // `v > 14` is NULL for the 10 NULL-v rows — SQL DELETE must keep them
    Dml.exec(spark, s"DELETE FROM $db.t_dml_null WHERE v > 14")
    val t = spark.table(s"$db.t_dml_null")
    assert(t.filter("v IS NULL").count() == 10,
      "NULL-condition rows were deleted (NOT(cond) three-valued bug)")
    assert(t.filter("v > 14").isEmpty)
    assert(t.count() == 15) // 10 NULL + k in 10..14
  }

  test("UPDATE assigning a partition column is REJECTED, and the table " +
      "is untouched") {
    spark.sql(s"DROP TABLE IF EXISTS $db.t_dml_reject")
    spark.sql(
      s"""CREATE TABLE $db.t_dml_reject USING parquet PARTITIONED BY (grp)
         |LOCATION '${freshLoc("reject")}' AS
         |SELECT n_nationkey AS k, n_name AS name, r_name AS grp
         |FROM $db.nation JOIN $db.region ON n_regionkey = r_regionkey
         |""".stripMargin)
    val before = spark.table(s"$db.t_dml_reject")
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val e = intercept[IllegalArgumentException] {
      Dml.exec(spark,
        s"UPDATE $db.t_dml_reject SET grp = 'AMERICA' WHERE grp = 'ASIA'")
    }
    assert(e.getMessage.contains("partition column"))
    val after = spark.table(s"$db.t_dml_reject")
      .groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after == before, "rejected statement mutated the table")
  }
}
