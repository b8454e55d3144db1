package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Near-duplicate detection over `documents` (SURVEY.md §2.8 row L2 plus the
  * driver-mandated dedup family): MinHash+LSH, weighted SimHash with
  * multi-index blocking, and exact n-gram Jaccard over length-band
  * candidates. All three share the same determinism toolkit as Docs.scala —
  * md5-only hashing, integer/exact-double arithmetic, total ORDER BY.
  *
  * Scale notes (100 TB): each flavor is the standard linear-candidate
  * pattern — signatures are computed in one narrow scan (map-side, no
  * shuffle), candidate pairs come from an equi-join on a banded key (LSH
  * band, simhash block, length band), and only candidates pay the exact
  * verification cost. Nothing here is all-pairs; the quadratic blowup is
  * bounded by bucket occupancy, which banding keeps near-constant.
  */
object NearDup {

  private def norm(c: Column) = lower(trim(regexp_replace(c, "\\s+", " ")))
  private val sqlNorm = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"

  /** doc_near_dedup (L2) — MinHash (8 permutations via keyed md5) + LSH
    * (4 bands x 2 rows) candidate generation, then exact Jaccard over
    * distinct 3-token shingles; pairs with J >= 0.5 survive.
    *
    * Spark plan shape: signature scan (no shuffle) → tiny band self-join →
    * candidate pair list is broadcast back against the exploded shingle
    * table, so the expensive verify join never shuffles the big side twice.
    */
  def docNearDedup(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .withColumn("toks", split(norm(col("text")), " "))
      .withColumn("hs", array_distinct(Docs.shingles(col("toks"), 3)))
      .filter(size(col("toks")) >= 3)
    val mh = d.select(
      col("doc_id") +: size(col("hs")).as("n_sh") +:
        (0 until 8).map(i =>
          array_min(transform(col("hs"), s => md5(concat(lit(s"$i|"), s))))
            .as(s"h$i")): _*)
    val bands = mh.select(
        col("doc_id"),
        explode(array((0 until 4).map(b =>
          struct(lit(b).as("band_id"),
            md5(concat(col(s"h${2 * b}"), lit("|"), col(s"h${2 * b + 1}")))
              .as("bkey"))): _*)).as("bd"))
      .select(col("doc_id"), col("bd.band_id"), col("bd.bkey"))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band_id") === col("b.band_id") &&
          col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    val ex = d.select(col("doc_id"), explode(col("hs")).as("g"))
    val common = broadcast(cand)
      .join(ex.as("ea"), col("ea.doc_id") === col("da"))
      .join(ex.as("eb"),
        col("eb.doc_id") === col("db") && col("eb.g") === col("ea.g"))
      .groupBy(col("da"), col("db"))
      .agg(count(lit(1)).as("n_common"))
    val sizes = mh.select(col("doc_id"), col("n_sh"))
    common
      .join(sizes.as("na"), col("na.doc_id") === col("da"))
      .join(sizes.as("nb"), col("nb.doc_id") === col("db"))
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("na.n_sh") + col("nb.n_sh") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= 0.5)
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        col("n_common"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val docNearDedupSql: String =
    s"""WITH t AS (SELECT doc_id, string_split($sqlNorm, ' ') AS s FROM documents),
       |sh AS (SELECT doc_id,
       |  list_distinct([s[i] || ' ' || s[i+1] || ' ' || s[i+2]
       |                 for i in range(1, len(s)-1)]) AS hs
       |  FROM t WHERE len(s) >= 3),
       |mh AS (SELECT doc_id, len(hs) AS n_sh,
       |  ${(0 until 8).map(i =>
             s"list_min([md5('$i|' || x) for x in hs]) AS h$i").mkString(",\n|  ")}
       |  FROM sh),
       |bands AS (SELECT doc_id, band_id,
       |  CASE band_id ${(0 until 4).map(b =>
             s"WHEN $b THEN md5(h${2 * b} || '|' || h${2 * b + 1})").mkString(" ")}
       |  END AS bkey
       |  FROM mh CROSS JOIN (VALUES (0),(1),(2),(3)) b(band_id)),
       |cand AS (SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
       |  FROM bands a JOIN bands b
       |    ON a.band_id = b.band_id AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
       |ex AS (SELECT doc_id, unnest(hs) AS g FROM sh),
       |common AS (SELECT c.da, c.db, count(*) AS n_common
       |  FROM cand c
       |  JOIN ex ea ON ea.doc_id = c.da
       |  JOIN ex eb ON eb.doc_id = c.db AND eb.g = ea.g
       |  GROUP BY 1, 2)
       |SELECT da AS doc_a, db AS doc_b, n_common,
       |  CAST(n_common AS DOUBLE)
       |    / CAST(na.n_sh + nb.n_sh - n_common AS DOUBLE) AS jaccard
       |FROM common
       |JOIN mh na ON na.doc_id = da JOIN mh nb ON nb.doc_id = db
       |WHERE CAST(n_common AS DOUBLE)
       |    / CAST(na.n_sh + nb.n_sh - n_common AS DOUBLE) >= 0.5
       |ORDER BY doc_a, doc_b""".stripMargin

  /** 48-bit token hash from the first 12 hex digits of md5 — identical
    * integer in Spark and DuckDB (hex digit value via string position).
    */
  private val h48Spark: String =
    (1 to 12).map(j =>
      s"(instr('0123456789abcdef', substring(md5(tok), $j, 1)) - 1) * ${math.pow(16, 12 - j).toLong}L")
      .mkString(" + ")
  private val h48Duck: String =
    (1 to 12).map(j =>
      s"(strpos('0123456789abcdef', substring(md5(tok), $j, 1)) - 1) * ${math.pow(16, 12 - j).toLong}")
      .mkString(" + ")

  /** Per-doc weighted 48-bit SimHash signature: each distinct token votes
    * +tf/-tf on every bit of its 48-bit hash; signature bit b is 1 iff the
    * vote sum is positive. One scan + two hash aggregations — fully linear.
    */
  private def simhashSig(spark: SparkSession, dir: String): DataFrame = {
    val tf = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(norm(col("text")), " ")).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("h48", expr(h48Spark))
    tf.select(col("doc_id"), col("tf"), col("h48"),
        explode(sequence(lit(0), lit(47))).as("b"))
      .groupBy(col("doc_id"), col("b"))
      .agg(sum(when(expr("(h48 div CAST(pow(2, b) AS BIGINT)) % 2 = 1"),
        col("tf")).otherwise(-col("tf"))).as("s"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("s") > 0, expr("CAST(pow(2, b) AS BIGINT)"))
        .otherwise(lit(0L))).as("simhash"))
  }

  private val simhashSigSql: String =
    s"""toks AS (SELECT doc_id, unnest(string_split($sqlNorm, ' ')) AS tok
       |  FROM documents),
       |tf AS (SELECT doc_id, tok, count(*) AS tf FROM toks GROUP BY 1, 2),
       |h AS (SELECT doc_id, tf, $h48Duck AS h48 FROM tf),
       |bits AS (SELECT doc_id, b,
       |  SUM(CASE WHEN (h48 // CAST(pow(2, b) AS BIGINT)) % 2 = 1
       |           THEN tf ELSE -tf END) AS s
       |  FROM h CROSS JOIN (SELECT unnest(range(0, 48)) AS b) GROUP BY 1, 2),
       |sig AS (SELECT doc_id,
       |  SUM(CASE WHEN s > 0 THEN CAST(pow(2, b) AS BIGINT) ELSE 0 END) AS simhash
       |  FROM bits GROUP BY 1)""".stripMargin

  /** doc_simhash — the per-doc signature table itself (debuggable surface
    * for the pair query; also the thing a 100-TB pipeline would persist).
    */
  def docSimhash(spark: SparkSession, dir: String): DataFrame =
    simhashSig(spark, dir).orderBy(col("doc_id"))

  val docSimhashSql: String =
    s"""WITH $simhashSigSql
       |SELECT doc_id, simhash FROM sig ORDER BY doc_id""".stripMargin

  /** doc_simhash_dup — near-dup pairs at Hamming distance <= 3 via
    * multi-index blocking: 4 blocks of 12 bits; any pair within distance 3
    * must agree on at least one block (pigeonhole), so the equi-join on
    * (block_id, block_value) has perfect recall with ~uniform bucket sizes.
    */
  def docSimhashDup(spark: SparkSession, dir: String): DataFrame = {
    val sig = simhashSig(spark, dir)
    val blocks = sig.select(col("doc_id"), col("simhash"),
        explode(sequence(lit(0), lit(3))).as("q"))
      .withColumn("bv",
        expr("(simhash div CAST(pow(4096, q) AS BIGINT)) % 4096"))
    val cand = blocks.as("a")
      .join(blocks.as("b"),
        col("a.q") === col("b.q") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("a.simhash").as("sa"),
        col("b.doc_id").as("doc_b"), col("b.simhash").as("sb"))
      .distinct()
    cand
      .withColumn("hamming", expr("bit_count(sa ^ sb)").cast("long"))
      .filter(col("hamming") <= 3)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val docSimhashDupSql: String =
    s"""WITH $simhashSigSql,
       |blocks AS (SELECT doc_id, simhash, q,
       |  (simhash // CAST(pow(4096, q) AS BIGINT)) % 4096 AS bv
       |  FROM sig CROSS JOIN (VALUES (0),(1),(2),(3)) t(q)),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS sa,
       |                         b.doc_id AS doc_b, b.simhash AS sb
       |  FROM blocks a JOIN blocks b
       |    ON a.q = b.q AND a.bv = b.bv AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(sa, sb)) <= 3
       |ORDER BY doc_a, doc_b""".stripMargin

  /** doc_ngram_jaccard — exact character-4-gram Jaccard, with candidates
    * from a length-band LSH (bands of 8 chars; each doc posts to its band
    * and the next, so any pair within 8 chars of each other shares a band).
    * Verification intersects the two distinct-gram ARRAYS directly
    * (array_intersect, codegen'd) instead of a row-exploded join — the
    * candidate list stays the only quadratic-ish object, and the gram
    * arrays ride along a broadcast join.
    */
  def docNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables.documents(spark, dir)
      .select(col("doc_id"), norm(col("text")).as("nt"))
      .filter(length(col("nt")) >= 4)
      .select(
        col("doc_id"),
        (length(col("nt")).cast("long") / lit(8L)).cast("long").as("band"),
        array_distinct(transform(
          sequence(lit(1), length(col("nt")) - 3),
          i => col("nt").substr(i, lit(4)))).as("gs"))
    val posts = g.select(col("doc_id"), col("gs"),
      explode(array(col("band"), col("band") + 1)).as("pband"))
    val cand = posts.as("a")
      .join(posts.as("b"),
        col("a.pband") === col("b.pband") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(broadcast(g.as("ga")), col("ga.doc_id") === col("doc_a"))
      .join(broadcast(g.as("gb")), col("gb.doc_id") === col("doc_b"))
      .withColumn("n_common",
        size(array_intersect(col("ga.gs"), col("gb.gs"))).cast("long"))
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (size(col("ga.gs")) + size(col("gb.gs")) - col("n_common"))
            .cast("double"))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val docNgramJaccardSql: String =
    s"""WITH t AS (SELECT doc_id, $sqlNorm AS nt FROM documents),
       |g AS (SELECT doc_id, length(nt) // 8 AS band,
       |  list_distinct([substring(nt, i, 4) for i in range(1, length(nt)-2)]) AS gs
       |  FROM t WHERE length(nt) >= 4),
       |posts AS (SELECT doc_id, gs, unnest([band, band+1]) AS pband FROM g),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM posts a JOIN posts b
       |    ON a.pband = b.pband AND a.doc_id < b.doc_id),
       |j AS (SELECT doc_a, doc_b,
       |    CAST(len(list_intersect(ga.gs, gb.gs)) AS BIGINT) AS n_common,
       |    CAST(len(list_intersect(ga.gs, gb.gs)) AS DOUBLE)
       |      / CAST(len(ga.gs) + len(gb.gs) - len(list_intersect(ga.gs, gb.gs))
       |             AS DOUBLE) AS jaccard
       |  FROM cand JOIN g ga ON ga.doc_id = doc_a JOIN g gb ON gb.doc_id = doc_b)
       |SELECT doc_a, doc_b, n_common, jaccard FROM j
       |WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "doc_near_dedup" -> (docNearDedup _),
    "doc_simhash" -> (docSimhash _),
    "doc_simhash_dup" -> (docSimhashDup _),
    "doc_ngram_jaccard" -> (docNgramJaccard _))

  def oracle: Map[String, String] = Map(
    "doc_near_dedup" -> docNearDedupSql,
    "doc_simhash" -> docSimhashSql,
    "doc_simhash_dup" -> docSimhashDupSql,
    "doc_ngram_jaccard" -> docNgramJaccardSql)
}
