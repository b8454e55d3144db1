package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Similarity search + vector-column operators over `embeddings`
  * (SURVEY.md §2.8 rows L3/L5 and §2.3 row J6): brute-force cosine top-k,
  * a sign-LSH bucketed variant, an IVF (coarse-quantizer) variant, and
  * cosine near-dedup.
  *
  * Cosine determinism (the reason every number here hash-matches DuckDB):
  * dot products and squared norms are computed as exact BIGINT sums of
  * floor(x*y*1e14) — float→double casts are exact, the double multiply and
  * floor are single correctly-rounded IEEE ops, and integer summation is
  * order-independent, so both engines produce the same integer no matter
  * how partitions combine. The final cosine is two exact int→double casts,
  * one sqrt and one divide — again correctly-rounded and engine-identical.
  * (A plain SUM(double) would be partition-order-dependent; `zip_with` +
  * `aggregate` keeps the whole thing inside WholeStageCodegen, no UDF.)
  *
  * Scale notes (100 TB): brute-force kNN broadcasts the (small) query set
  * and scans candidates once — linear, shuffle-free except the final top-k.
  * The LSH and IVF variants are the documented scale path: candidates come
  * from an equi-join on a bucket key, so cost is bucket-occupancy-bounded
  * exactly like the NearDup banding. IVF centroid assignment is a
  * broadcast-join argmax (nlist centroids always fit in memory).
  */
object Embeddings {

  /** Exact BIGINT dot of two vector columns at 1e14 scale: the native
    * codegen'd expression (graft.functions.VectorExprs.DotScaled). The
    * equivalent HOF formulation — aggregate(zip_with(a, b, (x,y) =>
    * floor(x*y*1e14)::long), 0L, _+_) — computes the identical value but
    * evaluates interpreted per element; VectorExprsSpec pins the
    * equivalence.
    */
  private def dotS(a: Column, b: Column): Column =
    graft.functions.VectorExprs.dotScaled(a, b)

  private def sqlDotS(a: String, b: String): String =
    s"CAST(list_sum([CAST(floor(CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) * 1e14) AS BIGINT) for i in range(1, 65)]) AS BIGINT)"

  /** cosine from scaled dot + scaled squared norms (all exact ints). */
  private def cosine(dot: Column, na: Column, nb: Column): Column =
    dot.cast("double") / sqrt(na.cast("double") * nb.cast("double"))

  /** vec_id, embedding, norm_s (exact scaled squared norm). */
  private def withNorm(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"), col("embedding"),
        dotS(col("embedding"), col("embedding")).as("norm_s"))

  private val sqlWithNorm: String =
    s"""n AS (SELECT vec_id, label, embedding,
       |  ${sqlDotS("embedding", "embedding")} AS norm_s FROM embeddings)""".stripMargin

  /** array_ops (L5) — vector columns as first-class citizens: per-label
    * count, mean L2 norm, mean first component, positive-head counts, max
    * absolute component. Means use exact integer sums (norm at 1e7 after
    * sqrt-scaling, components at 1e7) so group combine order is irrelevant.
    */
  def arrayOps(spark: SparkSession, dir: String): DataFrame = {
    val e = withNorm(spark, dir)
    e.select(
        col("label").cast("long").as("label"),
        floor(sqrt(col("norm_s").cast("double") / lit(1e14)) * lit(1e7))
          .cast("long").as("norm7"),
        floor(element_at(col("embedding"), 1).cast("double") * lit(1e7))
          .cast("long").as("c0_7"),
        when(array_max(slice(col("embedding"), 1, 8)) > 0f, lit(1L))
          .otherwise(lit(0L)).as("pos_head"),
        array_max(transform(col("embedding"), x => abs(x)))
          .cast("double").as("max_abs"))
      .groupBy(col("label"))
      .agg(
        count(lit(1)).as("n_vecs"),
        (sum(col("norm7")).cast("double") / lit(1e7) / count(lit(1)))
          .as("avg_norm"),
        (sum(col("c0_7")).cast("double") / lit(1e7) / count(lit(1)))
          .as("avg_c0"),
        sum(col("pos_head")).as("n_pos_head"),
        max(col("max_abs")).as("max_abs_comp"))
      .orderBy(col("label"))
  }

  val arrayOpsSql: String =
    s"""WITH $sqlWithNorm,
       |f AS (SELECT CAST(label AS BIGINT) AS label,
       |  CAST(floor(sqrt(CAST(norm_s AS DOUBLE) / 1e14) * 1e7) AS BIGINT) AS norm7,
       |  CAST(floor(CAST(embedding[1] AS DOUBLE) * 1e7) AS BIGINT) AS c0_7,
       |  CASE WHEN list_max(embedding[1:8]) > 0 THEN 1 ELSE 0 END AS pos_head,
       |  CAST(list_max([abs(CAST(x AS DOUBLE)) for x in embedding]) AS DOUBLE) AS max_abs
       |  FROM n)
       |SELECT label, count(*) AS n_vecs,
       |  CAST(SUM(norm7) AS DOUBLE) / 1e7 / count(*) AS avg_norm,
       |  CAST(SUM(c0_7) AS DOUBLE) / 1e7 / count(*) AS avg_c0,
       |  CAST(SUM(pos_head) AS BIGINT) AS n_pos_head,
       |  max(max_abs) AS max_abs_comp
       |FROM f GROUP BY label ORDER BY label""".stripMargin

  /** embedding_knn (L3/J6) — brute-force cosine top-5 for query vectors
    * (vec_id < 8) against the full collection. The query side is broadcast;
    * candidates stream through one scan; per-query top-k is a tiny window.
    */
  def embeddingKnn(spark: SparkSession, dir: String): DataFrame = {
    val n = withNorm(spark, dir)
    val q = n.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("norm_s").as("q_norm"))
    val pairs = n.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("dot_s", dotS(col("q_emb"), col("embedding")))
      .withColumn("cosine",
        cosine(col("dot_s"), col("q_norm"), col("norm_s")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    pairs
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor"),
        col("cosine"))
      .orderBy(col("q_id"), col("rank"))
  }

  val embeddingKnnSql: String =
    s"""WITH $sqlWithNorm,
       |p AS (SELECT q.vec_id AS q_id, c.vec_id AS neighbor,
       |    ${sqlDotS("q.embedding", "c.embedding")} AS dot_s,
       |    q.norm_s AS qn, c.norm_s AS cn
       |  FROM n q JOIN n c ON c.vec_id != q.vec_id
       |  WHERE q.vec_id < 8),
       |r AS (SELECT q_id, neighbor,
       |    CAST(dot_s AS DOUBLE) / sqrt(CAST(qn AS DOUBLE) * CAST(cn AS DOUBLE)) AS cosine,
       |    row_number() OVER (PARTITION BY q_id
       |      ORDER BY CAST(dot_s AS DOUBLE) / sqrt(CAST(qn AS DOUBLE) * CAST(cn AS DOUBLE)) DESC,
       |               neighbor) AS rank
       |  FROM p)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, neighbor, cosine
       |FROM r WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  /** Sign-LSH bucket code from `bits` evenly spaced dimensions: bit k set
    * iff embedding[1 + k*spacing] >= 0. Random-hyperplane LSH with axis-
    * aligned planes — deterministic, engine-portable, and a real ANN
    * recall/speed trade.
    */
  private def lshCode(e: Column, bits: Int, spacing: Int): Column =
    (0 until bits).map(k =>
      when(element_at(e, 1 + k * spacing) >= 0f, lit(1L << k))
        .otherwise(lit(0L))).reduce(_ + _)

  private def sqlLshCode(e: String, bits: Int, spacing: Int): String =
    (0 until bits).map(k =>
      s"(CASE WHEN $e[${1 + k * spacing}] >= 0 THEN ${1L << k} ELSE 0 END)")
      .mkString(" + ")

  /** embedding_knn_lsh — ANN top-3: candidates restricted to the query's
    * sign-LSH bucket (4 bits over dims 1/17/33/49 → 16 buckets). The
    * bucket equi-join replaces the full cross product; recall is partial
    * by design (that is the ANN trade; the exact twin is embedding_knn).
    */
  def embeddingKnnLsh(spark: SparkSession, dir: String): DataFrame = {
    val n = withNorm(spark, dir)
      .withColumn("bucket", lshCode(col("embedding"), 4, 16))
    val q = n.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("norm_s").as("q_norm"), col("bucket"))
    val pairs = n.join(broadcast(q), Seq("bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cosine",
        cosine(dotS(col("q_emb"), col("embedding")),
          col("q_norm"), col("norm_s")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    pairs
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor"),
        col("cosine"), col("bucket"))
      .orderBy(col("q_id"), col("rank"))
  }

  val embeddingKnnLshSql: String =
    s"""WITH $sqlWithNorm,
       |nb AS (SELECT *, ${sqlLshCode("embedding", 4, 16)} AS bucket FROM n),
       |p AS (SELECT q.vec_id AS q_id, c.vec_id AS neighbor, q.bucket,
       |    CAST(${sqlDotS("q.embedding", "c.embedding")} AS DOUBLE)
       |      / sqrt(CAST(q.norm_s AS DOUBLE) * CAST(c.norm_s AS DOUBLE)) AS cosine
       |  FROM nb q JOIN nb c ON c.bucket = q.bucket AND c.vec_id != q.vec_id
       |  WHERE q.vec_id < 8),
       |r AS (SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY cosine DESC, neighbor) AS rank FROM p)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, neighbor, cosine, bucket
       |FROM r WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin

  /** embedding_ivf_knn — IVF-flat ANN: the first 16 vectors act as the
    * coarse quantizer (deterministic "trained" centroids); every vector is
    * assigned to its max-cosine centroid (broadcast-join argmax), and each
    * query (vec_id < 8) searches only its own cell. nprobe=1, top-3.
    */
  def embeddingIvfKnn(spark: SparkSession, dir: String): DataFrame = {
    val n = withNorm(spark, dir)
    val cents = n.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cent_id"), col("embedding").as("c_emb"),
        col("norm_s").as("c_norm"))
    val wAssign = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"))
      .orderBy(col("c_cos").desc, col("cent_id"))
    val assigned = n.crossJoin(broadcast(cents))
      .withColumn("c_cos",
        cosine(dotS(col("embedding"), col("c_emb")),
          col("norm_s"), col("c_norm")))
      .withColumn("arn", row_number().over(wAssign))
      .filter(col("arn") === 1)
      .select(col("vec_id"), col("embedding"), col("norm_s"),
        col("cent_id").as("cell"))
    val q = assigned.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("norm_s").as("q_norm"), col("cell"))
    val wTop = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    assigned.join(broadcast(q), Seq("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cosine",
        cosine(dotS(col("q_emb"), col("embedding")),
          col("q_norm"), col("norm_s")))
      .withColumn("rank", row_number().over(wTop).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("q_id"), col("rank"), col("vec_id").as("neighbor"),
        col("cosine"), col("cell"))
      .orderBy(col("q_id"), col("rank"))
  }

  val embeddingIvfKnnSql: String =
    s"""WITH $sqlWithNorm,
       |cents AS (SELECT vec_id AS cent_id, embedding AS c_emb, norm_s AS c_norm
       |  FROM n WHERE vec_id < 16),
       |assign0 AS (SELECT n.vec_id, n.embedding, n.norm_s, cents.cent_id,
       |    CAST(${sqlDotS("n.embedding", "c_emb")} AS DOUBLE)
       |      / sqrt(CAST(n.norm_s AS DOUBLE) * CAST(c_norm AS DOUBLE)) AS c_cos
       |  FROM n CROSS JOIN cents),
       |assigned AS (SELECT vec_id, embedding, norm_s, cent_id AS cell
       |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
       |          ORDER BY c_cos DESC, cent_id) AS arn FROM assign0)
       |  WHERE arn = 1),
       |p AS (SELECT q.vec_id AS q_id, c.vec_id AS neighbor, q.cell,
       |    CAST(${sqlDotS("q.embedding", "c.embedding")} AS DOUBLE)
       |      / sqrt(CAST(q.norm_s AS DOUBLE) * CAST(c.norm_s AS DOUBLE)) AS cosine
       |  FROM assigned q JOIN assigned c ON c.cell = q.cell AND c.vec_id != q.vec_id
       |  WHERE q.vec_id < 8),
       |r AS (SELECT *, row_number() OVER (PARTITION BY q_id
       |    ORDER BY cosine DESC, neighbor) AS rank FROM p)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, neighbor, cosine, cell
       |FROM r WHERE rank <= 3 ORDER BY q_id, rank""".stripMargin

  /** embedding_near_dedup — cosine near-duplicate pairs via a finer 8-bit
    * sign-LSH blocking (dims 1,9,…,57 → 256 buckets), verified at
    * cosine >= 0.4; the survivor rule (keep lowest vec_id) is emitted per
    * pair so the dedup decision itself is checked, not just the pair list.
    */
  def embeddingNearDedup(spark: SparkSession, dir: String): DataFrame = {
    val n = withNorm(spark, dir)
      .withColumn("bucket", lshCode(col("embedding"), 8, 8))
    val pairs = n.as("a")
      .join(n.as("b"),
        col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .withColumn("cosine",
        cosine(dotS(col("a.embedding"), col("b.embedding")),
          col("a.norm_s"), col("b.norm_s")))
      .filter(col("cosine") >= 0.4)
    pairs.select(
        col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("cosine"), col("a.vec_id").as("keep_id"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  val embeddingNearDedupSql: String =
    s"""WITH $sqlWithNorm,
       |nb AS (SELECT *, ${sqlLshCode("embedding", 8, 8)} AS bucket FROM n),
       |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |    CAST(${sqlDotS("a.embedding", "b.embedding")} AS DOUBLE)
       |      / sqrt(CAST(a.norm_s AS DOUBLE) * CAST(b.norm_s AS DOUBLE)) AS cosine
       |  FROM nb a JOIN nb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
       |SELECT vec_a, vec_b, cosine, vec_a AS keep_id
       |FROM p WHERE cosine >= 0.4 ORDER BY vec_a, vec_b""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "array_ops" -> (arrayOps _),
    "embedding_knn" -> (embeddingKnn _),
    "embedding_knn_lsh" -> (embeddingKnnLsh _),
    "embedding_ivf_knn" -> (embeddingIvfKnn _),
    "embedding_near_dedup" -> (embeddingNearDedup _))

  def oracle: Map[String, String] = Map(
    "array_ops" -> arrayOpsSql,
    "embedding_knn" -> embeddingKnnSql,
    "embedding_knn_lsh" -> embeddingKnnLshSql,
    "embedding_ivf_knn" -> embeddingIvfKnnSql,
    "embedding_near_dedup" -> embeddingNearDedupSql)
}
