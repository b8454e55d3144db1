package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Hybrid retrieval (SURVEY.md §2.8 row L29): the RAG-serving primitive
  * that fuses a lexical (keyword / inverted-index) ranking with a dense
  * (embedding cosine) ranking via Reciprocal Rank Fusion — the standard
  * production shape (sparse BM25-class leg + ANN leg + RRF) because each
  * leg surfaces matches the other is blind to: lexical hits for rare
  * exact terms the embedding smooths over, semantic hits for paraphrases
  * that share no tokens.
  *
  * Determinism: RRF is computed ENTIRELY in integers — each leg
  * contributes floor(1e6 / (60 + rank)) with the classic k=60 damping,
  * ranks come from total orders (score DESC, doc_id ASC), and the fused
  * score is a small-int sum. No transcendental, no float accumulation;
  * the DuckDB twin is arithmetic-identical (`//` integer division).
  *
  * Scale (100 TB): each leg is its own already-scale-shaped operator —
  * the keyword leg broadcasts the tiny (q_id, term) table and joins it
  * BEFORE aggregation (the shuffle carries only query-term hits, the
  * L26 inverted-index idiom), the vector leg broadcasts the query
  * vectors and scans candidates once (the L3 brute-force shape; swap in
  * the IVF/PQ legs for a billion-vector corpus — same fusion). Both
  * legs prune to their top-20 on the native bounded-heap TopK plan
  * (map-side heap, no full sort), so the fusion join sees ≤ 20·|Q| rows
  * per leg — driver-independent and constant in corpus size. The legs'
  * candidate lists full-outer-join on (q_id, doc_id): docs WITHOUT an
  * embedding row (at sf0.1 only 2000 of 5000 docs carry vectors — the
  * common partially-embedded-corpus case) can still surface through the
  * lexical leg, and vector-only matches through the dense leg.
  */
object Retrieval {

  /** (q_id, term) query plan: three hybrid queries; the dense leg of
    * query q uses embedding vec_id = q.
    */
  private val queryTerms: Seq[(Long, String)] = Seq(
    0L -> "join", 0L -> "hash",
    1L -> "scan", 1L -> "filter",
    2L -> "sort", 2L -> "merge")
  private val sqlQueryTerms: String =
    queryTerms.map { case (q, t) => s"($q, '$t')" }.mkString(", ")

  private val LEG_K = 20 // per-leg candidate depth
  private val OUT_K = 10 // fused results per query
  private val RRF_K = 60 // classic RRF damping constant

  def hybridSearch(spark: SparkSession, dir: String): DataFrame = {
    val s = spark
    import s.implicits._
    val terms = queryTerms.toDF("q_id", "tok")

    // Lexical leg: tokenize -> broadcast-join query terms -> per-(q, doc)
    // hit counts -> top-20 per query on the bounded heap. The query doc
    // itself (doc_id = q_id) is excluded on both legs.
    val kwHits = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(split(Docs.norm(col("text")), " ")).as("tok"))
      .join(broadcast(terms), Seq("tok"))
      .filter(col("doc_id") =!= col("q_id"))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_hits"))
    val kwTop = graft.plans.TopK.topKPerGroup(kwHits, Seq("q_id"),
        Seq(("n_hits", true), ("doc_id", false)), LEG_K)
      .select(col("q_id"), col("doc_id"), col("rn").as("kw_rank"))

    // Dense leg: broadcast the three query vectors, exact-i64 cosine over
    // the collection, top-20 per query on the same heap.
    val n = Embeddings.withNorm(spark, dir)
    val q = n.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
        col("norm_s").as("q_norm"))
    val vecScored = n.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cosine",
        Embeddings.cosine(Embeddings.dotS(col("q_emb"), col("embedding")),
          col("q_norm"), col("norm_s")))
      .select(col("q_id"), col("vec_id"), col("cosine"))
    val vecTop = graft.plans.TopK.topKPerGroup(vecScored, Seq("q_id"),
        Seq(("cosine", true), ("vec_id", false)), LEG_K)
      .select(col("q_id"), col("vec_id").as("doc_id"),
        col("rn").as("vec_rank"))

    // RRF fusion over the union of both candidate lists. A leg that did
    // not surface the doc contributes rank 0 -> score 0 (coalesce), and
    // the reported per-leg ranks use the same 0 = "not in this leg's
    // top-20" convention.
    val fused = kwTop.join(vecTop, Seq("q_id", "doc_id"), "full_outer")
      .select(col("q_id"), col("doc_id"),
        coalesce(col("kw_rank"), lit(0L)).as("kw_rank"),
        coalesce(col("vec_rank"), lit(0L)).as("vec_rank"))
      .withColumn("rrf_score",
        when(col("kw_rank") > 0,
          expr(s"1000000 div (${RRF_K} + kw_rank)")).otherwise(lit(0L)) +
        when(col("vec_rank") > 0,
          expr(s"1000000 div (${RRF_K} + vec_rank)")).otherwise(lit(0L)))
    graft.plans.TopK.topKPerGroup(fused, Seq("q_id"),
        Seq(("rrf_score", true), ("doc_id", false)), OUT_K)
      .select(col("q_id"), col("rn").as("rank"), col("doc_id"),
        col("rrf_score"), col("kw_rank"), col("vec_rank"))
      .orderBy(col("q_id"), col("rank"))
  }

  val hybridSearchSql: String =
    s"""WITH ${Embeddings.sqlWithNorm},
       |qt(q_id, tok) AS (VALUES $sqlQueryTerms),
       |toks AS (
       |  SELECT doc_id, unnest(string_split(${Docs.sqlNorm}, ' ')) AS tok
       |  FROM documents),
       |kw AS (
       |  SELECT t.doc_id, qt.q_id, COUNT(*) AS n_hits
       |  FROM toks t JOIN qt ON t.tok = qt.tok
       |  WHERE t.doc_id != qt.q_id
       |  GROUP BY t.doc_id, qt.q_id),
       |kwr AS (
       |  SELECT q_id, doc_id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY n_hits DESC, doc_id) AS kw_rank
       |  FROM kw),
       |kwtop AS (SELECT * FROM kwr WHERE kw_rank <= $LEG_K),
       |vs AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS doc_id,
       |    CAST(${Embeddings.sqlDotS("q.embedding", "c.embedding")} AS DOUBLE)
       |      / sqrt(CAST(q.norm_s AS DOUBLE) * CAST(c.norm_s AS DOUBLE))
       |      AS cosine
       |  FROM n q JOIN n c ON c.vec_id != q.vec_id
       |  WHERE q.vec_id < 3),
       |vr AS (
       |  SELECT q_id, doc_id, row_number() OVER (PARTITION BY q_id
       |      ORDER BY cosine DESC, doc_id) AS vec_rank
       |  FROM vs),
       |vtop AS (SELECT * FROM vr WHERE vec_rank <= $LEG_K),
       |fused AS (
       |  SELECT COALESCE(k.q_id, v.q_id) AS q_id,
       |    COALESCE(k.doc_id, v.doc_id) AS doc_id,
       |    COALESCE(k.kw_rank, 0) AS kw_rank,
       |    COALESCE(v.vec_rank, 0) AS vec_rank
       |  FROM kwtop k FULL JOIN vtop v
       |    ON k.q_id = v.q_id AND k.doc_id = v.doc_id),
       |scored AS (
       |  SELECT q_id, doc_id, kw_rank, vec_rank,
       |    (CASE WHEN kw_rank > 0 THEN 1000000 // ($RRF_K + kw_rank)
       |          ELSE 0 END) +
       |    (CASE WHEN vec_rank > 0 THEN 1000000 // ($RRF_K + vec_rank)
       |          ELSE 0 END) AS rrf_score
       |  FROM fused),
       |ranked AS (
       |  SELECT q_id, doc_id, rrf_score, kw_rank, vec_rank,
       |    row_number() OVER (PARTITION BY q_id
       |      ORDER BY rrf_score DESC, doc_id) AS rank
       |  FROM scored)
       |SELECT q_id, CAST(rank AS BIGINT) AS rank, doc_id,
       |  CAST(rrf_score AS BIGINT) AS rrf_score,
       |  CAST(kw_rank AS BIGINT) AS kw_rank,
       |  CAST(vec_rank AS BIGINT) AS vec_rank
       |FROM ranked WHERE rank <= $OUT_K ORDER BY q_id, rank""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "hybrid_search" -> (hybridSearch _))

  def oracle: Map[String, String] = Map(
    "hybrid_search" -> hybridSearchSql)
}
