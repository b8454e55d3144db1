package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Training-data pipeline operators beyond the per-query dedup/scoring
  * families (SURVEY.md §2.8 rows L7-L10): within-document repetition
  * scoring, policy-pattern scrubbing (PII-shaped), deterministic stratified
  * sampling, and dedup-cluster resolution via distributed connected
  * components. Same determinism toolkit as Docs.scala — md5-only hashing,
  * exact integer counts, single correctly-rounded double divisions, total
  * ORDER BY.
  *
  * Scale notes (100 TB): repetition/scrub/sampling are scan → narrow
  * codegen'd transform → keyed agg (the canonical linear shapes).
  * Cluster resolution is Pregel-style min-label propagation: per iteration
  * one shuffle join of the label frame against the edge list — O(E) work
  * distributed across executors, the driver sees only a one-row
  * convergence count. Nothing collects to the driver at any size.
  */
object Pipeline {

  private def norm(c: Column) = lower(trim(regexp_replace(c, "\\s+", " ")))
  private val sqlNorm = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"

  /** doc_repetition (L7) — duplicate word-trigram fraction per document,
    * the Gopher/RefinedWeb-style repetition quality signal: a document
    * whose trigrams repeat is boilerplate or degenerate generation.
    * dup_frac is one correctly-rounded double division of exact counts.
    */
  def docRepetition(spark: SparkSession, dir: String): DataFrame = {
    val tri = Tables.documents(spark, dir)
      .withColumn("toks", split(norm(col("text")), " "))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), col("lang"), col("toks"),
        explode(sequence(lit(1), size(col("toks")) - 2)).as("i"))
      .select(col("doc_id"), col("lang"),
        concat_ws(" ", element_at(col("toks"), col("i")),
          element_at(col("toks"), col("i") + 1),
          element_at(col("toks"), col("i") + 2)).as("g"))
    tri.groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_tri"),
        countDistinct(col("g")).as("n_uniq"))
      .withColumn("dup_frac",
        (col("n_tri") - col("n_uniq")).cast("double") / col("n_tri"))
      .select(col("doc_id"), col("lang"), col("n_tri"), col("n_uniq"),
        col("dup_frac"))
      .orderBy(col("doc_id"))
  }

  val docRepetitionSql: String =
    s"""WITH t AS (SELECT doc_id, lang,
       |    string_split($sqlNorm, ' ') AS s FROM documents),
       |tri AS (SELECT doc_id, lang,
       |    unnest([s[i] || ' ' || s[i+1] || ' ' || s[i+2]
       |            for i in range(1, len(s)-1)]) AS g
       |  FROM t WHERE len(s) >= 3)
       |SELECT doc_id, lang, COUNT(*) AS n_tri,
       |  COUNT(DISTINCT g) AS n_uniq,
       |  CAST(COUNT(*) - COUNT(DISTINCT g) AS DOUBLE) / COUNT(*) AS dup_frac
       |FROM tri GROUP BY doc_id, lang ORDER BY doc_id""".stripMargin

  /** doc_pii_scrub (L8) — policy-pattern scrubbing: count and redact
    * email-, US-phone-, and keyword-shaped spans, then fingerprint the
    * redacted text. The corpus is synthetic word-salad, so the email/phone
    * counters exercise the zero path honestly while the keyword pattern
    * ('spark' as a stand-in for a real denylist) exercises nonzero counts
    * and a redaction that actually changes the fingerprint. Patterns stay
    * in the regex subset where Java regex (Spark) and RE2 (DuckDB) agree.
    */
  def docPiiScrub(spark: SparkSession, dir: String): DataFrame = {
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phone = "\\d{3}-\\d{3}-\\d{4}"
    val kw = "\\bspark\\b"
    val d = Tables.documents(spark, dir).withColumn("nt", norm(col("text")))
    d.select(col("lang"), col("doc_id"),
        regexp_count(col("nt"), lit(email)).cast("long").as("n_email"),
        regexp_count(col("nt"), lit(phone)).cast("long").as("n_phone"),
        regexp_count(col("nt"), lit(kw)).cast("long").as("n_kw"),
        md5(regexp_replace(regexp_replace(regexp_replace(col("nt"),
          email, "<EMAIL>"), phone, "<PHONE>"), kw, "<KW>")).as("red_h"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_kw") > 0, 1L).otherwise(0L)).as("docs_with_kw"),
        sum(col("n_kw")).as("total_kw"),
        sum(col("n_email")).as("total_email"),
        sum(col("n_phone")).as("total_phone"),
        min(col("red_h")).as("min_red_h"),
        max(col("red_h")).as("max_red_h"))
      .orderBy(col("lang"))
  }

  val docPiiScrubSql: String = {
    val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
    val phone = "\\d{3}-\\d{3}-\\d{4}"
    val kw = "\\bspark\\b"
    s"""WITH scrub AS (
       |  SELECT lang, doc_id,
       |    CAST(len(regexp_extract_all(nt, '$email')) AS BIGINT) AS n_email,
       |    CAST(len(regexp_extract_all(nt, '$phone')) AS BIGINT) AS n_phone,
       |    CAST(len(regexp_extract_all(nt, '$kw')) AS BIGINT) AS n_kw,
       |    md5(regexp_replace(regexp_replace(regexp_replace(nt,
       |      '$email', '<EMAIL>', 'g'), '$phone', '<PHONE>', 'g'),
       |      '$kw', '<KW>', 'g')) AS red_h
       |  FROM (SELECT lang, doc_id, $sqlNorm AS nt FROM documents))
       |SELECT lang, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN n_kw > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_kw,
       |  CAST(SUM(n_kw) AS BIGINT) AS total_kw,
       |  CAST(SUM(n_email) AS BIGINT) AS total_email,
       |  CAST(SUM(n_phone) AS BIGINT) AS total_phone,
       |  MIN(red_h) AS min_red_h, MAX(red_h) AS max_red_h
       |FROM scrub GROUP BY lang ORDER BY lang""".stripMargin
  }

  /** sample_stratified (L9) — deterministic hash sampling per language
    * stratum: a document is sampled iff the first 4 hex digits of
    * md5(doc_id) fall under '1999' (≈10%). Hash-threshold sampling is the
    * 100-TB idiom — no RNG state, no seed coordination across executors,
    * stable under retries and re-partitioning, and any engine computes the
    * same sample. Output proves rate and membership per stratum.
    */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val sampled = substring(md5(col("doc_id").cast("string")), 1, 4) < "1999"
    d.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(sampled, 1L).otherwise(0L)).as("n_sampled"),
        // membership checksum via XOR, not SUM: order-independent like a
        // sum but cannot overflow at any corpus size (a plain i64 id sum
        // wraps silently where DuckDB's HUGEINT->BIGINT cast would error)
        bit_xor(when(sampled, col("doc_id"))).as("sampled_id_xor"),
        min(when(sampled, col("doc_id"))).as("min_sampled_id"),
        max(when(sampled, col("doc_id"))).as("max_sampled_id"))
      .orderBy(col("lang"))
  }

  val sampleStratifiedSql: String =
    """WITH s AS (SELECT lang, doc_id,
      |    substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '1999' AS smp
      |  FROM documents)
      |SELECT lang, COUNT(*) AS n_total,
      |  CAST(SUM(CASE WHEN smp THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
      |  CAST(bit_xor(CASE WHEN smp THEN doc_id END) AS BIGINT) AS sampled_id_xor,
      |  MIN(CASE WHEN smp THEN doc_id END) AS min_sampled_id,
      |  MAX(CASE WHEN smp THEN doc_id END) AS max_sampled_id
      |FROM s GROUP BY lang ORDER BY lang""".stripMargin

  /** dedup_clusters (L10) — resolve near-dup PAIRS into CLUSTERS
    * (connected components), the step a real dedup pipeline needs between
    * pair detection and survivor election: A~B and B~C must collapse to
    * one cluster {A,B,C} even though (A,C) was never a candidate pair.
    *
    * Distributed min-label propagation WITH POINTER JUMPING: every node
    * starts labeled with its own id; each round a node adopts the
    * minimum of its own label, its neighbors' labels, AND its label's
    * label (label(label(v)) — the path-halving step). Plain neighbor
    * propagation needs diameter-many rounds (a 10k-long chain of
    * near-dups = 10k shuffles); the jump makes label chains halve each
    * round, so convergence is O(log diameter) — the large-star/
    * small-star bound. Each round is two shuffle joins over the label
    * frame — O(E + V) distributed work, the driver sees only a one-row
    * convergence count, and localCheckpoint pins each round's result so
    * lineage cannot grow with the iteration count. The fixpoint is the
    * same component minimum (both steps only ever lower a label toward
    * it), so the DuckDB recursive-reachability oracle is unchanged.
    *
    * Pairs come from the SimHash Hamming<=3 detector (doc_simhash_dup) —
    * the transitive-closure-worthy signal in this corpus.
    */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = NearDup.docSimhashDup(spark, dir)
      .select(col("doc_a"), col("doc_b"))
    connectedComponents(pairs)
      .groupBy(col("label").as("cluster"))
      .agg(count(lit(1)).as("n_members"),
        // XOR membership checksum — overflow-free at any scale (see
        // sample_stratified)
        bit_xor(col("id")).as("member_id_xor"),
        min(col("id")).as("min_member"),
        max(col("id")).as("max_member"))
      .orderBy(col("cluster"))
  }

  /** Reusable components engine: given undirected pairs (two long
    * columns), returns (id, label) with label = the component's minimum
    * member id. Exposed separately so any pair source (SimHash, MinHash,
    * embedding near-dup) can be resolved to clusters.
    */
  def connectedComponents(rawPairs: DataFrame): DataFrame = {
    val cols = rawPairs.columns
    val pairs = rawPairs
      .select(col(cols(0)).as("doc_a"), col(cols(1)).as("doc_b"))
      .localCheckpoint()
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    // seed with the FIRST propagation round for free: label(v) =
    // min(v, min neighbor) — every (node, neighbor) pair is already a row
    // of `edges`, so one aggregation replaces what would otherwise be the
    // loop's first join+checkpoint+count cycle (each cycle is 2 Spark
    // jobs; near-dup components are shallow, so one round is a real share)
    var labels = edges
      .groupBy(col("src"))
      .agg(least(min(col("dst")), col("src")).as("label"))
      .select(col("src").as("id"), col("label"))
      .localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      val prop = edges.join(labels, col("src") === col("id"))
        .groupBy(col("dst"))
        .agg(min(col("label")).as("nbr_min"))
      val next = labels.as("x")
        .join(prop, col("x.id") === col("dst"), "left")
        .withColumn("l1",
          least(col("x.label"), coalesce(col("nbr_min"), col("x.label"))))
        // pointer jump: also adopt label(label(v)) — label chains halve
        // every round, turning O(diameter) rounds into O(log diameter)
        .join(labels.as("y").select(col("id").as("yid"),
          col("label").as("ylabel")), col("l1") === col("yid"), "left")
        .withColumn("l2",
          least(col("l1"), coalesce(col("ylabel"), col("l1"))))
        .select(col("x.id").as("id"), col("l2").as("label"),
          (col("l2") < col("x.label")).as("chg"))
        .localCheckpoint()
      changed = next.filter(col("chg")).count()
      labels = next.select(col("id"), col("label"))
    }
    labels
  }

  val dedupClustersSql: String = {
    // the pairs CTE is doc_simhash_dup's SQL re-expressed as a WITH chain
    val pairsSql = NearDup.docSimhashDupSql
      .replace("ORDER BY doc_a, doc_b", "")
    s"""WITH RECURSIVE pairs AS ($pairsSql),
       |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |nodes AS (SELECT DISTINCT src AS id FROM edges),
       |reach(node, r) AS (
       |  SELECT id, id FROM nodes
       |  UNION
       |  SELECT e.dst, r.r FROM reach r JOIN edges e ON e.src = r.node),
       |lab AS (SELECT node, MIN(r) AS cluster FROM reach GROUP BY node)
       |SELECT cluster, COUNT(*) AS n_members,
       |  CAST(bit_xor(node) AS BIGINT) AS member_id_xor,
       |  MIN(node) AS min_member, MAX(node) AS max_member
       |FROM lab GROUP BY cluster ORDER BY cluster""".stripMargin
  }

  /** doc_chunk (L11) — split each document into fixed-size overlapping
    * token windows (16 tokens, stride 12 ⇒ 4-token overlap), the standard
    * pre-embedding/pre-training chunking step. Chunk starts are a
    * `sequence(1, n_tokens, stride)` posexplode; the chunk body is a
    * codegen'd `slice` + `concat_ws` — no higher-order lambda anywhere.
    * The tail chunk may be short (`n_tokens` < 16), never empty.
    *
    * Scale: explode grows rows ~n/stride per doc but stays map-side —
    * no shuffle at all until the final presentation ORDER BY; at 100 TB
    * chunking is a pure narrow map stage that pipelines into whatever
    * consumes the chunks.
    */
  def docChunk(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val C = 16 // chunk size (tokens)
    val S = 12 // stride (tokens)
    d.select(col("doc_id"), split(norm(col("text")), " ").as("toks"))
      .withColumn("n", size(col("toks")))
      .select(col("doc_id"), col("toks"), col("n"),
        posexplode(sequence(lit(1), col("n"), lit(S))))
      .select(
        col("doc_id"),
        col("pos").cast("long").as("chunk_idx"),
        col("col").cast("long").as("start_tok"),
        least(lit(C), col("n") - col("col") + 1).cast("long").as("n_tokens"),
        concat_ws(" ", slice(col("toks"), col("col"), lit(C))).as("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  val docChunkSql: String =
    s"""WITH toked AS (
       |  SELECT doc_id, string_split($sqlNorm, ' ') AS t FROM documents),
       |starts AS (
       |  SELECT doc_id, t, len(t) AS n,
       |    unnest(range(1, len(t) + 1, 12)) AS start_tok
       |  FROM toked)
       |SELECT doc_id,
       |  CAST((start_tok - 1) // 12 AS BIGINT) AS chunk_idx,
       |  CAST(start_tok AS BIGINT) AS start_tok,
       |  CAST(least(16, n - start_tok + 1) AS BIGINT) AS n_tokens,
       |  array_to_string(t[start_tok : least(start_tok + 15, n)], ' ')
       |    AS chunk_text
       |FROM starts ORDER BY doc_id, chunk_idx""".stripMargin

  /** doc_decontaminate (L12) — benchmark-overlap decontamination: remove
    * from the training corpus any document sharing an 8-token n-gram with
    * the held-out benchmark set (here the deterministic `doc_id % 50 = 0`
    * slice stands in for the benchmark suite). Grams are md5 of the
    * space-joined token window; docs under 8 tokens generate none.
    *
    * Scale: the benchmark side is ≪ corpus by construction (a benchmark
    * suite is KBs–MBs against a 100 TB corpus), so its distinct gram set
    * BROADCASTS and the corpus gram stream left-semi-joins against it
    * map-side — corpus grams never shuffle; the only exchange is the
    * distinct over contaminated doc_ids, bounded by the hit count. This is
    * the canonical at-scale decontamination plan (GPT-3 appendix C shape).
    */
  def docDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val toked = d.select(col("doc_id"), col("lang"),
        split(norm(col("text")), " ").as("toks"))
      .withColumn("n", size(col("toks")))
    def grams(df: DataFrame): DataFrame = df
      .filter(col("n") >= 8)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(1), col("n") - 7)).as("s"))
      .select(col("doc_id"),
        md5(concat_ws(" ", slice(col("toks"), col("s"), lit(8)))).as("g"))
    val benchGrams = grams(toked.filter(col("doc_id") % 50 === 0))
      .select(col("g")).distinct()
    val contaminated = grams(toked.filter(col("doc_id") % 50 =!= 0))
      .join(broadcast(benchGrams), Seq("g"), "left_semi")
      .select(col("doc_id")).distinct()
      .withColumn("hit", lit(1L))
    toked.filter(col("doc_id") % 50 =!= 0)
      .join(contaminated, Seq("doc_id"), "left_outer")
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(coalesce(col("hit"), lit(0L))).as("n_contaminated"),
        coalesce(sum(when(col("hit").isNotNull, col("doc_id"))), lit(0L))
          .as("contaminated_id_sum"))
      .withColumn("contam_rate",
        col("n_contaminated").cast("double") / col("n_docs").cast("double"))
      .orderBy(col("lang"))
  }

  val docDecontaminateSql: String =
    s"""WITH toked AS (
       |  SELECT doc_id, lang, string_split($sqlNorm, ' ') AS t
       |  FROM documents),
       |grams AS (
       |  SELECT doc_id, unnest(
       |    [md5(array_to_string(t[s : s + 7], ' '))
       |     for s in range(1, len(t) - 6)]) AS g
       |  FROM toked WHERE len(t) >= 8),
       |bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0),
       |contam AS (
       |  SELECT DISTINCT doc_id FROM grams
       |  WHERE doc_id % 50 <> 0 AND g IN (SELECT g FROM bench)),
       |corpus AS (SELECT doc_id, lang FROM toked WHERE doc_id % 50 <> 0)
       |SELECT lang, COUNT(*) AS n_docs,
       |  CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_contaminated,
       |  CAST(COALESCE(SUM(CASE WHEN c.doc_id IS NOT NULL
       |    THEN corpus.doc_id END), 0) AS BIGINT) AS contaminated_id_sum,
       |  CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE) AS contam_rate
       |FROM corpus LEFT JOIN contam c ON c.doc_id = corpus.doc_id
       |GROUP BY lang ORDER BY lang""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "doc_repetition" -> (docRepetition _),
    "doc_pii_scrub" -> (docPiiScrub _),
    "doc_chunk" -> (docChunk _),
    "doc_decontaminate" -> (docDecontaminate _),
    "sample_stratified" -> (sampleStratified _),
    "dedup_clusters" -> (dedupClusters _))

  def oracle: Map[String, String] = Map(
    "doc_repetition" -> docRepetitionSql,
    "doc_pii_scrub" -> docPiiScrubSql,
    "doc_chunk" -> docChunkSql,
    "doc_decontaminate" -> docDecontaminateSql,
    "sample_stratified" -> sampleStratifiedSql,
    "dedup_clusters" -> dedupClustersSql)
}
