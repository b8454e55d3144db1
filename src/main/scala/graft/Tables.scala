package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central table catalog over the driver-provided parquet star schema
  * (TESTDATA.md). One parquet file per table; `spark.read.parquet` gives the
  * vectorized columnar scan, and Catalyst pushes filters/projections into it.
  *
  * Resolved readers are cached per (session, dir, table): repeated queries
  * against the same catalog entry reuse one analyzed relation instead of
  * re-reading parquet footers and re-resolving the schema on every call —
  * the same role a metastore catalog plays on a real cluster. Logical plans
  * are immutable, so sharing the DataFrame across queries is safe; the
  * cache is LRU-bounded so it cannot pin dead sessions (see below).
  *
  * At 100 TB the only change is the path: a partitioned parquet/iceberg
  * layout (e.g. orders partitioned by month) makes the same calls
  * partition-pruned. Nothing downstream of this object assumes single-file
  * inputs.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Bounded LRU, not an unbounded strong-keyed map: cached DataFrames
  // strongly reference their SparkSession, so an unbounded cache would pin
  // every session ever seen (stopped test sessions, REPL restarts) for the
  // JVM lifetime. 256 entries covers many sessions × all tables while
  // letting old sessions age out and become collectible.
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[(SparkSession, String, String), DataFrame](
        64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(SparkSession, String, String), DataFrame])
          : Boolean = size() > 256
    })

  /** IMMUTABLE-INPUT assumption: the cache is never invalidated, so a
    * parquet file REWRITTEN under sfDir mid-session would serve the stale
    * cached relation (schema + footer). That is the bench/verify contract
    * (driver testdata never changes during a session); a catalog over
    * mutable paths would need an invalidate(dir) hook here — and the
    * widening memo below keys on the source stamp, so a regenerated file
    * lands fresh in a NEW process.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, sfDir, name),
      _ => spark.read.parquet(s"$sfDir/$name.parquet"))

  /** The WIDE catalog view: same table, served from the widened landing
    * (see [[widen]]). Decode-heavy operators — JSON parsing, shingle /
    * signature construction, edit distance — are compute-bound in their
    * FIRST map stage, and a single-row-group source file serializes that
    * stage onto one core; the wide view restores input-split parallelism
    * for exactly those plans. Scan-bound or many-job queries stay on the
    * raw view: for them the extra task-scheduling and shuffle-block fan-out
    * of a many-file scan costs more than the map stage saves (measured
    * both ways at sf0.1 — see SURVEY §8).
    */
  def loadWide(spark: SparkSession, sfDir: String, name: String): DataFrame =
    cache.computeIfAbsent((spark, sfDir, s"$name@wide"),
      _ => spark.read.parquet(widen(spark, s"$sfDir/$name.parquet")))

  // (path, srcStamp) → landed path; stamp in the KEY so a regenerated
  // source re-lands (same idiom as sources/Formats.prepared).
  private val widened =
    scala.collection.concurrent.TrieMap.empty[(String, String), String]

  /** Narrow-input widening. A parquet scan parallelizes across files and
    * row groups only — a SINGLE-row-group file (the driver testdata's
    * layout) serializes every map-side operator above it (JSON decode,
    * tokenization, MinHash signatures, vector math) onto one core, no
    * matter how many the session has; measured at sf0.1 that alone
    * is 2-3× on decode-heavy queries. A 100 TB table never looks like
    * this — ingest writes many files × many row groups, and the planner's
    * split math gives every core work — so single-FILE tables above a
    * broadcast-ish size threshold are re-landed ONCE per source stamp as
    * a many-file parquet copy under java.io.tmpdir (srcStamp + _SUCCESS
    * gating, the bucketed/ORC/CSV landing idiom), restoring the
    * parallelism the physical plans are designed for. Multi-file inputs —
    * every production layout — skip the copy entirely; tiny dims stay
    * raw (they are broadcast sides, one core is the right cost).
    * Row order changes (round-robin), which is safe because every query
    * follows the Det conventions: order-insensitive aggregates in exact
    * integer space + a total ORDER BY on the result.
    */
  private def widen(spark: SparkSession, path: String): String = {
    val f = new java.io.File(path)
    val n = sys.env.getOrElse("SPARK_GRAFT_WIDEN", "16").toInt
    if (!f.isFile || f.length < 256 * 1024 || n <= 1) return path
    val stamp = s"${f.length}_${f.lastModified}_w$n"
    widened.getOrElseUpdate((path, stamp), {
      val safe = path.replaceAll("[^A-Za-z0-9._-]", "_")
      val out = new java.io.File(
        sys.props("java.io.tmpdir"), s"graft_wide/${safe}_$stamp")
      publishOnce(out) { tmp =>
        spark.read.parquet(path).repartition(n)
          .write.mode("overwrite").parquet(tmp.getAbsolutePath)
      }
    })
  }

  /** Size+mtime stamp of a source file (or tree): the landing-cache key
    * every stamped landing uses — ONE implementation (this was four
    * copy-pasted walkers before round 8) so the semantics and their
    * caveats live in one place. Null-safe: `listFiles` returns null on an
    * I/O error or a dir racing away — treated as empty rather than NPE.
    * Caveat, shared by all users: a file REWRITTEN with identical size
    * within the mtime granularity serves stale state. Acceptable under the
    * immutable-testdata session contract (same trade as `load`'s cached
    * relations); a mutable deployment would swap in a content hash here.
    */
  private[graft] def srcStamp(src: java.io.File): String = {
    val (sz, mt) = sizeAndMtime(src)
    s"${sz}_$mt"
  }

  private def sizeAndMtime(f: java.io.File): (Long, Long) =
    if (f.isDirectory) {
      val cs = f.listFiles()
      if (cs == null) (0L, 0L)
      else cs.foldLeft((0L, 0L)) { case ((sz, mt), c) =>
        val (csz, cmt) = sizeAndMtime(c); (sz + csz, math.max(mt, cmt))
      }
    } else (f.length, f.lastModified)

  /** On-disk bytes of a source table (file or tree) — the cheap size
    * input for GATED broadcast hints: an operator that wants to force a
    * broadcast only while the side is provably small checks the compressed
    * source size (an over-broadcast at 3-5× parquet expansion is still
    * bounded) instead of asserting the hint unconditionally, because Spark
    * honors an explicit hint REGARDLESS of autoBroadcastJoinThreshold
    * (ADVICE r8: an unguarded hint on a fact-derived side is a driver OOM
    * at 100 TB, not a plan choice).
    */
  private[graft] def srcBytes(dir: String, table: String): Long =
    sizeAndMtime(new java.io.File(dir, table + ".parquet"))._1

  /** Publish-once landing protocol, shared by every stamped landing (wide
    * copies, bucketed/ORC/CSV/JSONL conversions, stored CDC states, the
    * near-dup base index): `build` writes into a process-unique temp dir,
    * a root `_SUCCESS` is stamped INSIDE the temp dir if the writer didn't
    * already create one, and ONE atomic rename publishes the completed
    * landing. Concurrent JVMs (test suite vs Verify) may race to build;
    * the rename loser deletes its copy and serves the winner's — no
    * process can ever observe a half-written or interleaved landing,
    * because nothing is ever written into the published path directly.
    * Returns the published path.
    */
  private[graft] def publishOnce(out: java.io.File)
      (build: java.io.File => Unit): String = {
    if (!new java.io.File(out, "_SUCCESS").exists()) {
      val tmp = new java.io.File(
        out.getParentFile, s"${out.getName}.tmp${System.nanoTime()}")
      build(tmp)
      val stamp = new java.io.File(tmp, "_SUCCESS")
      if (!stamp.exists()) stamp.createNewFile()
      if (!tmp.renameTo(out)) rmTree(tmp) // lost the race; winner's copy serves
    }
    out.getAbsolutePath
  }

  /** Land one frame as the i-th single-file segment of a replayable
    * topic directory: staged coalesce(1) write, the part file moved to
    * `seg-<i>.parquet`, and an ASCENDING pinned mtime —
    * FileStreamSource sorts its initial listing by modification time,
    * so segment order IS replay order. Shared by the r15 ordered-topic
    * landings (factored from two line-identical copies, r15 review).
    */
  private[graft] def landSegment(tmp: java.io.File,
      df: DataFrame, i: Int): Unit = {
    val stage = new java.io.File(tmp, s"_stage_$i")
    df.coalesce(1).write.parquet(stage.getAbsolutePath)
    val part = stage.listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val dst = new java.io.File(tmp, f"seg-$i%02d.parquet")
    java.nio.file.Files.move(part.toPath, dst.toPath)
    stage.listFiles().foreach(_.delete()); stage.delete()
    dst.setLastModified(1700000000000L + i * 2000L); ()
  }

  private[graft] def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) {
      val cs = f.listFiles()
      if (cs != null) cs.foreach(rmTree)
    }
    f.delete(): Unit
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** Upstream layouts of `events.ts` the catalog has actually seen: parquet
    * TIMESTAMP(NANOS) (reads as BIGINT nanos under the legacy `nanosAsLong`
    * conf), TIMESTAMP(MICROS/MILLIS) without UTC adjustment (reads as
    * TIMESTAMP_NTZ), adjusted-to-UTC (reads as TIMESTAMP), or a plain
    * BIGINT epoch-nanos column. A CDC catalog's first job is surviving
    * upstream type drift, so the ingest BRANCHES ON THE LOADED SCHEMA
    * instead of pinning one physical type:
    *   - LongType            → nanos → `timestamp_micros(ts div 1000)`
    *                           (floor division — DuckDB's epoch_us truncation,
    *                           so oracle twins agree to the microsecond)
    *   - TIMESTAMP_NTZ       → reinterpret under the pinned UTC session
    *                           (cast NTZ→TIMESTAMP is wall-clock-preserving,
    *                           identical micros under UTC — DuckDB's naive
    *                           TIMESTAMP semantics)
    *   - TIMESTAMP           → already session-TZ micros; pass through
    * Layout-independence is pinned by TsLayoutSpec (ns-int64 / µs / ms
    * fixtures must agree row-for-row).
    */
  private[graft] def normalizeTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** events with `ts` normalized to a session-TZ microsecond TIMESTAMP
    * whatever the physical layout (see [[normalizeTs]]). The legacy
    * `nanosAsLong` conf stays set (guarded — a library must not churn
    * session-global state on every call): it is load-bearing only for
    * TIMESTAMP(NANOS) files, harmless for every other layout.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    if (s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // load() runs BEFORE the outer computeIfAbsent: a nested
    // computeIfAbsent on the same map throws ConcurrentModificationException
    // (the mapping function must not modify the map)
    val base = load(s, d, "events")
    cache.computeIfAbsent((s, d, "events@ts"), _ => normalizeTs(base))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Wide view of events (see [[loadWide]]), with the same schema-adaptive
    * ts normalization as [[events]]. For queries whose first map stage
    * decodes the `props` JSON — the expensive per-row work. The landed copy
    * preserves whatever type the source read as (BIGINT under nanosAsLong,
    * timestamp otherwise), so [[normalizeTs]] applies identically.
    */
  def eventsWide(s: SparkSession, d: String): DataFrame = {
    if (s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val base = loadWide(s, d, "events")
    cache.computeIfAbsent((s, d, "events@wide@ts"), _ => normalizeTs(base))
  }

  /** Wide view of documents (see [[loadWide]]): for shingle / signature /
    * edit-distance operators whose map stage dwarfs the scan. */
  def documentsWide(s: SparkSession, d: String): DataFrame =
    loadWide(s, d, "documents")

  /** Wide view of embeddings (see [[loadWide]]): for quantizer-encode map
    * stages (PQ sub-codebook argmin, 128 sub-dots per row) that a
    * single-row-group source would serialize onto one core. */
  def embeddingsWide(s: SparkSession, d: String): DataFrame =
    loadWide(s, d, "embeddings")
}
