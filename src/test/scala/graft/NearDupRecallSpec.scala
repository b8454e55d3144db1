package graft

import org.apache.spark.sql.functions._
import graft.operators.NearDup

/** Recall of the banded/blocked near-dup detectors against EXACT all-pairs
  * ground truth, computed independently in plain Scala over the tiny corpus.
  *
  * This is verification the DuckDB oracle cannot provide: the oracle twins
  * replicate the SAME candidate generation (MinHash bands, length bands,
  * SimHash blocks), so a pair silently dropped by banding would drop from
  * both engines and still hash-match. Here the ground truth enumerates every
  * pair with no blocking at all — a banding recall loss becomes a red test.
  *
  * SimHash multi-index blocking is pigeonhole-COMPLETE by construction
  * (4 blocks of 12 bits; Hamming <= 3 must leave one block untouched), so
  * its check is a true invariant. The two Jaccard detectors' bands are
  * corpus-honest rather than universally complete (SURVEY.md §2: planted
  * near-dups differ by <= 4 chars; the length bands cover that envelope) —
  * this spec pins that the shipped corpus loses nothing.
  */
class NearDupRecallSpec extends SparkSpec {

  /** Exactly Docs/NearDup's norm: regexp_replace(\s+ -> " "), trim, lower. */
  private def norm(s: String): String =
    s.replaceAll("\\s+", " ").trim.toLowerCase

  private def docs(): Seq[(Long, String)] =
    Tables.documents(spark, sfTiny).select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  private def jaccardPairs(sets: Map[Long, Set[String]])
      : Set[(Long, Long, Long)] = {
    val ids = sets.keys.toSeq.sorted
    (for {
      i <- ids.indices.iterator
      j <- (i + 1) until ids.length
      a = ids(i); b = ids(j)
      common = (sets(a) & sets(b)).size
      union = sets(a).size + sets(b).size - common
      if union > 0 && common.toDouble / union >= 0.5
    } yield (a, b, common.toLong)).toSet
  }

  test("doc_near_dedup finds every exact all-pairs 3-shingle match (sf0.001)") {
    val truth = jaccardPairs(docs().map { case (id, t) =>
      val toks = norm(t).split(" ")
      id -> (if (toks.length >= 3)
        toks.sliding(3).map(_.mkString(" ")).toSet else Set.empty[String])
    }.filter(_._2.nonEmpty).toMap)
    val got = NearDup.docNearDedup(spark, sfTiny)
      .select(col("doc_a"), col("doc_b"), col("n_common"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == truth,
      s"banded MinHash result diverges from exact all-pairs: missing=${truth -- got}, extra=${got -- truth}")
  }

  test("doc_ngram_jaccard is exact within its declared length-band envelope") {
    // The length bands are the DECLARED candidate envelope, not an
    // implementation detail: a doc posts to bands {len/4, len/4+1}, so a
    // pair is a candidate iff |len_a/4 - len_b/4| <= 1. Running this sweep
    // unrestricted found 4 true J>=0.5 pairs at sf0.001 whose lengths
    // straddle more than one band (e.g. a transitive 0-50-82 triangle
    // where both legs fit the window but the far pair does not) — misses
    // shared bit-for-bit by the DuckDB twin, which encodes the same
    // envelope. Universal completeness for J>=0.5 needs ratio-2 log-bands
    // whose occupancy makes the exact verify quadratic in the corpus (a
    // scale-killer); the linear window is the honest trade, and THIS test
    // pins (a) perfect precision+recall inside the envelope and (b) zero
    // pairs emitted outside it.
    val lens = docs().map { case (id, t) => id -> norm(t).length }.toMap
    def band(id: Long): Long = lens(id) / 4L
    val truthAll = jaccardPairs(docs().map { case (id, t) =>
      val nt = norm(t)
      id -> (if (nt.length >= 4) nt.sliding(4).toSet else Set.empty[String])
    }.filter(_._2.nonEmpty).toMap)
    val truthInWindow =
      truthAll.filter { case (a, b, _) => math.abs(band(a) - band(b)) <= 1 }
    assert(truthAll.size > truthInWindow.size,
      "corpus no longer exercises the out-of-envelope case — sweep is vacuous")
    val got = NearDup.docNgramJaccard(spark, sfTiny)
      .select(col("doc_a"), col("doc_b"), col("n_common"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == truthInWindow,
      s"in-envelope divergence: missing=${truthInWindow -- got}, extra=${got -- truthInWindow}")
  }

  test("doc_simhash_dup equals exact all-pairs Hamming<=3 over the signatures") {
    val sigs = NearDup.docSimhash(spark, sfTiny)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val truth = (for {
      i <- sigs.indices.iterator
      j <- (i + 1) until sigs.length
      (a, sa) = sigs(i); (b, sb) = sigs(j)
      h = java.lang.Long.bitCount(sa ^ sb)
      if h <= 3
    } yield (math.min(a, b), math.max(a, b), h.toLong)).toSet
    val got = NearDup.docSimhashDup(spark, sfTiny)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == truth,
      s"multi-index blocking diverges from exact Hamming: missing=${truth -- got}, extra=${got -- truth}")
  }
}
