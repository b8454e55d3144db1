package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.NearDup

/** The incremental-maintenance algebra behind cdc_incremental_neardup
  * (S17), proven over MULTIPLE capture batches: folding the corpus in k
  * arbitrary batches through the update rule
  *
  *   pairs_k  = pairs_{k-1} ∪ verify(deltaBands_k ⋈ (bands_{k-1} ∪ deltaBands_k))
  *   bands_k  = bands_{k-1} ∪ deltaBands_k
  *
  * must converge to exactly the batch rebuild's pair set, for any batch
  * assignment. The oracle query exercises one 5% delta; this spec pins the
  * general k-batch fold (the shape a nightly CDC-driven dedup pipeline
  * actually runs) including that no pair is ever produced twice — each
  * pair materializes only in the batch where its LATER member arrives, so
  * the union needs no cross-batch dedup.
  */
class IncrementalNearDupSpec extends SparkSpec {

  test("k-batch incremental fold equals the batch near-dup rebuild") {
    val docs = Tables.documents(spark, sfTiny)
    val exAll = NearDup.shingles(docs).localCheckpoint()

    // full rebuild (the reference)
    val bandsAll = NearDup.minhashBands(exAll)
    val candAll = bandsAll.as("a")
      .join(bandsAll.as("b"),
        col("a.band_id") === col("b.band_id") &&
          col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    def pairSet(df: DataFrame): Set[(Long, Long)] =
      df.select(col("doc_a"), col("doc_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val full = pairSet(NearDup.verifyPairs(candAll, exAll))

    // incremental fold over 3 batches (doc_id % 3 routes the batches —
    // deliberately interleaved ids, not contiguous ranges)
    var stateBands: Option[DataFrame] = None
    var statePairs = Set.empty[(Long, Long)]
    var produced = 0L
    for (k <- 0 until 3) {
      val delta = docs.filter(col("doc_id") % 3 === k)
      val deltaBands = NearDup.minhashBands(NearDup.shingles(delta))
        .localCheckpoint()
      val merged = stateBands match {
        case Some(b) => b.unionByName(deltaBands)
        case None => deltaBands
      }
      val cand = deltaBands.as("a")
        .join(merged.as("b"),
          col("a.band_id") === col("b.band_id") &&
            col("a.bkey") === col("b.bkey") &&
            col("a.doc_id") =!= col("b.doc_id"))
        .select(least(col("a.doc_id"), col("b.doc_id")).as("da"),
          greatest(col("a.doc_id"), col("b.doc_id")).as("db"))
        .distinct()
        .localCheckpoint()
      val newPairs = pairSet(NearDup.verifyPairs(cand, exAll))
      produced += newPairs.size
      statePairs = statePairs ++ newPairs
      stateBands = Some(merged.localCheckpoint())
    }

    assert(statePairs == full,
      s"incremental fold diverged: missing=${full -- statePairs}, " +
        s"extra=${statePairs -- full}")
    assert(produced == statePairs.size,
      "a pair was produced in more than one batch — the later-member " +
        "locality argument is broken and the union would need dedup")
  }
}
