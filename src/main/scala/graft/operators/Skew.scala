package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers (SURVEY.md §4 "skew handling"). AQE's runtime
  * skew-join split covers most cases for free; this is the explicit salting
  * form for the case AQE can't fix — a hot key on the BUILD side of a
  * shuffle join whose matching probe rows exceed one task's capacity.
  *
  * Deterministic by construction: the salt is a hash of a caller-chosen
  * discriminator column (e.g. a unique id) modulo the fan-out, never
  * rand() — the engine's determinism contract (SURVEY.md §5) extends to
  * physical-distribution tricks.
  */
object Skew {

  /** Equi-join `big ⋈ small` on `key`, salting the skewed big side into
    * `fanout` sub-keys and replicating the small side once per salt. The
    * result is row-identical to `big.join(small, key)` (SkewSpec pins
    * this); the physical effect is that one hot key's rows spread over
    * `fanout` shuffle partitions instead of one straggler task.
    *
    * 100-TB note: replication multiplies the small side `fanout`× — use
    * for genuinely small-but-unbroadcastable sides, or feed it the subset
    * of keys AQE's skew stats flag hot and union the rest un-salted.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      discriminator: Column, fanout: Int): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(discriminator), lit(fanout)).cast("int"))
    // int literals → sequence of ints → the generator output is already
    // int (a cast wrapped AROUND explode would be a nested-generator error)
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(fanout - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }
}
