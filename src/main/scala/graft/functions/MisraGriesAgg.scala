package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY.md §2.10): a Misra-Gries heavy-hitters
  * `Aggregator` — the bounded-memory frequency sketch whose partial states
  * MERGE exactly like any built-in aggregate (Agarwal et al.'s mergeable
  * summaries result), which is what makes it usable as a distributed
  * first pass: each partition folds its rows into ≤ K counters, partials
  * merge associatively, and the finished candidate set is GUARANTEED to
  * contain every item with true frequency > n/K (each counter undercounts
  * by at most n/K).
  *
  * The sketch is a CANDIDATE GENERATOR, not the answer: candidate
  * membership below the guarantee line depends on fold order, so
  * `doc_heavy_hitters` always re-counts candidates exactly (a narrow
  * broadcast-semi-join pass) and filters on the exact counts — the final
  * result is deterministic and engine-identical even though the sketch
  * state is not. Never emit raw sketch counts into a compared payload.
  *
  * Scale note: the buffer is ≤ K map entries regardless of input size;
  * decrement events amortize O(1) per row (each removes K+1 total mass).
  * At 100 TB the per-executor state is still K counters — this is the
  * aggregation that works when groupBy(key) itself would (the exact
  * recount is then restricted to ≤ K keys, which always broadcasts).
  */
object MisraGriesAgg {

  /** Counter budget. The superset guarantee for a threshold n/φ needs
    * K > φ; doc_heavy_hitters filters at n/200, so 512 leaves the
    * guarantee comfortably slack (undercount ≤ n/512 < n/200 headroom).
    */
  val K = 512

  val mg: Aggregator[String, Map[String, Long], Array[String]] =
    new Aggregator[String, Map[String, Long], Array[String]] {
      def zero: Map[String, Long] = Map.empty

      def reduce(buf: Map[String, Long], item: String): Map[String, Long] =
        buf.get(item) match {
          case Some(c) => buf.updated(item, c + 1)
          case None if buf.size < K => buf.updated(item, 1L)
          case None =>
            // decrement-all: removes K+1 units of mass, so across n rows
            // this branch runs ≤ n/(K+1) times — amortized O(1) per row
            buf.flatMap { case (k, c) =>
              if (c > 1) Some(k -> (c - 1)) else None
            }
        }

      def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
        val combined = b.foldLeft(a) { case (m, (k, c)) =>
          m.updated(k, m.getOrElse(k, 0L) + c)
        }
        if (combined.size <= K) combined
        else {
          // standard mergeable-MG shrink: subtract the (K+1)-th largest
          // count from everything, keep the strictly-positive survivors
          val t = combined.valuesIterator.toArray.sorted(Ordering[Long].reverse)(K)
          combined.flatMap { case (k, c) =>
            if (c > t) Some(k -> (c - t)) else None
          }
        }
      }

      /** Sorted for a canonical array image (the SET is the contract). */
      def finish(buf: Map[String, Long]): Array[String] =
        buf.keysIterator.toArray.sorted

      def bufferEncoder: Encoder[Map[String, Long]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
      def outputEncoder: Encoder[Array[String]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
    }
}
