package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed UDAF surface (SURVEY.md §2.10): a MinHash-signature `Aggregator`
  * that folds a group's shingle strings into the 8-chunk signature
  * NearDup.docNearDedup computes relationally (one md5 per shingle, split
  * into 8 disjoint 4-hex chunks, elementwise min — fixed-width hex, so
  * string min ≡ numeric min).
  *
  * This exists for the API surface a library user expects (a reusable
  * aggregate they can drop into their own groupBy) and as the buffer-based
  * formulation; the engine's own query uses the equivalent
  * min(substring(md5(g), …)) aggregates, which stay in codegen and need no
  * serialization — MinHashAggSpec pins the equivalence of the two.
  *
  * Scale note: the buffer is 8 fixed-width strings; merge is elementwise
  * min — associative and commutative, so partial aggregation shards it
  * like any built-in agg.
  */
object MinHashAgg {

  val NumChunks = 8
  val ChunkHex = 4
  private val Top = "￿" // sorts after every hex digit

  val minhash: Aggregator[String, Array[String], Array[String]] =
    new Aggregator[String, Array[String], Array[String]] {
      def zero: Array[String] = Array.fill(NumChunks)(Top)

      def reduce(buf: Array[String], shingle: String): Array[String] = {
        val md = MessageDigest.getInstance("MD5")
        val hex = md.digest(shingle.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        var i = 0
        while (i < NumChunks) {
          val chunk = hex.substring(i * ChunkHex, (i + 1) * ChunkHex)
          if (chunk < buf(i)) buf(i) = chunk
          i += 1
        }
        buf
      }

      def merge(a: Array[String], b: Array[String]): Array[String] = {
        var i = 0
        while (i < NumChunks) {
          if (b(i) < a(i)) a(i) = b(i)
          i += 1
        }
        a
      }

      def finish(buf: Array[String]): Array[String] = buf
      def bufferEncoder: Encoder[Array[String]] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[String]]()
      def outputEncoder: Encoder[Array[String]] = bufferEncoder
    }

  /** Column form: MinHash signature of a grouped shingle column. */
  def minhashSig(shingle: Column): Column = udaf(minhash).apply(shingle)
}
