package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism conventions shared by every (queries, oracleSql) pair so the
  * driver's hash-compare against DuckDB is bit-exact (SURVEY.md §5):
  *
  *  - Double SUMs are order-dependent in IEEE float. Both engines therefore
  *    sum an exact scaled INTEGER instead (fixed-point; see the object body
  *    for the layout and overflow headroom): identical doubles scale to
  *    identical integers in both engines, the integer sums are exact, and
  *    the final integer→double→/scale steps are correctly rounded in both.
  *    Order-independent, scale-independent — holds at 100 TB as at sf0.01.
  *  - AVGs are `decimalSum / count` in DOUBLE division: identical inputs →
  *    identical IEEE result. No rounding step needed.
  *  - Timestamps/dates never appear raw in a final projection — format to
  *    'yyyy-MM-dd[ HH:mm:ss]' strings (DuckDB twin: strftime) to dodge
  *    physical-type mismatches between writers.
  *  - Computed integers are cast to BIGINT on both sides (DuckDB SUM(int)
  *    returns HUGEINT, year() returns BIGINT, Spark returns INT — pick one).
  *  - Every query ends with a total ORDER BY including a unique tiebreaker;
  *    window ORDER BYs include a unique tiebreaker too.
  */
object Det {
  /** The exact sums below run in FIXED-POINT i64, not DecimalType: Spark's
    * Decimal aggregation buffer measures ~5× slower per row than a plain
    * long sum (0.53 s vs 0.10 s for two sums over 600k rows), while a
    * scaled-integer sum is equally exact and order-independent. Layout:
    *
    *  - Each row is scaled to an integer: round-half-away-from-zero(x*s).
    *    Spark's double→long CAST truncates toward zero, so ±0.5 before the
    *    cast IS half-away rounding — no per-row BigDecimal. The DuckDB twin
    *    uses round() (also half-away) because DuckDB's BIGINT cast ROUNDS
    *    rather than truncates. Inputs are ≤6dp quantities whose scaled
    *    images sit within ~1e-3 of an integer — every rounding mode agrees.
    *  - The i64 sum is SPLIT into hi=floorDiv(2^20) and lo=floorMod(2^20)
    *    (shiftright/bitwiseAND — exact for negatives in two's complement):
    *    two codegen'd long sums, recombined exactly in ONE per-group
    *    decimal op. TWO exactness constraints, both needed: the hi-sum
    *    magnitude bound n·|x|·s < 2^83 ≈ 9.7e24 — at 100 TB (~7e11
    *    lineitem rows, money ≤1e7, s=100) that is ~1e4× headroom, where a
    *    single unsplit i64 sum would already have overflowed — AND the
    *    lo-sum row-count bound: each lo term is < 2^20 regardless of value
    *    magnitude, so sum(long) wraps (silently, in non-ANSI Spark) past
    *    ~2^43 ≈ 8.8e12 rows per group. Both bounds dwarf any real group;
    *    the point is that neither alone is the guarantee.
    *  - Total → double (nearest) → /s mirrors DuckDB's
    *    CAST(HUGEINT SUM AS DOUBLE)/s op-for-op, so results are
    *    bit-identical.
    */
  private val SHIFT = 20
  private val BASE = 1L << SHIFT
  private val MASK = BASE - 1

  /** round-half-away-from-zero(c*s) as i64, null-preserving, no BigDecimal. */
  def scaledLong(c: Column, s: Long): Column =
    when(c >= 0, (c * s + lit(0.5)).cast("long"))
      .otherwise((c * s - lit(0.5)).cast("long"))

  private def dec38(c: Column): Column = c.cast(DecimalType(38, 0))

  /** Exact hi/lo-split fixed-point sum of an already-scaled i64 column,
    * recombined to the exact integer total as DECIMAL(38,0). */
  def splitSum(sc: Column): Column =
    dec38(sum(shiftright(sc, SHIFT))) * BASE +
      dec38(sum(sc.bitwiseAND(lit(MASK))))

  private def fsum(c: Column, s: Long): Column =
    splitSum(scaledLong(c, s)).cast("double") / s

  /** Exact order-independent sum of a 2-decimal money column, as double. */
  def dsum(c: Column): Column = fsum(c, 100L)

  /** Exact sum of a computed double (e.g. price*(1-disc)) at 6dp, as double. */
  def dsum6(c: Column): Column = fsum(c, 1000000L)

  /** Order-independent average: exact fixed-point sum / count, double division. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** Exact fixed-point sum of a PRODUCT of two 2dp columns (power sums for
    * variance/corr): the i64 product of the scaled inputs (≤1e18 for
    * price², still exact in i64) is split 3 ways (42/21/21 bits) so each
    * component sum stays within i64 out to ~4e12 rows per group. */
  def dprodSum(a: Column, b: Column): Column = {
    val p = scaledLong(a, 100L) * scaledLong(b, 100L)
    val m21 = lit((1L << 21) - 1)
    ((dec38(sum(shiftright(p, 42))) * lit(1L << 42) +
      dec38(sum(shiftright(p, 21).bitwiseAND(m21))) * lit(1L << 21) +
      dec38(sum(p.bitwiseAND(m21))))
      .cast("double") / 10000)
  }
  def sqlDprodSum(a: String, b: String): String =
    s"(CAST(SUM(CAST(round(($a) * 100) AS BIGINT) * CAST(round(($b) * 100) AS BIGINT)) AS DOUBLE) / 10000)"

  /** SQL twins for the above (DuckDB dialect): DuckDB sums BIGINT into
    * HUGEINT (int128) — exact at any scale — then converts the exact total
    * to double and divides, the same op sequence as the Spark side. */
  def sqlDsum(e: String): String =
    s"(CAST(SUM(CAST(round(($e) * 100) AS BIGINT)) AS DOUBLE) / 100)"
  def sqlDsum6(e: String): String =
    s"(CAST(SUM(CAST(round(($e) * 1000000) AS BIGINT)) AS DOUBLE) / 1000000)"
  def sqlDavg(e: String): String = s"(${sqlDsum(e)} / COUNT($e))"

  /** Timestamp → canonical string, Spark side. */
  def fmtTs(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")
  def fmtDate(c: Column): Column = date_format(c, "yyyy-MM-dd")
  /** Timestamp → canonical string, DuckDB side. */
  def sqlFmtTs(e: String): String = s"strftime($e, '%Y-%m-%d %H:%M:%S')"
  def sqlFmtDate(e: String): String = s"strftime($e, '%Y-%m-%d')"
}
