package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism conventions shared by every (queries, oracleSql) pair so the
  * driver's hash-compare against DuckDB is bit-exact (SURVEY.md §5):
  *
  *  - Double SUMs are order-dependent in IEEE float. Both engines therefore
  *    sum an exact DECIMAL instead: cast each row to DECIMAL(18,s) (the cast
  *    of identical doubles yields identical decimals in both engines), sum
  *    exactly, cast the total back to DOUBLE. Order-independent, scale-
  *    independent — holds at 100 TB exactly as at sf0.01.
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
  /** Exact order-independent sum of a 2-decimal money column, as double. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Exact sum of a computed double (e.g. price*(1-disc)) at 6dp, as double. */
  def dsum6(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast("double")

  /** Order-independent average: exact decimal sum / count, double division. */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** SQL twins for the above (DuckDB dialect). */
  def sqlDsum(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(18,2))) AS DOUBLE)"
  def sqlDsum6(e: String): String = s"CAST(SUM(CAST($e AS DECIMAL(18,6))) AS DOUBLE)"
  def sqlDavg(e: String): String = s"(${sqlDsum(e)} / COUNT($e))"

  /** Timestamp → canonical string, Spark side. */
  def fmtTs(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")
  def fmtDate(c: Column): Column = date_format(c, "yyyy-MM-dd")
  /** Timestamp → canonical string, DuckDB side. */
  def sqlFmtTs(e: String): String = s"strftime($e, '%Y-%m-%d %H:%M:%S')"
  def sqlFmtDate(e: String): String = s"strftime($e, '%Y-%m-%d')"
}
