package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator query: a Spark build function over a testdata
  * directory plus (when SQL-expressible) the equivalent DuckDB oracle SQL
  * run by the driver on the same parquet tables.
  *
  * Oracle-parity rules used throughout (see SURVEY.md §7.4.3):
  *  - every aggregate / floating computation is `round(x, 4)` on BOTH
  *    sides so double summation-order ulps can't flip the hash;
  *  - no raw timestamps in outputs — always formatted strings — so
  *    parquet timestamp-zone annotations can't diverge;
  *  - count-like derived ints are LONG on the Spark side (DuckDB counts
  *    are BIGINT);
  *  - any top-k / first-per-group has a total deterministic ordering
  *    (explicit unique-key tiebreak).
  */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    /** Queries worth timing at sf0.1 in Bench. */
    bench: Boolean = false)

trait QueryGroup {
  def defs: Map[String, QueryDef]
}

/** Exact-arithmetic helpers: double sums are summation-order dependent, and
  * Spark's task-completion order varies run to run, so `round(sum(dbl),4)`
  * can flip at a rounding boundary vs the DuckDB oracle. Money columns in
  * the testdata carry ≤2 decimal digits, so summing them as DECIMAL(18,2)
  * is exact and order-insensitive on BOTH engines; derived stats (avg,
  * stddev) are then computed in double from those exact sums — identical
  * IEEE operations on identical inputs on both sides.
  */
object Exact {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** Exact sum of a 2-decimal money column, as double. */
  def moneySum(c: String): Column =
    sum(expr(s"CAST($c AS DECIMAL(18,2))")).cast("double")

  /** Exact sum of price*(1-discount) net revenue, as double. */
  def netRevenueSum(price: String, discount: String): Column =
    sum(expr(s"CAST($price AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST($discount AS DECIMAL(18,2)))"))
      .cast("double")

  /** Exact sum of squares of a 2-decimal money column, as double. */
  def moneySumSq(c: String): Column =
    sum(expr(s"CAST($c AS DECIMAL(18,2)) * CAST($c AS DECIMAL(18,2))")).cast("double")

  /** Sample stddev from exact (sum, sumsq, n) in double — deterministic. */
  def stddevFrom(sumC: Column, sumSqC: Column, nC: Column): Column =
    when(nC > 1,
      sqrt(greatest((sumSqC - sumC * sumC / nC) / (nC - lit(1)), lit(0.0))))

  /** Exact money sum in integer cents (long) — for halfway-safe averages:
    * `round(sum/count, 4)` can land exactly on .00005, where Spark's
    * BigDecimal HALF_UP and DuckDB's double rounding disagree. Integer
    * half-up division sidesteps the boundary entirely.
    */
  def moneySumCents(c: String): Column =
    sum(expr(s"CAST(CAST($c AS DECIMAL(18,2)) * 100 AS BIGINT)"))

  /** Half-up average at 4 decimals from cents + count, as double.
    * floor() is safe on the double division: the quotient grid is 1/(2n),
    * far coarser than double ulp at this magnitude, so the division result
    * never straddles an integer boundary unless exactly integral.
    */
  def avg4FromCents(cents: Column, n: Column): Column =
    floor((cents * 200 + n) / (n * 2)) / 10000.0

  /** DuckDB-side mirror fragments for the oracle SQL. */
  def sqlMoneySum(c: String): String =
    s"CAST(sum(CAST($c AS DECIMAL(18,2))) AS DOUBLE)"
  def sqlNetRevenueSum(price: String, discount: String): String =
    s"CAST(sum(CAST($price AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST($discount AS DECIMAL(18,2)))) AS DOUBLE)"
  def sqlMoneySumSq(c: String): String =
    s"CAST(sum(CAST($c AS DECIMAL(18,2)) * CAST($c AS DECIMAL(18,2))) AS DOUBLE)"
  def sqlStddevFrom(sum: String, sumsq: String, n: String): String =
    s"CASE WHEN $n > 1 THEN sqrt(greatest(($sumsq - $sum * $sum / $n) / ($n - 1), 0.0)) END"
  // The outer CAST matters: DuckDB types sum(BIGINT) as HUGEINT (int128),
  // which the driver's type-sensitive hash distinguishes from Spark's BIGINT
  // even when every value matches.
  def sqlMoneySumCents(c: String): String =
    s"CAST(sum(CAST(CAST($c AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)"
  def sqlAvg4FromCents(cents: String, n: String): String =
    s"floor(($cents * 200 + $n) / ($n * 2)) / 10000.0"
}
