package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join — points matched to every interval containing
  * them. Spark plans a raw `BETWEEN` join as BroadcastNestedLoopJoin
  * (fine only while one side broadcasts) or a cartesian; this operator
  * turns it into an EQUI-join on coarse time bins: each interval explodes
  * into the bins it covers, each point carries its single bin, and the
  * exact containment predicate runs as a residual filter after the hash
  * join. A (point, interval) pair can only meet in the point's bin, so
  * the output needs no dedup.
  *
  * Scale shape: one shuffle keyed on the bin (or zero if the exploded
  * interval side broadcasts). Bin width tunes the tradeoff: wider bins →
  * fewer interval replicas but more residual-filter misses; at 100 TB
  * pick width ≈ median interval length so each interval lands in ~2 bins
  * (the Databricks/Photon range-join hint uses exactly this scheme). A
  * hot bin (many long intervals) salts like any skewed key.
  */
object RangeJoin {

  /** Inner-join `points` to every interval with
    * startCol <= ptCol <= endCol (DATE columns, inclusive bounds).
    *
    * @param binDays bucket width in days; intervals are replicated into
    *                ceil(len/binDays)+1 buckets
    */
  def pointInInterval(
      points: DataFrame, ptCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binDays: Int): DataFrame = {
    require(binDays > 0, "binDays must be positive")
    val epoch = to_date(lit("1970-01-01"))
    def bin(c: org.apache.spark.sql.Column) =
      floor(datediff(c, epoch) / binDays)
    val pts = points.withColumn("_bin", bin(col(ptCol)))
    val ivs = intervals.withColumn("_bin",
      explode(sequence(bin(col(startCol)), bin(col(endCol)))))
    pts.join(ivs, "_bin")
      .filter(col(ptCol) >= col(startCol) && col(ptCol) <= col(endCol))
      .drop("_bin")
  }

  /** Interval-×-interval OVERLAP join (inclusive DATE bounds):
    * lStart <= rEnd AND rStart <= lEnd — the semantics
    * [[pointInInterval]] cannot express (neither side is a point).
    * Both sides explode into the coarse bins they cover and meet in an
    * equi-join; because an overlapping pair shares EVERY bin in
    * [max(start bins), min(end bins)], each pair is attributed to ONE
    * canonical bin — the later of the two start bins, which overlap
    * guarantees lies inside both intervals' bin ranges — so the output
    * is duplicate-free without a distinct. Column names must not
    * collide across the two sides.
    *
    * Scale shape: identical to [[pointInInterval]] — one bin-keyed
    * equi-shuffle (or broadcast of the smaller exploded side), residual
    * filter after the hash join, bin width ≈ median interval length,
    * salt hot bins. Never a BroadcastNestedLoopJoin/cartesian, which is
    * what Spark plans for a raw inequality-only join. */
  def intervalOverlap(
      left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      binDays: Int): DataFrame = {
    require(binDays > 0, "binDays must be positive")
    val epoch = to_date(lit("1970-01-01"))
    def bin(c: org.apache.spark.sql.Column) =
      floor(datediff(c, epoch) / binDays)
    val l = left.withColumn("_bin",
      explode(sequence(bin(col(lStart)), bin(col(lEnd)))))
    val r = right.withColumn("_bin",
      explode(sequence(bin(col(rStart)), bin(col(rEnd)))))
    l.join(r, "_bin")
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("_bin") === greatest(bin(col(lStart)), bin(col(rStart))))
      .drop("_bin")
  }
}
