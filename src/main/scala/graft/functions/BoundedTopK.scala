package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One scored candidate: ranking is (score DESC, id ASC). */
case class Scored(score: Double, id: Long)

/** Bounded top-k aggregator: the partial-aggregation buffer never holds
  * more than k entries, so the map-side combine emits at most k candidates
  * per (group, map-partition) and only |groups|·partitions·k rows cross the
  * shuffle — the scale-correct shape for per-query top-k over a scored
  * cross product. A `row_number()` window over the scored pairs (the naive
  * formulation) shuffles every |Q|·|V| pair instead; at 100 TB that shuffle
  * is the bottleneck, this one is noise.
  *
  * Deterministic: total order (score DESC, id ASC) with a unique id
  * tiebreak, so the result is independent of partitioning and merge order.
  */
class BoundedTopK(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  // java.lang.Double.compare gives Spark's total double order (NaN greater
  // than everything, -0.0 < 0.0) — primitive `>` would silently DROP NaN
  // scores where a desc-ordered window ranks them first, diverging from
  // the row_number formulation this aggregator replaces.
  private def better(a: Scored, b: Scored): Boolean = {
    val c = java.lang.Double.compare(a.score, b.score)
    c > 0 || (c == 0 && a.id < b.id)
  }

  def zero: Seq[Scored] = Vector.empty

  /** Insert into an already-sorted buffer at the right position — O(k)
    * copy, no O(k log k) re-sort of a 50-element buffer per admitted row
    * (reduce runs once per INPUT row on the hot scoring path; the buffer
    * is sorted by construction, so re-sorting it was pure waste). */
  private def insertSorted(buf: Seq[Scored], v: Scored): Seq[Scored] = {
    val i = buf.indexWhere(better(v, _))
    if (i < 0) buf :+ v
    else (buf.take(i) :+ v) ++ buf.drop(i)
  }

  def reduce(buf: Seq[Scored], v: Scored): Seq[Scored] =
    if (buf.size >= k && !better(v, buf.last)) buf
    else insertSorted(buf, v).take(k)

  def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
    (a ++ b).sortWith(better).take(k)

  def finish(buf: Seq[Scored]): Seq[Scored] = buf

  def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
  def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
}

object BoundedTopK {
  /** `topK(5)(scoreCol, idCol)` → array<struct<score,id>> of the group's
    * top 5 by (score DESC, id ASC), with bounded shuffle. */
  /** INPUT CONTRACT: score and id must be non-null — the input encoder
    * uses primitive fields (no per-row boxing on the hot scoring path),
    * so a NULL input fails deserialization instead of ranking NULLS LAST
    * like the row_number window this replaces. Every caller scores with
    * total functions (vec_dot, counts) where NULL is impossible;
    * coalesce() upstream if a nullable score expression ever feeds one. */
  def topK(k: Int): (Column, Column) => Column = {
    require(k >= 1, s"topK(k=$k): k must be >= 1")
    val fn = udaf(new BoundedTopK(k), ExpressionEncoder[Scored]())
    (score, id) => fn(score, id)
  }
}
