package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One sketch entry: a surviving token and its (under-)estimate. */
case class TokenEst(token: String, est: Long)

/** Mergeable Misra–Gries heavy-hitters sketch — the 100 TB path for
  * "top tokens" over an UNBOUNDED key space, where t5's exact
  * groupBy-count would shuffle one row per distinct token. The buffer
  * holds at most k counters per (group, map-partition); only
  * partitions·k entries cross the shuffle, like BoundedTopK.
  *
  * Guarantees (Agarwal et al., "Mergeable Summaries", PODS'12 — the
  * subtract-the-(k+1)-th-largest compaction is mergeable with no bound
  * loss):
  *  - UNDERCOUNT: est ≤ true frequency, always;
  *  - BOUNDED ERROR: true − est ≤ N/k over N total rows, under ANY
  *    partitioning and merge order;
  *  - CAPTURE: every token with true frequency > N/k survives (its
  *    estimate stays positive).
  *
  * The sketch CONTENT (which borderline tokens survive, their exact
  * estimates) is partition-order-dependent — deterministic queries must
  * output only the guarantee booleans plus exact values (the a12/a16
  * tolerance-check pattern), never raw estimates.
  */
class MisraGries(k: Int) extends Aggregator[String, Map[String, Long], Seq[TokenEst]] {

  def zero: Map[String, Long] = Map.empty

  /** Compact to ≤ k counters: subtract the (k+1)-th largest count from
    * every entry, drop the non-positive. Each subtracted unit is matched
    * across ≥ k+1 distinct tokens, which is what bounds the total
    * per-token error by N/k. No-op while the buffer fits. */
  private def shrink(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= k) m
    else {
      // the (k+1)-th largest of exactly k+1 values IS the minimum — the
      // only reduce-path case (a new token grew the map by one) — so the
      // hot per-row path is an O(k) min, never an O(k log k) sort (the
      // BoundedTopK insertSorted lesson); merge-path maps can be larger
      // and keep the sort
      val cut =
        if (m.size == k + 1) m.values.min
        else m.values.toSeq.sorted(Ordering[Long].reverse).apply(k)
      m.collect { case (t, c) if c - cut > 0 => t -> (c - cut) }
    }

  def reduce(m: Map[String, Long], tok: String): Map[String, Long] =
    shrink(m.updated(tok, m.getOrElse(tok, 0L) + 1L))

  def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    shrink(b.foldLeft(a) { case (m, (t, c)) => m.updated(t, m.getOrElse(t, 0L) + c) })

  def finish(m: Map[String, Long]): Seq[TokenEst] =
    m.toSeq.sortBy { case (t, c) => (-c, t) }.map { case (t, c) => TokenEst(t, c) }

  def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder[Map[String, Long]]()
  def outputEncoder: Encoder[Seq[TokenEst]] = ExpressionEncoder[Seq[TokenEst]]()
}

object HeavyHitters {
  /** `sketch(32)(tokenCol)` → array<struct<token,est>> of at most 32
    * surviving counters, est-descending with token tiebreak. INPUT
    * CONTRACT: token must be non-null, enforced LOUDLY here — String is
    * a reference type, so unlike BoundedTopK's primitive fields a null
    * would NOT fail deserialization; it would silently occupy a counter
    * slot and surface as a null-keyed heavy hitter. */
  def sketch(k: Int): Column => Column = {
    require(k >= 1, s"sketch(k=$k): k must be >= 1")
    val fn = udaf(new MisraGries(k), ExpressionEncoder[String]())
    tok => fn(org.apache.spark.sql.functions.when(tok.isNull,
      org.apache.spark.sql.functions.raise_error(org.apache.spark.sql.functions.lit(
        "HeavyHitters.sketch: NULL token (filter or coalesce upstream)")))
      .otherwise(tok))
  }
}
