package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level bloom pre-probe for stream-static joins (st15; the same
  * shape Spark's InjectRuntimeFilter produces for selective shuffle
  * joins, built explicitly here because the creation side — a static
  * corpus fingerprint index — lives across micro-batches, outside any
  * single plan the optimizer could inject into).
  *
  * The filter is a one-row DataFrame holding the bitset as
  * `array<long>` words, cross-joined with `broadcast()` onto the probe
  * side and tested with pure builtin expressions (xxhash64 / shiftright
  * / bitwiseAND / element_at) — the whole membership test stays inside
  * whole-stage codegen; no UDF, no driver-side per-row call.
  *
  * Guarantee: NO false negatives — build and probe use the identical
  * hash family, so every key actually present passes and the downstream
  * exact join sees exactly the rows it would have seen unfiltered.
  * False positives only cost a wasted probe row. That makes the bloom a
  * pure plan optimization: results (and oracles) are unchanged.
  *
  * Scale: the bitset is sized ~1.2 bytes/key at fpp=1% and capped at
  * [[BloomProbe.MaxBits]] (16 MiB of words) to stay cheaply
  * broadcastable — past the cap the fpp degrades gracefully (more
  * false positives reach the exact join; never a wrong result). The
  * build is one distinct-count plus one shuffle of (pos) ints; at
  * 100 TB you would build it once per index version alongside the
  * corpus fingerprint table and reuse it across every micro-batch.
  */
object BloomProbe {

  /** 2^27 bits = 16 MiB of longs — comfortably broadcastable. */
  val MaxBits: Long = 1L << 27

  /** A built filter: `words` is a single-row frame with column
    * `bloom_words: array<long>`; `bits`/`hashes` parameterize the probe
    * (must match the build — [[mightContain]] takes them back). */
  final case class Bloom(words: DataFrame, bits: Long, hashes: Int)

  /** Build the bitset over the distinct values of `keyCol` (long-typed
    * keys). One count job to size, one aggregation to assemble. */
  def build(keys: DataFrame, keyCol: String, fpp: Double = 0.01): Bloom = {
    // enforce the long-key contract LOUDLY at build time: cast("long")
    // on a non-numeric column maps every value to NULL (or throws an
    // ANSI cast error mid-job), collapsing the distinct key set to one
    // row and degenerating the filter to effectively all-pass — a
    // correctness-adjacent failure with no error to point at it
    val dt = keys.schema(keyCol).dataType
    require(Seq[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType,
        org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType,
        org.apache.spark.sql.types.LongType).contains(dt),
      s"BloomProbe.build requires an integral key column; '$keyCol' is " +
        s"$dt — hash a string key to long (xxhash64) before building")
    // distinct once, pinned: the count (for sizing) and the position
    // explode both read it — without the checkpoint each would re-run
    // the distinct shuffle over the full key set. The cast enforces the
    // long-key contract AT THE HASH: xxhash64 hashes int 5 and long 5
    // differently, so an uncast int build probed by a long column (or
    // vice versa) would silently false-negative EVERY key — the one
    // failure mode the no-false-negatives guarantee forbids
    // ([[mightContain]] applies the same cast to the probe side).
    val dk = keys.select(col(keyCol).cast("long").as("k"))
      .distinct().localCheckpoint(true)
    val n = math.max(1L, dk.count())
    val ln2 = math.log(2)
    val ideal = math.ceil(-n.toDouble * math.log(fpp) / (ln2 * ln2)).toLong
    // round up to whole words; cap for broadcastability
    val bits = math.min(MaxBits, math.max(64L, ((ideal + 63) / 64) * 64))
    val hashes = math.max(1, math.min(8, math.round(bits.toDouble / n * ln2).toInt))
    val nWords = bits / 64
    val positions = dk
      .select(explode(array((0 until hashes).map(i =>
        pmod(xxhash64(col("k"), lit(i)), lit(bits))): _*)).as("pos"))
    // set bits → per-word OR → dense word array (absent words are 0).
    // No distinct() on positions: OR-ing a duplicate mask is a no-op and
    // bit_or partial-aggregates map-side — a distinct would be a second
    // full shuffle of the largest intermediate for nothing
    val words = positions
      .groupBy(shiftright(col("pos"), 6).as("widx"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos & 63 AS INT)))")
        .as("word"))
      .groupBy()
      .agg(map_from_arrays(
        collect_list(col("widx")), collect_list(col("word"))).as("m"))
      .select(expr(
        s"transform(sequence(0L, ${nWords - 1}L), " +
          "i -> coalesce(element_at(m, i), CAST(0 AS BIGINT)))")
        .as("bloom_words"))
    Bloom(words.localCheckpoint(true), bits, hashes)
  }

  /** Membership test for `h` against the `bloom_words` column (after
    * `crossJoin(broadcast(bloom.words))`). Pure builtins — codegen. The
    * probe key is cast to long to mirror [[build]]'s cast: hash-family
    * symmetry must include the INPUT TYPE, not just seeds and masks. */
  def mightContain(h: Column, words: Column, bits: Long, hashes: Int): Column =
    (0 until hashes).map { i =>
      val pos = pmod(xxhash64(h.cast("long"), lit(i)), lit(bits))
      val word = element_at(words, shiftright(pos, 6).cast("int") + lit(1))
      val mask = call_function("shiftleft",
        lit(1L), pos.bitwiseAND(lit(63L)).cast("int"))
      word.bitwiseAND(mask) =!= lit(0L)
    }.reduce(_ && _)
}
