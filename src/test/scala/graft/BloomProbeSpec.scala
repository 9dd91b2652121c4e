package graft

import org.apache.spark.sql.functions._
import graft.ops.BloomProbe

/** The st15 pre-probe's contract: zero false negatives (the exact join
  * downstream must see every row it would have seen unfiltered) and a
  * useful true-negative rate (the point of probing before the exchange).
  */
class BloomProbeSpec extends SparkSpec {
  import spark.implicits._

  test("bloom probe: no false negatives, strong pruning on non-members") {
    val members = (0L until 5000L).map(i => i * 2654435761L + 13L)
    val bloom = BloomProbe.build(members.toDF("h"), "h")

    def passCount(keys: Seq[Long]): Long =
      keys.toDF("h")
        .crossJoin(broadcast(bloom.words))
        .filter(BloomProbe.mightContain(
          col("h"), col("bloom_words"), bloom.bits, bloom.hashes))
        .count()

    // every member must pass — a false negative would drop a genuinely
    // shared fingerprint and change st15's admission decision
    assert(passCount(members) == members.size,
      "bloom filter dropped a member (false negative)")

    // non-members drawn from a disjoint range: fpp target is 1%, assert
    // a loose 5% bound so the test never flakes on hash accidents
    val nonMembers = (0L until 2000L).map(i => i * 7046029254386353131L + 999L)
    val fp = passCount(nonMembers)
    assert(fp <= nonMembers.size / 20,
      s"bloom passed $fp of ${nonMembers.size} non-members — not pruning")
  }

  test("bloom probe: empty key set passes nothing as member-safe") {
    val bloom = BloomProbe.build(Seq.empty[Long].toDF("h"), "h")
    val n = Seq(1L, 2L, 3L).toDF("h")
      .crossJoin(broadcast(bloom.words))
      .filter(BloomProbe.mightContain(
        col("h"), col("bloom_words"), bloom.bits, bloom.hashes))
      .count()
    assert(n == 0, s"empty bloom must reject everything, passed $n")
  }
}
