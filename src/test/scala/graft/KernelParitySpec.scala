package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.queries.Dedup

/** End-to-end parity between the two MinHash/LSH hash kernels: the
  * portable md5 kernel (oracle-checked configuration, what d2/d3 declare)
  * and the engine-native xxhash64 kernel (the 100 TB configuration —
  * ~20× less hash CPU, same operator shapes). The pair OUTPUT of the
  * banded pipeline must be kernel-agnostic on a corpus whose similarity
  * structure is unambiguous: exact duplicates (est_sim 1 under any
  * kernel) against near-orthogonal random docs (expected token overlap
  * ≪ 1, so neither kernel can band-collide or pass the 0.5 threshold).
  */
class KernelParitySpec extends SparkSpec {
  import spark.implicits._

  private def corpus() = {
    val rnd = new Random(20260813)
    val base = (0 until 120).map { i =>
      val text = Seq.fill(40)(s"w${rnd.nextInt(5000)}").mkString(" ")
      (i.toLong, text)
    }
    val dups = (0 until 20).map(i => (1000L + i, base(i)._2))
    (base ++ dups).toDF("doc_id", "text")
  }

  test("xxhash64 and md5 kernels produce the same LSH pair set at the same threshold") {
    val docs = corpus()
    val portable = Dedup.lshPairs(docs) // defaults: the d3 configuration
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val native = Dedup.lshPairs(docs, xxhashKernel, xxhashBandKernel)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 20).map(i => (i.toLong, 1000L + i)).toSet
    assert(portable == planted,
      s"portable kernel: ${portable.diff(planted)} extra / ${planted.diff(portable)} missing")
    assert(native == planted,
      s"native kernel: ${native.diff(planted)} extra / ${planted.diff(native)} missing")
  }

  test("native-kernel signatures equal independently computed per-seed minima") {
    // pins minhashSignature's array/transform plumbing under xxhash64:
    // sig[seed] must equal min over the doc's shingles of
    // xxhash64(shingle, seed), recomputed via an explode + groupBy path
    val docs = corpus().limit(30)
    val sh = docs.withColumn("sh", shingles(col("text"), 2))
      .filter(size(col("sh")) > 0)
    val viaOp = sh
      .select(col("doc_id"),
        minhashSignature(col("sh"), 4, xxhashKernel).as("sig"))
    val viaExplode = sh
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .groupBy("doc_id")
      .agg(array((0 until 4).map(seed =>
        min(xxhash64(col("s"), lit(seed)))): _*).as("sig2"))
    val joined = viaOp.join(viaExplode, "doc_id")
      .filter(col("sig") =!= col("sig2"))
    assert(joined.count() == 0, "operator signature diverged from ground truth")
  }
}
