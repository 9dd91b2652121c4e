package graft

import scala.util.Random

import org.apache.spark.sql.functions._
import graft.ops.SimilarityJoin

/** The prefix/length/positional prunes must be LOSSLESS: the PPJoin
  * operator's output must equal brute-force all-pairs Jaccard at every
  * threshold, including exact-equality pairs.
  */
class SimilarityJoinSpec extends SparkSpec {
  import spark.implicits._

  private def randomDocs(seed: Int, n: Int): Seq[(String, Long, Seq[String])] = {
    val rnd = new Random(seed)
    val vocab = (0 until 60).map(i => s"w$i")
    (0 until n).map { i =>
      val size = 3 + rnd.nextInt(12)
      val base = rnd.shuffle(vocab).take(size).sorted
      ("blk" + (i % 2), i.toLong, base)
    }
  }

  private def brute(docs: Seq[(String, Long, Seq[String])], t: Double) =
    (for {
      a <- docs; b <- docs
      if a._1 == b._1 && a._2 < b._2
      inter = a._3.toSet.intersect(b._3.toSet).size
      union = a._3.toSet.union(b._3.toSet).size
      if union > 0 && inter.toDouble / union >= t - 1e-12
    } yield (a._1, a._2, b._2)).toSet

  test("PPJoin output equals brute force at t=1/2 and t=4/5 on random sets") {
    val docs = randomDocs(31, 120)
    val df = docs.toDF("blk", "id", "toks")
    for ((p, q) <- Seq((1, 2), (4, 5))) {
      val got = SimilarityJoin.jaccardSelfJoin(df, "blk", "id", "toks", p, q)
        .select("blk", "a_id", "b_id")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val want = brute(docs, p.toDouble / q)
      assert(got == want,
        s"t=$p/$q: missing=${want -- got}, extra=${got -- want}")
    }
  }

  test("exact-equality pairs survive the integer threshold test") {
    // J(A,B) = 4/5 exactly: |A∩B|=4, |A∪B|=5
    val df = Seq(
      ("b", 1L, Seq("a", "b", "c", "d")),
      ("b", 2L, Seq("a", "b", "c", "d", "e"))).toDF("blk", "id", "toks")
    val got = SimilarityJoin.jaccardSelfJoin(df, "blk", "id", "toks", 4, 5).collect()
    assert(got.length == 1 && got(0).getDouble(3) == 0.8)
  }
}
