package graft

import org.apache.spark.sql.functions._
import graft.multimodal.MediaOps

/** Multimodal plumbing tests: format sniffing, metadata, and the batched
  * stub-codec pipeline (determinism, resize bounds, frame-sample counts).
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Seq(
    (1L, Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 1, 2, 3)),
    (2L, Array[Byte](0x52, 0x49, 0x46, 0x46, 9, 9)),
    (3L, Array[Byte](0x66, 0x74, 0x79, 0x70, 0, 1)),
    (4L, Array[Byte](0, 0, 0, 0)))
    .toDF("id", "payload")

  test("magic-number sniffing identifies containers") {
    val got = media.select(col("id"), MediaOps.sniffFormat(col("payload")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "png", 2L -> "riff", 3L -> "mp4", 4L -> "unknown"))
  }

  test("metadata struct carries byte size + format") {
    val row = MediaOps.withMediaMetadata(media, "payload")
      .filter(col("id") === 1L).select("media_meta.n_bytes", "media_meta.format")
      .collect()(0)
    assert(row.getLong(0) == 7L && row.getString(1) == "png")
  }

  test("stub pipeline: deterministic, resize bounded, frame samples bounded") {
    val f1 = MediaOps.extractFeatures(media, "id", "payload", maxDim = 128, framesPerClip = 4)
      .collect().sortBy(_.getLong(0))
    val f2 = MediaOps.extractFeatures(media, "id", "payload", maxDim = 128, framesPerClip = 4)
      .collect().sortBy(_.getLong(0))
    assert(f1.map(_.toString).toSeq == f2.map(_.toString).toSeq, "stub decode must be deterministic")
    f1.foreach { r =>
      assert(r.getInt(4) <= 128 && r.getInt(5) <= 128, "resize plan exceeds maxDim")
      val sampled = r.getSeq[Int](7)
      assert(sampled.size <= 4 && sampled.size == sampled.distinct.size)
      assert(sampled.forall(i => i >= 0 && i < r.getInt(6)))
      assert(r.getDouble(8) >= 0.0 && r.getDouble(8) <= 1.0)
    }
  }

  test("batching covers every row exactly once across partitions") {
    val big = spark.range(500).select(col("id"),
      col("id").cast("string").cast("binary").as("payload")).repartition(7)
    val out = MediaOps.extractFeatures(big, "id", "payload", batchSize = 64)
    assert(out.count() == 500)
    assert(out.select("id").distinct().count() == 500)
  }
}
