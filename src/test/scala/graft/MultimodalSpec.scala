package graft

import org.apache.spark.sql.functions._
import graft.multimodal.MediaOps

/** Multimodal plumbing tests: format sniffing, metadata, the REAL P6/PPM
  * decode (exact pixel stats on a known fixture), and the batched codec
  * pipeline (determinism, resize bounds, frame-sample counts).
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  /** A real binary PPM: 2×2, maxval 255, header comment, pixels
    * red / green / blue / white — Rec.601 mean luma exactly 0.5
    * ((299 + 587 + 114 + 1000)·255 / (1000·255·4)). */
  private def ppmFixture: Array[Byte] =
    "P6\n# fixture comment\n2 2\n255\n".getBytes("US-ASCII") ++ Array[Byte](
      0xff.toByte, 0x00, 0x00, /* red */
      0x00, 0xff.toByte, 0x00, /* green */
      0x00, 0x00, 0xff.toByte, /* blue */
      0xff.toByte, 0xff.toByte, 0xff.toByte /* white */)

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

  test("codec pipeline: deterministic, resize bounded, frame samples bounded") {
    val f1 = MediaOps.extractFeatures(media, "id", "payload", maxDim = 128, framesPerClip = 4)
      .collect().sortBy(_.getLong(0))
    val f2 = MediaOps.extractFeatures(media, "id", "payload", maxDim = 128, framesPerClip = 4)
      .collect().sortBy(_.getLong(0))
    assert(f1.map(_.toString).toSeq == f2.map(_.toString).toSeq, "codec decode must be deterministic")
    f1.foreach { r =>
      assert(r.getInt(4) <= 128 && r.getInt(5) <= 128, "resize plan exceeds maxDim")
      val sampled = r.getSeq[Int](7)
      assert(sampled.size <= 4 && sampled.size == sampled.distinct.size)
      assert(sampled.forall(i => i >= 0 && i < r.getInt(6)))
      assert(r.getDouble(8) >= 0.0 && r.getDouble(8) <= 1.0)
    }
  }

  test("P6 decode is real: exact header + pixel stats from a known fixture") {
    // unit level: exact dims, single frame, EXACT luma fraction
    val f = MediaOps.MediaCodec.decodePpm(ppmFixture)
    assert(f.contains(MediaOps.MediaFeatures(2, 2, 1, 0.5)), s"got $f")
    // malformed inputs fall through to the fixture decode, never half-read:
    // truncated raster, 16-bit maxval, and a non-P6 magic all return None
    assert(MediaOps.MediaCodec.decodePpm(ppmFixture.dropRight(1)).isEmpty)
    assert(MediaOps.MediaCodec.decodePpm(
      "P6\n2 2\n65535\n".getBytes("US-ASCII") ++ Array.fill[Byte](24)(1)).isEmpty)
    assert(MediaOps.MediaCodec.decodePpm("P5\n2 2\n255\n".getBytes("US-ASCII")).isEmpty)
    // header-int overflow must reject, not wrap mod 2^32 into a tiny
    // "valid" geometry; 'P6' glued to a non-whitespace byte is not a PPM
    assert(MediaOps.MediaCodec.decodePpm(
      ("P6 4294967297 1 255\n" + "xyz").getBytes("US-ASCII")).isEmpty)
    assert(MediaOps.MediaCodec.decodePpm(
      ("P6000parts 1 1 255\n" + "xyz").getBytes("US-ASCII")).isEmpty)

    // pipeline level: the SAME fixture through sniff + extractFeatures
    val df = Seq((7L, ppmFixture)).toDF("id", "payload")
    assert(df.select(MediaOps.sniffFormat(col("payload"))).head().getString(0) == "ppm")
    val row = MediaOps.extractFeatures(df, "id", "payload",
      maxDim = 256, framesPerClip = 4).collect()(0)
    assert(row.getLong(0) == 7L && row.getString(1) == "ppm")
    assert(row.getInt(2) == 2 && row.getInt(3) == 2, "real decoded dims")
    assert(row.getInt(4) == 2 && row.getInt(5) == 2, "no upscale past maxDim")
    assert(row.getInt(6) == 1 && row.getSeq[Int](7) == Seq(0))
    assert(row.getDouble(8) == 0.5, "exact Rec.601 mean luma")
  }

  test("batching covers every row exactly once across partitions") {
    val big = spark.range(500).select(col("id"),
      col("id").cast("string").cast("binary").as("payload")).repartition(7)
    val out = MediaOps.extractFeatures(big, "id", "payload", batchSize = 64)
    assert(out.count() == 500)
    assert(out.select("id").distinct().count() == 500)
  }
}
