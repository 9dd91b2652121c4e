package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column operators (driver north-star): image/audio/video
  * treated as opaque `binary` columns + typed metadata, with
  * decode / feature-extract / resize / frame-sample plumbing.
  *
  * The Spark side — schema, partitioning, batch shape, metadata
  * extraction — is real and tested. The codec itself is STUBBED (this
  * container ships no image/audio libraries): [[StubCodec.decode]] returns
  * a deterministic fake derived from the payload bytes, clearly marked. On
  * a real cluster you swap StubCodec for a JNI/ffmpeg/ImageIO call — the
  * operator shape (mapPartitions over micro-batches of byte arrays, one
  * codec call per batch, constant memory) is exactly what survives 100 TB:
  * payloads never pass through a shuffle, only their extracted features do.
  */
object MediaOps {

  /** Magic-number format sniffing over the first payload bytes — a pure
    * column expression (runs at scan, codegen'd). Only the first 8 bytes
    * are hex-encoded (hex of the WHOLE payload would materialize a
    * 2×-payload string per row on multi-MB media blobs just to compare 8
    * chars). 'ftyp' is recognized at byte offset 0 (this harness's
    * synthetic payloads) AND at offset 4, where real ISO-BMFF files put
    * it after the 4-byte box size — so the sniff keeps working when
    * StubCodec is swapped for a real decoder. */
  def sniffFormat(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val head = hex(substring(payload, 1, 4))
    val box = hex(substring(payload, 5, 4))
    when(head === "89504E47", "png")
      .when(head === "52494646", "riff")
      .when(head === "66747970" || box === "66747970", "mp4")
      .otherwise("unknown")
  }

  /** Typed metadata for a media column: byte size + sniffed container.
    * Reserves `media_meta` loudly (the Quality/ZOrder posture) — a
    * silent withColumn overwrite would drop an upstream stage's
    * metadata with no error. */
  def withMediaMetadata(df: DataFrame, payloadCol: String): DataFrame = {
    require(!df.columns.contains("media_meta"),
      "withMediaMetadata reserves the media_meta column; the input " +
        "already carries one")
    df.withColumn("media_meta", struct(
      length(col(payloadCol)).cast("long").as("n_bytes"),
      sniffFormat(col(payloadCol)).as("format")))
  }

  final case class MediaFeatures(
      width: Int, height: Int, n_frames: Int, mean_luma: Double)

  /** STUB codec — deterministic fake decode so the pipeline is testable
    * without native media libraries. Every field is a pure function of the
    * payload bytes — specifically of the portable 60-bit md5 hash of the
    * payload's hex form, which DuckDB reproduces bit-for-bit, so even the
    * STUBBED feature pipeline is oracle-checked end to end. Swap this
    * object for a real decoder in production. */
  object StubCodec {
    private val HexDigits = "0123456789ABCDEF".toCharArray

    /** @param md reusable digest — hoisted per batch by extractFeatures so
      *           the per-row cost is the hash itself, not provider lookup */
    def decode(payload: Array[Byte],
        md: java.security.MessageDigest = java.security.MessageDigest.getInstance("MD5")): MediaFeatures = {
      // ??? real implementation would decode the container here ???
      // fake features from the shared portable kernel over hex(payload)
      // (uppercase, matching both engines' hex()) — h is 60-bit non-negative
      val sb = new java.lang.StringBuilder(payload.length * 2)
      payload.foreach { b =>
        sb.append(HexDigits((b >> 4) & 0xf)); sb.append(HexDigits(b & 0xf))
      }
      val h = graft.functions.TextFunctions.portableHash60(sb.toString, md)
      MediaFeatures(
        width = 16 + (h % 64).toInt * 16,
        height = 16 + ((h >> 8) % 64).toInt * 16,
        n_frames = 1 + ((h >> 16) % 30).toInt,
        mean_luma = ((h >> 24) % 256).toInt / 255.0)
    }

    /** Stubbed resize: returns the would-be output dims (no pixels). */
    def resizePlan(f: MediaFeatures, maxDim: Int): (Int, Int) = {
      val scale = math.min(1.0, maxDim.toDouble / math.max(f.width, f.height))
      (math.max(1, (f.width * scale).toInt), math.max(1, (f.height * scale).toInt))
    }

    /** Stubbed frame sampling: deterministic frame indices. */
    def sampleFrames(f: MediaFeatures, k: Int): Seq[Int] =
      if (f.n_frames <= k) 0 until f.n_frames
      else (0 until k).map(i => i * f.n_frames / k)
  }

  private val featureSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("resized_w", IntegerType),
    StructField("resized_h", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("sampled_frames", ArrayType(IntegerType)),
    StructField("mean_luma", DoubleType)))

  /** Decode + feature-extract + resize-plan + frame-sample, executed as
    * mapPartitions over fixed-size batches — the vectorized-codec call
    * shape (batch boundary = where a real codec amortizes setup).
    *
    * @param df (id: long, payload: binary) rows
    */
  def extractFeatures(df: DataFrame, idCol: String, payloadCol: String,
      maxDim: Int = 256, framesPerClip: Int = 4, batchSize: Int = 64): DataFrame = {
    val input = df.select(col(idCol).cast("long"), col(payloadCol), sniffFormat(col(payloadCol)))
    val rows: Dataset[Row] = input.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // one "codec call" per batch — digest allocated once here, reused
        // per row (MessageDigest.digest() resets the instance)
        val md = java.security.MessageDigest.getInstance("MD5")
        batch.iterator.map { r =>
          // a NULL id (legal for a nullable long column, same as the
          // payload below) must fail with a MESSAGE, not the bare NPE
          // getLong throws mid-task — there is no sensible feature row
          // for an unidentifiable media object
          require(!r.isNullAt(0),
            s"extractFeatures: NULL $idCol — media rows need a non-null id")
          val id = r.getLong(0)
          // a NULL payload (legal for a nullable binary column) decodes
          // as empty bytes — deterministic features, not an NPE mid-task
          val payload = Option(r.getAs[Array[Byte]](1))
            .getOrElse(Array.emptyByteArray)
          val fmt = r.getString(2)
          val f = StubCodec.decode(payload, md)
          val (rw, rh) = StubCodec.resizePlan(f, maxDim)
          Row(id, fmt, f.width, f.height, rw, rh, f.n_frames,
            StubCodec.sampleFrames(f, framesPerClip), f.mean_luma)
        }
      }
    }(org.apache.spark.sql.Encoders.row(featureSchema))
    rows
  }
}
