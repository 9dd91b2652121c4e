package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column operators (driver north-star): image/audio/video
  * treated as opaque `binary` columns + typed metadata, with
  * decode / feature-extract / resize / frame-sample plumbing.
  *
  * The Spark side — schema, partitioning, batch shape, metadata
  * extraction — is real and tested, and [[MediaCodec]] decodes binary PPM
  * (P6) FOR REAL in pure JVM byte arithmetic (header + exact Rec.601 mean
  * luma). Containers needing native libraries this environment doesn't
  * ship (png/riff/mp4) fall back to a deterministic fixture decode derived
  * from the payload bytes, clearly marked; on a real cluster you add
  * JNI/ffmpeg/ImageIO decoders next to the PPM one — the operator shape
  * (mapPartitions over micro-batches of byte arrays, one codec call per
  * batch, constant memory) is exactly what survives 100 TB: payloads never
  * pass through a shuffle, only their extracted features do.
  */
object MediaOps {

  /** Magic-number format sniffing over the first payload bytes — a pure
    * column expression (runs at scan, codegen'd). Only the first 8 bytes
    * are hex-encoded (hex of the WHOLE payload would materialize a
    * 2×-payload string per row on multi-MB media blobs just to compare 8
    * chars). 'ftyp' is recognized at byte offset 0 (this harness's
    * synthetic payloads) AND at offset 4, where real ISO-BMFF files put
    * it after the 4-byte box size — so the sniff keeps working when
    * MediaCodec is swapped for a real decoder. */
  def sniffFormat(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val head = hex(substring(payload, 1, 4))
    val box = hex(substring(payload, 5, 4))
    when(head === "89504E47", "png")
      .when(head === "52494646", "riff")
      .when(head === "66747970" || box === "66747970", "mp4")
      // P6 magic is 2 bytes + REQUIRED header whitespace (or a comment) —
      // a 'P6000parts…' blob is not a PPM. Oracle-neutral on the
      // synthetic corpus (every payload starts with one of the three
      // magics above); exists for real PPM inputs, which
      // MediaCodec.decodePpm then decodes for real.
      .when(substring(head, 1, 4) === "5036" &&
        substring(head, 5, 2).isin("20", "09", "0A", "0D", "23"), "ppm")
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

  /** Media codec. One container is decoded FOR REAL, dependency-free:
    * binary PPM (P6) — full header parse (comments included) + a pixel
    * scan producing exact Rec.601 mean luma, pure JVM byte arithmetic
    * ([[decodePpm]], spec'd against a known fixture down to the exact
    * luma fraction). Containers whose decoders this environment doesn't
    * ship (png/riff/mp4 need native libs) fall back to a deterministic
    * fixture decode: every field a pure function of the portable 60-bit
    * md5 hash of the payload's hex form, which DuckDB reproduces
    * bit-for-bit, so even the fallback feature pipeline is oracle-checked
    * end to end. Production swap point: add real decoders next to
    * [[decodePpm]]; the batched mapPartitions shape doesn't change. */
  object MediaCodec {
    private val HexDigits = "0123456789ABCDEF".toCharArray

    /** Real P6 decode: `P6 <ws> width <ws> height <ws> maxval <single ws>
      * <raw RGB rows>`, `#` comments legal anywhere in the header
      * whitespace, 1-byte samples (maxval <= 255). Returns None unless
      * the payload is a well-formed single-byte-sample P6 whose pixel
      * data is complete — a truncated or 16-bit image falls through to
      * the fixture decode rather than yielding half-read stats.
      *
      * mean_luma = mean over pixels of Rec.601 luma scaled to [0, 1]:
      * (299 R + 587 G + 114 B) summed EXACTLY in integers, divided once
      * by 1000 · maxval · n_pixels — deterministic, no per-pixel FP. */
    def decodePpm(payload: Array[Byte]): Option[MediaFeatures] = {
      if (payload.length < 3 || payload(0) != 'P' || payload(1) != '6')
        return None
      var i = 2
      def skipWs(): Unit = {
        var in = true
        while (in && i < payload.length) {
          val c = payload(i)
          if (c == '#') { while (i < payload.length && payload(i) != '\n') i += 1 }
          else if (c == ' ' || c == '\t' || c == '\n' || c == '\r') i += 1
          else in = false
        }
      }
      def readInt(): Int = {
        skipWs()
        var v = -1L // Long accumulator: an Int would WRAP on a corrupt
        // header ('P6 4294967297 1 255' reads as 1x1) and decode
        // confidently wrong geometry instead of falling through
        while (i < payload.length && payload(i) >= '0' && payload(i) <= '9') {
          v = math.min(math.max(v, 0L) * 10 + (payload(i) - '0'), Int.MaxValue.toLong)
          i += 1
        }
        if (v == Int.MaxValue.toLong) -1 else v.toInt
      }
      // the byte after the magic must be header whitespace (or a comment)
      // — 'P6000parts...' is not a PPM
      if (payload(2) != ' ' && payload(2) != '\t' && payload(2) != '\n' &&
          payload(2) != '\r' && payload(2) != '#') return None
      val w = readInt(); val h = readInt(); val maxval = readInt()
      if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) return None
      // the single byte separating header from raster must be whitespace —
      // 'P6 2 2 255X<raster>' would otherwise decode a misaligned raster
      // with confident-but-wrong luma instead of falling through
      if (i >= payload.length ||
          (payload(i) != ' ' && payload(i) != '\t' &&
           payload(i) != '\n' && payload(i) != '\r')) return None
      i += 1
      val need = 3L * w * h
      if (i + need > payload.length) return None
      var lumaSum = 0L // max 1000·255·pixels — overflows long at ~3.6e13 px
      var base = i
      val end = i + need.toInt
      while (base < end) {
        lumaSum += 299L * (payload(base) & 0xff) +
          587L * (payload(base + 1) & 0xff) + 114L * (payload(base + 2) & 0xff)
        base += 3
      }
      Some(MediaFeatures(
        width = w, height = h, n_frames = 1,
        mean_luma = lumaSum.toDouble / (1000.0 * maxval * (w.toLong * h))))
    }

    /** @param md reusable digest — hoisted per batch by extractFeatures so
      *           the per-row cost is the hash itself, not provider lookup */
    def decode(payload: Array[Byte],
        md: java.security.MessageDigest = java.security.MessageDigest.getInstance("MD5")): MediaFeatures =
      decodePpm(payload).getOrElse(fixtureDecode(payload, md))

    /** Deterministic fixture decode for containers without a shipped
      * decoder — fake features from the shared portable kernel over
      * hex(payload) (uppercase, matching both engines' hex()); h is
      * 60-bit non-negative. */
    private def fixtureDecode(payload: Array[Byte],
        md: java.security.MessageDigest): MediaFeatures = {
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
          val f = MediaCodec.decode(payload, md)
          val (rw, rh) = MediaCodec.resizePlan(f, maxDim)
          Row(id, fmt, f.width, f.height, rw, rh, f.n_frames,
            MediaCodec.sampleFrames(f, framesPerClip), f.mean_luma)
        }
      }
    }(org.apache.spark.sql.Encoders.row(featureSchema))
    rows
  }
}
