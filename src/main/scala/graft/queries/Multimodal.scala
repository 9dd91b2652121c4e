package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.multimodal.MediaOps

/** Multimodal-column queries (driver north-star): the documents table
  * stands in for a media corpus — payload = container magic bytes + the
  * text bytes, media kind assigned round-robin. mm1 (metadata: sizes +
  * format sniffing) is pure column work and oracle-checked; mm2 runs the
  * batched-codec mapPartitions pipeline (MediaOps.MediaCodec: real P6
  * decode, deterministic fixture for native-lib containers).
  */
object Multimodal extends QueryGroup {

  /** payload = magic header for the row's media kind ++ utf8(text). */
  private def withPayload(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("media_kind",
        // pmod: Spark % keeps the dividend's sign, so a negative doc_id
        // would index 0 and element_at would throw where the oracle's
        // list[0] yields NULL — pmod keeps the index in 1..3 for any id
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")))
      .withColumn("payload",
        when(col("media_kind") === "image",
          concat(expr("X'89504E47'"), col("text").cast("binary")))
          .when(col("media_kind") === "audio",
            concat(expr("X'52494646'"), col("text").cast("binary")))
          .otherwise(concat(expr("X'66747970'"), col("text").cast("binary"))))

  def defs: Map[String, QueryDef] = Map(
    // MM1: binary columns + typed metadata — sizes and magic-number format
    // sniffing, all at scan time.
    "mm1_media_metadata" -> QueryDef(
      build = (s, d) => {
        val media = withPayload(Tables.documents(s, d))
        MediaOps.withMediaMetadata(media, "payload")
          .select(
            col("doc_id"), col("media_kind"),
            col("media_meta.n_bytes").as("n_bytes"),
            col("media_meta.format").as("format"))
      },
      oracle = Some("""
        WITH media AS (
          SELECT doc_id,
                 ['image','audio','video'][CAST(((doc_id % 3) + 3) % 3 + 1 AS INT)] AS media_kind,
                 CASE CAST(((doc_id % 3) + 3) % 3 AS INT)
                   WHEN 0 THEN '\x89PNG'::BLOB || encode(text)
                   WHEN 1 THEN 'RIFF'::BLOB || encode(text)
                   ELSE 'ftyp'::BLOB || encode(text) END AS payload
          FROM documents)
        SELECT doc_id, media_kind,
               octet_length(payload) AS n_bytes,
               CASE WHEN substring(hex(payload), 1, 8) = '89504E47' THEN 'png'
                 WHEN substring(hex(payload), 1, 8) = '52494646' THEN 'riff'
                 WHEN substring(hex(payload), 1, 8) = '66747970'
                   OR substring(hex(payload), 9, 8) = '66747970' THEN 'mp4'
                 ELSE 'unknown' END AS format
        FROM media""")),

    // MM2: decode → feature-extract → resize-plan → frame-sample through
    // the batched mapPartitions codec (MediaOps.MediaCodec — P6 decodes
    // for real, spec'd to exact pixel stats; the synthetic png/riff/mp4
    // payloads here take the deterministic fixture path, whose features
    // derive from the portable md5 hash of the payload, so this pipeline
    // is fully oracle-checked end to end).
    "mm2_media_features" -> QueryDef(
      build = (s, d) => {
        val media = withPayload(Tables.documents(s, d))
        MediaOps.extractFeatures(media, "doc_id", "payload")
          .select(col("id"), col("format"), col("width"), col("height"),
            col("resized_w"), col("resized_h"), col("n_frames"),
            size(col("sampled_frames")).as("n_sampled"),
            (floor(col("mean_luma") * 10000) / 10000.0).as("mean_luma"))
      },
      oracle = Some("""
        WITH media AS (
          SELECT doc_id,
                 CASE CAST(((doc_id % 3) + 3) % 3 AS INT)
                   WHEN 0 THEN '\x89PNG'::BLOB || encode(text)
                   WHEN 1 THEN 'RIFF'::BLOB || encode(text)
                   ELSE 'ftyp'::BLOB || encode(text) END AS payload
          FROM documents),
        hashed AS (
          SELECT doc_id,
                 CASE WHEN substring(hex(payload), 1, 8) = '89504E47' THEN 'png'
                   WHEN substring(hex(payload), 1, 8) = '52494646' THEN 'riff'
                   WHEN substring(hex(payload), 1, 8) = '66747970'
                     OR substring(hex(payload), 9, 8) = '66747970' THEN 'mp4'
                   ELSE 'unknown' END AS format,
                 CAST(concat('0x', substr(md5(hex(payload)), 1, 15)) AS BIGINT) AS hv
          FROM media),
        feats AS (
          SELECT doc_id, format,
                 CAST(16 + (hv % 64) * 16 AS INT) AS width,
                 CAST(16 + ((hv >> 8) % 64) * 16 AS INT) AS height,
                 CAST(1 + ((hv >> 16) % 30) AS INT) AS n_frames,
                 ((hv >> 24) % 256) / 255.0 AS luma
          FROM hashed),
        scaled AS (
          SELECT *, least(1.0, 256.0 / greatest(width, height)) AS scale FROM feats)
        SELECT doc_id AS id, format, width, height,
               CAST(greatest(1, CAST(trunc(width * scale) AS INT)) AS INT) AS resized_w,
               CAST(greatest(1, CAST(trunc(height * scale) AS INT)) AS INT) AS resized_h,
               n_frames,
               CAST(least(n_frames, 4) AS INT) AS n_sampled,
               floor(luma * 10000) / 10000.0 AS mean_luma
        FROM scaled""")),

    // MM3: perceptual-style media near-dup — the media twin of d5: block
    // by (format, width) so candidate pairs only form inside small
    // same-shape buckets, then keep pairs whose mean-luma distance is
    // tiny. With full native codecs the features would be pHash/luma
    // histograms; the fixture path's hash-derived features keep the exact
    // same plan shape AND full oracle-checkability (real P6 inputs get
    // real luma). At 100 TB the blocked self-join is keyed
    // on (format, width) — binary payloads never shuffle, only the small
    // feature rows.
    "mm3_media_neardup" -> QueryDef(
      build = (s, d) => {
        val media = withPayload(Tables.documents(s, d))
        val feats = MediaOps.extractFeatures(media, "doc_id", "payload")
          .select(col("id"), col("format"), col("width"),
            col("mean_luma")).localCheckpoint(true)
        val a = feats.select(col("format"), col("width"),
          col("id").as("a_id"), col("mean_luma").as("a_luma"))
        val b = feats.select(col("format"), col("width"),
          col("id").as("b_id"), col("mean_luma").as("b_luma"))
        a.join(b, Seq("format", "width"))
          .filter(col("a_id") < col("b_id"))
          .select(col("format"), col("a_id"), col("b_id"),
            (floor(abs(col("a_luma") - col("b_luma")) * 10000) / 10000.0).as("luma_diff"))
          .filter(col("luma_diff") <= 0.02)
      },
      oracle = Some("""
        WITH media AS (
          SELECT doc_id,
                 CASE CAST(((doc_id % 3) + 3) % 3 AS INT)
                   WHEN 0 THEN '\x89PNG'::BLOB || encode(text)
                   WHEN 1 THEN 'RIFF'::BLOB || encode(text)
                   ELSE 'ftyp'::BLOB || encode(text) END AS payload
          FROM documents),
        hashed AS (
          SELECT doc_id,
                 CASE WHEN substring(hex(payload), 1, 8) = '89504E47' THEN 'png'
                   WHEN substring(hex(payload), 1, 8) = '52494646' THEN 'riff'
                   WHEN substring(hex(payload), 1, 8) = '66747970'
                     OR substring(hex(payload), 9, 8) = '66747970' THEN 'mp4'
                   ELSE 'unknown' END AS format,
                 CAST(concat('0x', substr(md5(hex(payload)), 1, 15)) AS BIGINT) AS hv
          FROM media),
        feats AS (
          SELECT doc_id, format,
                 CAST(16 + (hv % 64) * 16 AS INT) AS width,
                 ((hv >> 24) % 256) / 255.0 AS luma
          FROM hashed)
        SELECT a.format, a.doc_id AS a_id, b.doc_id AS b_id,
               floor(abs(a.luma - b.luma) * 10000) / 10000.0 AS luma_diff
        FROM feats a JOIN feats b
          ON a.format = b.format AND a.width = b.width AND a.doc_id < b.doc_id
        WHERE floor(abs(a.luma - b.luma) * 10000) / 10000.0 <= 0.02"""))
  )
}
