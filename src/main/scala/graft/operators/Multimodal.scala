package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Opaque media payload carried as a binary column + provenance. */
final case class MediaIn(doc_id: Long, source: String, payload: Array[Byte])

/** Typed decode result (what a real image/audio decoder would emit). */
final case class MediaMeta(
    doc_id: Long, mime: String, n_bytes: Long, content_md5: String,
    width: Int, height: Int, channels: Int, n_pixels: Long)

/** Multimodal-column plumbing (north-star extension): media as opaque
  * `binary` columns with typed metadata, decoded executor-side in batches.
  *
  * The container has no image/audio libraries, so the *decode* step is a
  * clearly-marked deterministic STUB (dimensions derived from the content
  * hash). Everything around it — the binary column, the typed case-class
  * Encoders, the batched `mapPartitions` shape a vectorized decoder needs,
  * the schema of the result — is real and oracle-checked.
  *
  * Scale posture: decode runs `mapPartitions` executor-side (one batch
  * buffer per task, no shuffle, no driver involvement); payload bytes
  * never leave the executor that read them.
  */
object Multimodal {

  /** Batch size a vectorized decoder would use per call. */
  private val DecodeBatch = 64

  private def md5Hex(b: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(b)
    d.map(x => f"$x%02x").mkString
  }

  /** STUB decoder: a real implementation would parse the image header /
    * run the codec here. Deterministic fake: dimensions are derived from
    * the content md5 (hex chars 1–15 → width, 16–30 → height) so the
    * pipeline stays testable without codec libraries.
    */
  private def decodeOne(m: MediaIn): MediaMeta = {
    val hex = md5Hex(m.payload)
    val w = (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 1920L).toInt + 1
    val h = (java.lang.Long.parseLong(hex.substring(15, 30), 16) % 1080L).toInt + 1
    val ch = (m.doc_id % 3L).toInt + 1
    val mime = if (m.doc_id % 2L == 0L) "image/png" else "image/jpeg"
    MediaMeta(m.doc_id, mime, m.payload.length.toLong, hex, w, h, ch,
      w.toLong * h.toLong * ch.toLong)
  }

  /** Batched decode: drains the partition iterator in `DecodeBatch`-sized
    * buffers — the exact shape a vectorized (e.g. SIMD/JNI) decoder needs —
    * without materializing the whole partition.
    */
  def decodeBatches(it: Iterator[MediaIn]): Iterator[MediaMeta] =
    it.grouped(DecodeBatch).flatMap(_.map(decodeOne))

  // ---------------------------------------------------------------- mm01
  /** Binary ingest → typed batched decode → metadata table. The payload
    * is the UTF-8 encoding of `text` (stand-in for real media bytes).
    */
  def mm01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaIn]
    media.mapPartitions(decodeBatches).toDF().orderBy("doc_id")
  }

  val mm01Sql: String =
    """SELECT doc_id,
      |       CASE WHEN doc_id % 2 = 0 THEN 'image/png' ELSE 'image/jpeg' END AS mime,
      |       octet_length(encode(text)) AS n_bytes,
      |       md5(text) AS content_md5,
      |       CAST(CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) % 1920 + 1 AS INT) AS width,
      |       CAST(CAST(concat('0x', substr(md5(text), 16, 15)) AS BIGINT) % 1080 + 1 AS INT) AS height,
      |       CAST(doc_id % 3 + 1 AS INT) AS channels,
      |       (CAST(concat('0x', substr(md5(text), 1, 15)) AS BIGINT) % 1920 + 1)
      |         * (CAST(concat('0x', substr(md5(text), 16, 15)) AS BIGINT) % 1080 + 1)
      |         * (doc_id % 3 + 1) AS n_pixels
      |FROM documents ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------- mm02
  /** Frame sampling: every 10th frame of an (n_chars mod 240)+1-frame
    * clip, one output row per sampled frame with a per-frame content
    * hash — the generator/explode shape of video pipelines. Map-side
    * only: sequence+explode never shuffles.
    */
  def mm02(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("n_frames", (col("n_chars") % 240 + 1).cast("int"))
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(10))).as("frame_idx"))
      .withColumn("frame_hash",
        Dedup.h60(concat(col("doc_id").cast("string"), lit(":"), col("frame_idx").cast("string"))))
      .orderBy("doc_id", "frame_idx")

  val mm02Sql: String =
    """WITH f AS (
      |  SELECT doc_id, CAST(n_chars % 240 + 1 AS INT) AS n_frames,
      |         unnest(range(0, CAST(n_chars % 240 + 1 AS INT), 10)) AS frame_idx
      |  FROM documents)
      |SELECT doc_id, n_frames, CAST(frame_idx AS INT) AS frame_idx,
      |       CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(frame_idx AS VARCHAR)), 1, 15)) AS BIGINT) AS frame_hash
      |FROM f ORDER BY doc_id, frame_idx""".stripMargin

  /** Registry of this family. */
  val qs: Seq[Q] = Seq(
    Q("mm01_media_decode_meta", "binary payload → batched typed decode (stub codec)", mm01, Some(mm01Sql)),
    Q("mm02_frame_sample", "every-10th-frame sampling with per-frame hash", mm02, Some(mm02Sql)),
  )
}
