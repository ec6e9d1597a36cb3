package graft.operators

import graft.Tables._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, decoded by a per-partition batch decoder.
  *
  * The container has no image/audio codecs, so the decoder is a
  * clearly-marked deterministic stub (dimensions derived from the
  * payload's SHA-256), but the Spark-side plumbing is real: a typed
  * Dataset[MediaRow], mapPartitions batch iteration (the same shape a
  * Pandas-UDF/Arrow decode batch has — amortized per-partition setup, one
  * row group in flight), and a schema that carries binary + struct
  * metadata. The oracle recomputes the metadata arithmetic in SQL, proving
  * the partition-batch path is byte-faithful end to end.
  */
object Multimodal {

  /** Raw media record: payload bytes + routing metadata. */
  final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** Decoded record: metadata a real decoder would emit. */
  final case class DecodedMedia(
    doc_id: Long, media_type: String, n_bytes: Long, sha_hex: String,
    width: Long, height: Long, n_frames: Long)

  /** STUB DECODER — stands in for the image/audio codec that is not in
    * this container. Deterministic: "decodes" dimensions from the SHA-256
    * digest; a real deployment swaps `decodeBatch` for the codec call and
    * nothing else changes. */
  def decodeBatch(rows: Iterator[MediaRow]): Iterator[DecodedMedia] = {
    // per-partition (per-batch) setup happens once, like a codec context
    val md = java.security.MessageDigest.getInstance("SHA-256")
    rows.map { r =>
      md.reset()
      val digest = md.digest(r.payload)
      val hex = digest.map(b => f"${b & 0xff}%02x").mkString
      val w = (digest(0) & 0xff).toLong % 640L + 16L
      val h = (digest(1) & 0xff).toLong % 480L + 16L
      val frames = if (r.media_type == "video") r.payload.length.toLong % 30L + 1L else 1L
      DecodedMedia(r.doc_id, r.media_type, r.payload.length.toLong, hex, w, h, frames)
    }
  }

  /** Build the media table (text bytes standing in for media payloads),
    * push it through the typed partition-batch decode, return the decoded
    * metadata. Partitioning note: decode cost is per-byte, so at scale the
    * input is repartitioned by size (`maxPartitionBytes`), not row count —
    * the mapPartitions pipeline preserves whatever partitioning the scan
    * chose and adds no shuffle. */
  def multimodalMeta(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val media: Dataset[MediaRow] = documents(s, d)
      .repartition(col("doc_id")) // decode is compute-bound: spread rows across cores
      .select(
        col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
    media.mapPartitions(decodeBatch _).toDF()
  }

  /** Frame sampling: explode each video payload into every-5th-frame
    * sample rows with deterministic byte offsets — the row-multiplying
    * half of a decode pipeline (the decode itself stays in decodeBatch).
    * Non-video media contributes its single frame 0. */
  def multimodalFrames(s: SparkSession, d: String): DataFrame =
    multimodalMeta(s, d)
      .select(col("doc_id"), col("media_type"), col("n_bytes"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(5L))).as("frame_idx"))
      .select(col("doc_id"), col("media_type"), col("frame_idx"),
        // integer DIV, matching the oracle's `//` exactly (no double round-trip)
        (col("frame_idx") * expr("n_bytes DIV greatest(n_frames, 1)"))
          .cast("long").as("byte_offset"))

  def multimodalFramesOracle: String = """
    WITH meta AS (
      SELECT doc_id,
        CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
        CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        CAST(CASE WHEN doc_id % 3 = 2 THEN octet_length(encode(text)) % 30 + 1 ELSE 1 END AS BIGINT) AS n_frames
      FROM documents)
    SELECT doc_id, media_type,
           CAST(f.frame_idx AS BIGINT) AS frame_idx,
           CAST(f.frame_idx * (n_bytes // greatest(n_frames, 1)) AS BIGINT) AS byte_offset
    FROM meta, unnest(range(0, n_frames, 5)) AS f(frame_idx)"""

  /** Exact media dedup: one row per distinct payload digest with the
    * copy count, keeper (min doc id), and TOTAL payload bytes across all
    * copies (reclaimable space = total − one copy) — the
    * binary-column face of `dedup_exact`, composed THROUGH the typed
    * partition-batch decode (the hash comes out of decodeBatch, not a
    * second scan), then one hash-shuffle on the digest. At 100 TB the
    * digest is 32 bytes/row — the shuffle carries fingerprints, never
    * payloads. */
  def multimodalDedup(s: SparkSession, d: String): DataFrame =
    multimodalMeta(s, d)
      .groupBy(col("sha_hex").as("content_hash"))
      .agg(
        count(lit(1)).as("n_copies"),
        min(col("doc_id")).as("keeper_id"),
        sum(col("n_bytes")).as("total_bytes"))

  def multimodalDedupOracle: String = """
    SELECT sha256(text) AS content_hash,
      count(*) AS n_copies,
      min(doc_id) AS keeper_id,
      CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes
    FROM documents GROUP BY 1"""

  def multimodalMetaOracle: String = """
    SELECT doc_id,
      CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
      CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      sha256(text) AS sha_hex,
      CAST(CAST('0x' || substr(sha256(text), 1, 2) AS INT) % 640 + 16 AS BIGINT) AS width,
      CAST(CAST('0x' || substr(sha256(text), 3, 2) AS INT) % 480 + 16 AS BIGINT) AS height,
      CAST(CASE WHEN doc_id % 3 = 2 THEN octet_length(encode(text)) % 30 + 1 ELSE 1 END AS BIGINT) AS n_frames
    FROM documents"""
}
