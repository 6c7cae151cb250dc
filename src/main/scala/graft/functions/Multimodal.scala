package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata; decode / feature-extract /
  * frame-sample run as partition-local typed transformations.
  *
  * The actual media decode is a STUB (no codec libraries ship in this
  * environment): `decodeFrame` below is a deterministic fake standing in
  * for e.g. an image decoder. Everything around it — the schema contract,
  * the `Dataset`-typed mapPartitions shape, batch-at-a-time iteration,
  * partition-preserving parallelism — is the real, tested Spark-side
  * plumbing a production decoder would drop into.
  */
object Multimodal {

  /** One sampled "frame" of a media payload. */
  final case class Frame(doc_id: Long, frame_idx: Int, byte_off: Int,
                         frame_len: Int, frame_hash: Long)

  /** STUB media decode: a real implementation would decode the window
    * into pixels/samples; the stand-in is a deterministic 60-bit
    * md5-derived value over the frame's bytes — the same portable-hash
    * construction as [[graft.analytics.Hashing.h60]], so the DRIVER'S
    * DuckDB oracle can recompute every frame hash and mm02 is
    * value-checked end-to-end rather than rows-only.
    */
  private def decodeFrame(bytes: Array[Byte], off: Int, len: Int): Long = {
    val end = math.min(off + len, bytes.length)
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(java.util.Arrays.copyOfRange(bytes, off, end))
    // hex chars 1-8 (bytes 0-3) = low 32 bits; chars 9-15 = high 28 bits
    val lo = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    val hi = ((d(4) & 0xffL) << 20) | ((d(5) & 0xffL) << 12) |
      ((d(6) & 0xffL) << 4) | ((d(7) & 0xffL) >>> 4)
    (hi << 32) | lo
  }

  /** Sample fixed-size frames from a binary media column at a byte
    * stride. Input: (doc_id, media binary). Output: one row per frame.
    * Partition-local — no shuffle; scales linearly with input bytes.
    */
  def sampleFrames(media: DataFrame, frameLen: Int = 64,
                   stride: Int = 256): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("media").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          if (bytes == null || bytes.isEmpty) Iterator.empty
          else (0 until bytes.length by stride).iterator.zipWithIndex.map {
            case (off, idx) =>
              val len = math.min(frameLen, bytes.length - off)
              Frame(id, idx, off, len, decodeFrame(bytes, off, len))
          }
        }
      }
  }

  /** One extracted feature vector per frame (4 stub dims in [0, 1)). */
  final case class FrameFeature(doc_id: Long, frame_idx: Int,
                                f0: Double, f1: Double, f2: Double, f3: Double)

  /** STUB feature extraction over a RESIZED frame: a real implementation
    * decodes the frame and runs a vision/audio featurizer; the stand-in
    * (a) downsamples the frame by `resample` (every k-th byte — the
    * resize/frame-subsampling plumbing), then (b) derives 4 dims in
    * [0, 1) from 16-bit md5 chunks of the downsampled bytes — portable,
    * so the DuckDB oracle recomputes every dim exactly (k/65536 is an
    * exact binary fraction). Partition-local, batch-at-a-time — the
    * production mapPartitions shape a real model drops into.
    */
  def extractFeatures(media: DataFrame, frameLen: Int = 64,
                      stride: Int = 256, resample: Int = 2): Dataset[FrameFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id").cast("long"), col("media").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, bytes) =>
          if (bytes == null || bytes.isEmpty) Iterator.empty
          else (0 until bytes.length by stride).iterator.zipWithIndex.map {
            case (off, idx) =>
              val end = math.min(off + frameLen, bytes.length)
              val small = (off until end by resample).map(bytes(_)).toArray
              val d = md.digest(small)
              def dim(j: Int): Double =
                (((d(2 * j) & 0xff) << 8) | (d(2 * j + 1) & 0xff)) / 65536.0
              FrameFeature(id, idx, dim(0), dim(1), dim(2), dim(3))
          }
        }
      }
  }

  /** Query entry: per-doc mean feature vector over resampled frames —
    * the decode → resize → featurize → aggregate pipeline end-to-end.
    */
  def frameFeatureQuery(s: SparkSession, d: String): DataFrame = {
    val docs = s.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("media"))
    extractFeatures(docs).toDF()
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        round(avg(col("f0")), 4).as("f0"), round(avg(col("f1")), 4).as("f1"),
        round(avg(col("f2")), 4).as("f2"), round(avg(col("f3")), 4).as("f3"))
  }

  /** Query entry: treat document text bytes as the opaque media payload
    * (the container ships no real media), sample frames, aggregate
    * per-doc frame stats. Demonstrates binary column → typed frames →
    * relational result.
    */
  def frameExtractQuery(s: SparkSession, d: String): DataFrame = {
    val docs = s.read.parquet(s"$d/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("media"))
    sampleFrames(docs).toDF()
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        max(col("byte_off")).as("last_off"),
        // xor-fold of frame hashes: order-insensitive content signature
        expr("bit_xor(frame_hash)").as("sig"))
  }
}
