package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) handling: media are opaque `binary`
  * columns with typed metadata; feature extraction runs batched per
  * partition. The Spark-side plumbing — schema, partition batching,
  * deterministic output contract — is real and tested; the actual codec
  * call is STUBBED (no image/audio libraries in this environment) behind
  * `decodeStub`, clearly marked below.
  *
  * Scale notes (100 TB): media bytes dominate row size, so the pipeline
  * (a) never shuffles the binary column — features are extracted in a
  * narrow mapPartitions pass and the payload dropped immediately after;
  * (b) keeps metadata in ordinary columns so filter pushdown (e.g.
  * media_type = 'image') prunes parquet scans before any byte is read.
  */
object Media {

  /** A media row: opaque payload + typed metadata. */
  case class MediaFile(
      media_id: Long,
      media_type: String, // 'image' | 'audio' | 'video'
      payload: Array[Byte],
      source: String)

  /** Extracted features — fixed schema, one row per media file. */
  case class MediaFeatures(
      media_id: Long,
      media_type: String,
      byte_len: Long,
      content_md5: String,
      width: Int, // STUB: deterministic placeholders, see decodeStub
      height: Int,
      n_frames: Int)

  /** ── STUB ──  The real implementation would decode the payload with an
    * image/audio codec (not present in this container) and return true
    * dimensions / frame counts. This stand-in derives DETERMINISTIC fake
    * dimensions from the byte length so the batching, schema, and
    * downstream plumbing are fully exercisable and oracle-checkable.
    */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Int) = {
    val n = bytes.length
    (n % 640, (n * 7) % 480, n % 32)
  }

  private def md5Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes)
      .map(b => f"$b%02x").mkString

  /** Batched feature extraction: one codec context per PARTITION (the
    * shape a real decoder needs — model/codec init is expensive), rows
    * streamed through it. Narrow: no shuffle, payload dropped on output.
    */
  def extractFeatures(media: Dataset[MediaFile]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real impl: open codec/session once per partition here
      it.map { m =>
        val (w, h, f) = decodeStub(m.payload)
        MediaFeatures(m.media_id, m.media_type, m.payload.length.toLong,
          md5Hex(m.payload), w, h, f)
      }
    }
  }

  /** A 64-bit perceptual hash per media file. */
  case class MediaHash(media_id: Long, phash: Long)

  /** Perceptual hash (aHash shape): sample 64 "pixels", set bit i when
    * pixel i exceeds the integer mean — near-identical media differ in
    * few bits, so near-dup search is a hamming band join
    * (TextDedup.hammingBandPairs), never n² over payloads.
    *
    * ── STUB ── a real implementation decodes, grayscales, and 8×8
    * downsamples; no codecs exist in this container, so the "pixels" are
    * the payload bytes at 64 evenly spaced offsets — deterministic and
    * oracle-checkable, with the real narrow-pass plumbing around it.
    * Integer-only arithmetic end to end (offsets, mean, comparison), so
    * both engines compute identical bits.
    */
  def perceptualHash(media: Dataset[MediaFile]): Dataset[MediaHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { m =>
        val n = m.payload.length
        if (n == 0) MediaHash(m.media_id, 0L)
        else {
          // Long arithmetic: i*(n-1) overflows Int for payloads > ~34 MB
          val px = Array.tabulate(64)(i => m.payload((i.toLong * (n - 1) / 63).toInt) & 0xFF)
          val avg = px.map(_.toLong).sum / 64
          var h = 0L
          var i = 0
          while (i < 64) { if (px(i) > avg) h |= (1L << i); i += 1 }
          MediaHash(m.media_id, h)
        }
      }
    }
  }

  /** One sampled frame of a media payload. */
  case class MediaFrame(
      media_id: Long,
      frame_idx: Int,
      frame_len: Int,
      frame_md5: String)

  /** Frame sampling: slice the payload into fixed-size frames, keep every
    * `stride`-th one — the video-keyframe / audio-window batch shape. A
    * real decoder would emit decoded frames; the stub emits the raw byte
    * slice's length + hash (deterministic, oracle-checkable). Narrow
    * mapPartitions: frames never shuffle, payload dropped on output.
    */
  def frameSample(media: Dataset[MediaFile], frameSize: Int, stride: Int): Dataset[MediaFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        val n = m.payload.length
        val nFrames = n / frameSize // trailing partial frame dropped
        (0 until nFrames by stride).iterator.map { i =>
          val slice = java.util.Arrays.copyOfRange(m.payload, i * frameSize, (i + 1) * frameSize)
          MediaFrame(m.media_id, i, frameSize, md5Hex(slice))
        }
      }
    }
  }

  /** Adapt the synthetic documents table into media rows (text bytes as
    * the opaque payload) — exercises the binary column path end-to-end
    * against real testdata.
    */
  def documentsAsMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaFile] = {
    import spark.implicits._
    graft.operators.Par.fan(docs).select(
        col("doc_id").cast(LongType).as("media_id"),
        when(col("doc_id") % 3 === 0, lit("image"))
          .when(col("doc_id") % 3 === 1, lit("audio"))
          .otherwise(lit("video")).as("media_type"),
        col("text").cast(BinaryType).as("payload"),
        col("source"))
      .as[MediaFile]
  }
}
