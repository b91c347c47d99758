package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media payloads are
  * opaque `binary` columns with typed metadata; decode / feature-extract /
  * resize / frame-sample run as batched partition-local kernels
  * (`mapPartitions` — the JVM analogue of mapInPandas batches).
  *
  * The DECODE STEP IS A STUB: this container has no image/audio codecs, so
  * `decodeStub` derives a deterministic fake raster from the payload bytes.
  * Everything around it — schema, batch shape, partition locality, feature
  * extraction over the decoded batch — is real and tested; swapping in a
  * codec (e.g. TwelveMonkeys/JavaCV) only replaces `decodeStub`'s body.
  */
object Multimodal {

  final case class MediaRow(mediaId: Long, kind: String, content: Array[Byte],
      declaredWidth: Int, declaredHeight: Int)

  final case class MediaFeatures(mediaId: Long, kind: String, nBytes: Long,
      contentHash: Long, width: Int, height: Int, meanIntensity: Double)

  /** A decoded frame/raster (stub form). */
  final case class Decoded(width: Int, height: Int, pixels: Array[Byte])

  /** STUB decode: a real implementation calls the codec here. The fake is
    * deterministic in the payload: dimensions from byte length, "pixels" are
    * the payload bytes themselves.
    */
  def decodeStub(content: Array[Byte]): Decoded = {
    val w = math.max(1, math.sqrt(content.length.toDouble).toInt)
    val h = math.max(1, content.length / w)
    Decoded(w, h, content)
  }

  /** STUB resize: nearest-neighbor subsampling of the fake raster. */
  def resizeStub(d: Decoded, targetW: Int, targetH: Int): Decoded = {
    val out = new Array[Byte](targetW * targetH)
    var i = 0
    while (i < out.length) {
      val srcIdx = ((i.toLong * d.pixels.length) / out.length).toInt
      out(i) = d.pixels(math.min(srcIdx, d.pixels.length - 1))
      i += 1
    }
    Decoded(targetW, targetH, out)
  }

  /** Frame sampling for video-ish payloads: fixed-size byte chunks, every
    * k-th kept with its original index — the single source of the sampling
    * semantics (frameSampleStub and frameFeatures both build on this, and
    * the q50 oracle mirrors it).
    */
  def sampleFrames(content: Array[Byte], frameBytes: Int,
      everyK: Int): Iterator[(Int, Array[Byte])] =
    content.grouped(frameBytes).zipWithIndex.collect {
      case (chunk, i) if i % everyK == 0 => (i, chunk)
    }

  /** STUB frame sampling (payload-only view of `sampleFrames`). */
  def frameSampleStub(content: Array[Byte], frameBytes: Int, everyK: Int): Seq[Array[Byte]] =
    sampleFrames(content, frameBytes, everyK).map(_._2).toSeq

  private val P = 2147483647L

  /** Mean unsigned-byte value without intermediate collections (the per-row
    * hot loop of both batch kernels).
    */
  def meanByte(bytes: Array[Byte]): Double = {
    if (bytes.isEmpty) return 0.0
    var acc = 0.0
    var i = 0
    while (i < bytes.length) { acc += (bytes(i) & 0xff); i += 1 }
    acc / bytes.length
  }

  /** 31-polynomial hash over payload bytes mod 2^31-1 — same arithmetic as
    * TextOps.fingerprint so an ASCII payload hashes identically.
    */
  def contentHash(bytes: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31L + (bytes(i) & 0xffL)) % P
      i += 1
    }
    acc
  }

  /** Batched feature extraction: decode + hash + mean intensity, processed in
    * fixed-size batches per partition (the mapInPandas batch shape) so a real
    * codec could amortize model/codec setup per batch.
    */
  def extractFeatures(ds: Dataset[MediaRow], batchSize: Int = 64): Dataset[MediaFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch setup would init the codec/model here (once per batch)
        batch.iterator.map { m =>
          val d = decodeStub(m.content)
          MediaFeatures(m.mediaId, m.kind, m.content.length.toLong,
            contentHash(m.content), d.width, d.height, meanByte(d.pixels))
        }
      }
    }
  }

  final case class FrameFeatures(mediaId: Long, frameIdx: Int, nBytes: Long,
      contentHash: Long, meanIntensity: Double)

  /** Per-frame features for video-ish payloads: fixed-size byte frames,
    * every k-th sampled (this chunking is REAL raw-buffer logic, not part of
    * the codec stub), each hashed + mean-intensity'd. One narrow flatMap —
    * no shuffle; frames never materialize outside their partition.
    */
  def frameFeatures(ds: Dataset[MediaRow], frameBytes: Int,
      everyK: Int): Dataset[FrameFeatures] = {
    import ds.sparkSession.implicits._
    ds.flatMap { m =>
      sampleFrames(m.content, frameBytes, everyK).map { case (i, chunk) =>
        FrameFeatures(m.mediaId, i, chunk.length.toLong, contentHash(chunk), meanByte(chunk))
      }
    }
  }

  /** Wrap the documents table as a fake media corpus (payload = UTF-8 text
    * bytes) to exercise the plumbing on real data. NOTE: features here are
    * BYTE-based while the q26 oracle iterates characters — equivalent for the
    * ASCII corpus; a multi-byte corpus needs a byte-iterating oracle.
    */
  def mediaFromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(
        col("doc_id").as("mediaId"),
        concat(lit("image/"), col("source")).as("kind"),
        col("text").cast("binary").as("content"),
        lit(0).as("declaredWidth"), lit(0).as("declaredHeight"))
      .as[MediaRow]
  }
}
