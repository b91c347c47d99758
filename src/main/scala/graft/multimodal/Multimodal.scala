package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media payloads are
  * opaque `binary` columns with typed metadata; decode / feature-extract /
  * resize / frame-sample run as batched partition-local kernels
  * (`mapPartitions` — the JVM analogue of mapInPandas batches).
  *
  * The IMAGE PATH DECODES FOR REAL: [[decodeImage]] reads PNG/BMP payloads
  * through the JDK's own `javax.imageio` codecs (no external dependency),
  * and [[imageFeatures]] is the oracled pipeline over genuine encoded bytes
  * — the corpus payloads are real PNGs synthesized from a deterministic,
  * SQL-expressible raster formula, so DuckDB can predict every decoded
  * pixel without running a codec. `decodeStub` remains only as the test
  * double for payloads with no codec in this container (audio/video).
  */
object Multimodal {

  final case class MediaRow(mediaId: Long, kind: String, content: Array[Byte],
      declaredWidth: Int, declaredHeight: Int)

  final case class MediaFeatures(mediaId: Long, kind: String, nBytes: Long,
      contentHash: Long, width: Int, height: Int, meanIntensity: Double)

  /** A decoded frame/raster (stub form). */
  final case class Decoded(width: Int, height: Int, pixels: Array[Byte])

  /** REAL decode via the JDK's ImageIO codecs (PNG, BMP, GIF, JPEG ship
    * with every JRE): payload bytes → 8-bit grayscale raster in row-major
    * order. Lossless formats (PNG/BMP) round-trip [[encodePng]] exactly.
    */
  def decodeImage(content: Array[Byte]): Decoded = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
    require(img != null, "payload is not a decodable image")
    val w = img.getWidth; val h = img.getHeight
    val out = new Array[Byte](w * h)
    val raster = img.getRaster
    var y = 0; var i = 0
    while (y < h) {
      var x = 0
      while (x < w) { out(i) = raster.getSample(x, y, 0).toByte; i += 1; x += 1 }
      y += 1
    }
    Decoded(w, h, out)
  }

  /** REAL encode: 8-bit grayscale raster → PNG bytes through the JDK codec. */
  def encodePng(w: Int, h: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == w * h, s"raster ${pixels.length} != $w x $h")
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    img.getRaster.setDataElements(0, 0, w, h, pixels)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic synthetic raster: pixel i of image `seed` is
    * `((seed·2654435761 + i·40503) mod 2^31) mod 256` — position-hashed
    * (no sequential recurrence), so an engine without a codec (the DuckDB
    * oracle) reproduces every pixel with plain integer arithmetic.
    */
  def synthRaster(seed: Long, w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h)
    var i = 0
    while (i < out.length) {
      out(i) = (((seed * 2654435761L + i.toLong * 40503L) % 2147483648L) % 256L).toByte
      i += 1
    }
    out
  }

  /** REAL audio decode via the JDK's `javax.sound.sampled` (WAV/PCM ships
    * with every JRE): payload bytes → unsigned 8-bit PCM samples. Lossless,
    * so [[encodeWav]] round-trips exactly.
    */
  def decodeAudio(content: Array[Byte]): Array[Byte] = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(content))
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  /** REAL encode: unsigned 8-bit PCM mono samples → WAV bytes through the
    * JDK codec (8 kHz — the rate is metadata; features are rate-free).
    */
  def encodeWav(samples: Array[Byte]): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED, 8000f, 8, 1,
      1, 8000f, false)
    val stream = new AudioInputStream(
      new java.io.ByteArrayInputStream(samples), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(stream, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** STUB decode: retained as the test double for media kinds with no JVM
    * codec in this container (video). The fake is deterministic in the
    * payload: dimensions from byte length, "pixels" are the payload bytes
    * themselves.
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

  final case class ImageFeatures(mediaId: Long, width: Int, height: Int,
      nPixels: Long, sumPix: Long, momentPix: Long, meanMilli: Long)

  /** The REAL-codec image corpus: one genuine PNG per document, encoding the
    * deterministic [[synthRaster]] (dims vary per id: w = 16 + id mod 16,
    * h = 12 + id mod 8). The payloads are honest compressed image bytes —
    * the downstream pipeline cannot shortcut around the codec.
    */
  def synthImageCorpus(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].map { id =>
      val w = 16 + (id % 16).toInt
      val h = 12 + (id % 8).toInt
      MediaRow(id, "image/png", encodePng(w, h, synthRaster(id, w, h)), w, h)
    }
  }

  /** Batched REAL decode + feature extraction: ImageIO-decode each PNG
    * payload, then exact integer features of the raster — pixel count, sum,
    * first positional moment Σ i·pixel_i (order-sensitive: any decoder
    * layout error breaks it), and mean intensity in exact milli units.
    * Narrow (no shuffle); codec state amortizes per batch like
    * [[extractFeatures]].
    */
  def imageFeatures(ds: Dataset[MediaRow], batchSize: Int = 64): Dataset[ImageFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { m =>
          val dec = decodeImage(m.content)
          var sum = 0L; var moment = 0L; var i = 0
          while (i < dec.pixels.length) {
            val b = dec.pixels(i) & 0xff
            sum += b; moment += i.toLong * b; i += 1
          }
          val n = dec.pixels.length.toLong
          ImageFeatures(m.mediaId, dec.width, dec.height, n, sum, moment,
            if (n == 0) 0L else 1000L * sum / n)
        }
      }
    }
  }

  final case class AudioFeatures(mediaId: Long, nSamples: Long, sumAmp: Long,
      momentAmp: Long, nMidCrossings: Long, meanMilli: Long)

  /** The REAL-codec audio corpus: one genuine WAV per document encoding the
    * deterministic [[synthRaster]] sample stream (length varies per id:
    * 256 + 8·(id mod 96) samples; seed offset 7777 decorrelates from the
    * image corpus).
    */
  def synthAudioCorpus(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].map { id =>
      val n = 256 + 8 * (id % 96).toInt
      MediaRow(id, "audio/wav", encodeWav(synthRaster(id + 7777L, n, 1)), n, 1)
    }
  }

  /** Batched REAL audio decode + exact integer features: sample count, sum,
    * positional moment, midpoint (128) crossings — the unsigned-PCM analog
    * of zero crossings, an order-sensitive signal shape check — and mean
    * amplitude in milli. Narrow, batch-amortized like [[imageFeatures]].
    */
  def audioFeatures(ds: Dataset[MediaRow], batchSize: Int = 64): Dataset[AudioFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { m =>
          val s = decodeAudio(m.content)
          var sum = 0L; var moment = 0L; var crossings = 0L; var i = 0
          while (i < s.length) {
            val a = s(i) & 0xff
            sum += a; moment += i.toLong * a
            if (i > 0) {
              val p = s(i - 1) & 0xff
              if ((p < 128 && a >= 128) || (p >= 128 && a < 128)) crossings += 1
            }
            i += 1
          }
          val n = s.length.toLong
          AudioFeatures(m.mediaId, n, sum, moment, crossings,
            if (n == 0) 0L else 1000L * sum / n)
        }
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
