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

  /** Inject PNG `tEXt` metadata chunks immediately after IHDR — spec-
    * correct splicing (length/type/data/CRC32 over type+data), so any
    * standards-compliant reader sees the keys. IHDR is mandatory-first
    * with a fixed 13-byte body, so the insertion point is signature(8) +
    * IHDR chunk(25) = 33.
    */
  def injectPngText(png: Array[Byte], kv: Seq[(String, String)]): Array[Byte] = {
    require(png.length > 33, "not a PNG")
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val t = typ.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32()
      crc.reset(); crc.update(t); crc.update(data)
      val bb = java.nio.ByteBuffer.allocate(12 + data.length)
      bb.putInt(data.length); bb.put(t); bb.put(data)
      bb.putInt(crc.getValue.toInt)
      bb.array()
    }
    val chunks = kv.toArray.flatMap { case (k, v) =>
      chunk("tEXt", (k + "\u0000" + v).getBytes("ISO-8859-1"))
    }
    png.take(33) ++ chunks ++ png.drop(33)
  }

  /** Walk the PNG chunk stream and return every `tEXt` key→value pair,
    * VERIFYING each chunk's CRC — a corrupted splice fails loudly rather
    * than silently dropping metadata.
    */
  def extractPngText(png: Array[Byte]): Seq[(String, String)] = {
    val bb = java.nio.ByteBuffer.wrap(png)
    bb.position(8)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    while (bb.remaining() >= 12) {
      val len = bb.getInt
      val typ = new Array[Byte](4); bb.get(typ)
      val data = new Array[Byte](len); bb.get(data)
      val crcStored = bb.getInt
      val crc = new java.util.zip.CRC32()
      crc.update(typ); crc.update(data)
      require(crc.getValue.toInt == crcStored,
        s"PNG chunk CRC mismatch in ${new String(typ, "US-ASCII")}")
      if (new String(typ, "US-ASCII") == "tEXt") {
        val s = new String(data, "ISO-8859-1")
        val i = s.indexOf('\u0000')
        out += ((s.substring(0, i), s.substring(i + 1)))
      }
    }
    out.toSeq
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

  // ------------------------------------------------------------------
  // REAL video: RIFF/AVI container, lossless PNG frames.
  //
  // No bare JVM ships a video *codec*, but a video FILE is a container
  // (demux) around per-frame payloads (decode) — and both halves exist in
  // pure JDK once the frame codec is lossless: the container below is a
  // spec-correct RIFF AVI ('avih'/'strh'/'strf' headers, 'movi' chunk
  // list) whose frames are genuine PNG bytes, and the demuxer is a
  // GENERIC RIFF chunk walker (handles nested 'rec ' LISTs, odd-size
  // padding, header/frame cross-checks) feeding each '00dc' payload to
  // the same ImageIO codec as the still-image path.
  // ------------------------------------------------------------------

  /** A decoded video: header dims + frames in stream order. */
  final case class VideoDecoded(width: Int, height: Int, frames: Seq[Decoded])

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Spec-correct RIFF AVI container around PNG-encoded frames (fourcc
    * MPNG): RIFF('AVI ') → LIST('hdrl'){avih, LIST('strl'){strh, strf}} →
    * LIST('movi'){'00dc' × frames}. Little-endian sizes, odd chunks padded
    * — what any third-party RIFF parser expects.
    */
  def encodeAvi(w: Int, h: Int, pngFrames: Seq[Array[Byte]]): Array[Byte] = {
    val bo = java.nio.ByteOrder.LITTLE_ENDIAN
    def le32(v: Int): Array[Byte] =
      java.nio.ByteBuffer.allocate(4).order(bo).putInt(v).array()
    def le16(v: Int): Array[Byte] =
      java.nio.ByteBuffer.allocate(2).order(bo).putShort(v.toShort).array()
    def chunk(id: String, body: Array[Byte]): Array[Byte] = {
      val pad = if (body.length % 2 == 1) Array[Byte](0) else Array.empty[Byte]
      fourcc(id) ++ le32(body.length) ++ body ++ pad
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", fourcc(kind) ++ body)

    val avih = chunk("avih",
      le32(66666) ++ le32(0) ++ le32(0) ++ le32(0) ++      // usPerFrame, maxBps, pad, flags
      le32(pngFrames.length) ++ le32(0) ++ le32(1) ++ le32(0) ++ // totalFrames, initial, streams, bufSize
      le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val strh = chunk("strh",
      fourcc("vids") ++ fourcc("MPNG") ++ le32(0) ++ le16(0) ++ le16(0) ++
      le32(0) ++ le32(1) ++ le32(15) ++ le32(0) ++          // initial, scale, rate, start
      le32(pngFrames.length) ++ le32(0) ++ le32(-1) ++ le32(0) ++ // length, bufSize, quality, sampleSize
      le16(0) ++ le16(0) ++ le16(w) ++ le16(h))             // rcFrame
    val strf = chunk("strf",
      le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(8) ++
      fourcc("MPNG") ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val hdrl = list("hdrl", avih ++ list("strl", strh ++ strf))
    val movi = list("movi", pngFrames.toArray.flatMap(f => chunk("00dc", f)))
    val body = fourcc("AVI ") ++ hdrl ++ movi
    fourcc("RIFF") ++ le32(body.length) ++ body
  }

  /** REAL demux + decode: generic RIFF walk (any chunk order, nested
    * 'rec ' LISTs inside 'movi', odd-size padding) collects the '00dc'
    * frame payloads and the 'avih' header dims, then ImageIO-decodes each
    * frame through the same codec as [[decodeImage]]. Frame dims are
    * cross-checked against the container header — a corrupt payload or a
    * header/frame mismatch throws rather than returning garbage.
    */
  def decodeVideo(content: Array[Byte]): VideoDecoded = {
    val buf = java.nio.ByteBuffer.wrap(content).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    require(buf.remaining >= 12 && tag() == "RIFF", "not a RIFF payload")
    val riffSize = buf.getInt
    require(riffSize == buf.remaining && tag() == "AVI ", "not an AVI container")

    var width = -1; var height = -1; var declaredFrames = -1
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]

    def walk(end: Int): Unit = {
      while (buf.position() < end) {
        val id = tag(); val size = buf.getInt
        val next = buf.position() + size + (size % 2) // odd chunks are padded
        id match {
          case "LIST" => tag(); walk(buf.position() + size - 4 + (size % 2))
          case "avih" =>
            val us = buf.getInt; val _ = (us, buf.getInt, buf.getInt, buf.getInt)
            declaredFrames = buf.getInt
            buf.getInt; buf.getInt; buf.getInt
            width = buf.getInt; height = buf.getInt
          case "00dc" =>
            val payload = new Array[Byte](size); buf.get(payload); frames += payload
          case _ => // strh/strf/idx1/junk: header already carries what we need
        }
        buf.position(next)
      }
    }
    walk(buf.limit())
    require(width > 0 && height > 0, "missing avih header")
    require(declaredFrames == frames.length,
      s"header declares $declaredFrames frames, container carries ${frames.length}")
    val decoded = frames.map(decodeImage).toSeq
    decoded.foreach { d =>
      require(d.width == width && d.height == height,
        s"frame ${d.width}x${d.height} != header ${width}x$height")
    }
    VideoDecoded(width, height, decoded)
  }

  /** The REAL-codec video corpus: one genuine AVI per document — dims
    * w = 16 + id mod 8, h = 12 + id mod 4, frame count 3 + id mod 4; frame
    * f encodes [[synthRaster]] with seed id + 100003·(f+1), so every pixel
    * of every frame is predictable codec-free while the payload is honest
    * container + compressed-PNG bytes.
    */
  def synthVideoCorpus(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].map { id =>
      val w = 16 + (id % 8).toInt
      val h = 12 + (id % 4).toInt
      val n = 3 + (id % 4).toInt
      val pngs = (0 until n).map(f => encodePng(w, h, synthRaster(id + 100003L * (f + 1), w, h)))
      MediaRow(id, "video/avi", encodeAvi(w, h, pngs), w, h)
    }
  }

  final case class VideoFeatures(mediaId: Long, nFrames: Int, width: Int,
      height: Int, nPixels: Long, sumPix: Long, frameMoment: Long,
      motionAbs: Long, meanMilli: Long)

  /** Synthetic video corpus WITH SHOT STRUCTURE (for boundary-detection
    * ops): each video has one hard cut at frame `1 + id mod (n−1)`.
    * Frames within a shot share a base raster (`synthRaster` of the shot
    * seed — shot 0 seeds `id`, shot 1 `id + 777777`) with a small
    * deterministic per-frame jitter: pixel i is re-valued to
    * (base + f) mod 256 only where (i + 40503·f) mod 29 = 0, so
    * within-shot motion is ~|pixels|/29 · small deltas while the cut's
    * motion is full-raster — the separation the keyframe rule keys on.
    * The payload is honest: rasters go through the real PNG encoder and
    * the spec-correct AVI muxer, and consumers re-decode them.
    */
  def synthShotVideoCorpus(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].map { id =>
      val w = 16 + (id % 8).toInt
      val h = 12 + (id % 4).toInt
      val n = 4 + (id % 3).toInt
      val cut = 1 + (id % (n - 1)).toInt
      val pngs = (0 until n).map { f =>
        val shotSeed = if (f >= cut) id + 777777L else id
        val base = synthRaster(shotSeed, w, h)
        val px = base.clone()
        var i = 0
        while (i < px.length) {
          if ((i + 40503L * f) % 29 == 0)
            px(i) = (((px(i) & 0xff) + f) % 256).toByte
          i += 1
        }
        encodePng(w, h, px)
      }
      MediaRow(id, "video/avi", encodeAvi(w, h, pngs), w, h)
    }
  }

  final case class FrameMotion(mediaId: Long, frameIdx: Int, sumPix: Long,
      motionAbs: Long)

  /** Per-FRAME decode features (the grain shot-boundary detection needs;
    * [[videoFeatures]] reduces to one row per video): frame pixel sum and
    * absolute motion vs the previous frame (0 for frame 0). Same batched
    * partition-local kernel discipline.
    */
  def videoFrameMotion(ds: Dataset[MediaRow],
      batchSize: Int = 64): Dataset[FrameMotion] = {
    import ds.sparkSession.implicits._
    ds.flatMap { m =>
      val v = decodeVideo(m.content)
      (0 until v.frames.length).map { f =>
        val px = v.frames(f).pixels
        val prev = if (f > 0) v.frames(f - 1).pixels else null
        var sum = 0L; var motion = 0L
        var i = 0
        while (i < px.length) {
          sum += px(i) & 0xff
          if (prev != null) motion += math.abs((px(i) & 0xff) - (prev(i) & 0xff)).toLong
          i += 1
        }
        FrameMotion(m.mediaId, f, sum, motion)
      }
    }
  }

  /** Batched REAL video demux + decode + exact integer features: total
    * pixel count/sum, the frame moment Σ f·pixel (frame-ORDER-sensitive —
    * a demuxer that reorders or drops frames breaks it), and total
    * absolute motion Σ|frame_f − frame_{f−1}| per pixel (sensitive to
    * frame alignment AND pixel layout). Narrow, batch-amortized like
    * [[imageFeatures]].
    */
  def videoFeatures(ds: Dataset[MediaRow], batchSize: Int = 64): Dataset[VideoFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { m =>
          val v = decodeVideo(m.content)
          var sum = 0L; var fMoment = 0L; var motion = 0L
          var f = 0
          while (f < v.frames.length) {
            val px = v.frames(f).pixels
            val prev = if (f > 0) v.frames(f - 1).pixels else null
            var i = 0
            while (i < px.length) {
              val b = px(i) & 0xff
              sum += b; fMoment += f.toLong * b
              if (prev != null) motion += math.abs(b - (prev(i) & 0xff)).toLong
              i += 1
            }
            f += 1
          }
          val n = v.frames.length.toLong * v.width * v.height
          VideoFeatures(m.mediaId, v.frames.length, v.width, v.height, n, sum,
            fMoment, motion, if (n == 0) 0L else 1000L * sum / n)
        }
      }
    }
  }

  /** STUB decode: retained as the test double for payloads that are not
    * real media (e.g. the documents-as-bytes corpus). The fake is
    * deterministic in the payload: dimensions from byte length, "pixels"
    * are the payload bytes themselves.
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

  /** REAL nearest-neighbor resize over a decoded raster: target pixel
    * (x, y) samples source (x·w div tw, y·h div th) — floor division, so
    * the mapping is exact integer arithmetic an engine without a codec
    * (the DuckDB oracle) replays verbatim. The real counterpart of
    * [[resizeStub]].
    */
  def resizeNearest(d: Decoded, tw: Int, th: Int): Decoded = {
    val out = new Array[Byte](tw * th)
    var y = 0; var i = 0
    while (y < th) {
      val sy = y * d.height / th
      var x = 0
      while (x < tw) {
        out(i) = d.pixels(sy * d.width + (x * d.width / tw))
        i += 1; x += 1
      }
      y += 1
    }
    Decoded(tw, th, out)
  }

  /** Decode (real codec) → [[resizeNearest]] to (tw, th) → exact integer
    * features of the RESIZED raster, the thumbnail/preprocess stage of an
    * image pipeline. Same narrow batched shape as [[imageFeatures]].
    */
  def imageResizeFeatures(ds: Dataset[MediaRow], tw: Int, th: Int,
      batchSize: Int = 64): Dataset[ImageFeatures] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { m =>
          val dec = resizeNearest(decodeImage(m.content), tw, th)
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

  /** Corpus with PLANTED perceptual near-duplicates: each group of
    * `variants` consecutive ids shares one base raster (dims and noise
    * seeded by `id div variants`) and differs only by a small uniform
    * brightness offset (`7·(id mod variants)`, clamped at 255) — the
    * re-encoded-with-different-exposure duplicate class an image dedup
    * stage must catch. PNG-encoded, so the detection pipeline exercises
    * the REAL codec path end to end.
    */
  def synthVariantImageCorpus(docs: DataFrame, variants: Int = 4): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].map { id =>
      val base = id / variants
      val delta = (id % variants) * 7L
      val w = 16 + (base % 16).toInt
      val h = 12 + (base % 8).toInt
      val px = synthRaster(base, w, h)
      var i = 0
      while (i < px.length) {
        px(i) = math.min((px(i) & 0xff) + delta, 255L).toByte
        i += 1
      }
      MediaRow(id, "image/png", encodePng(w, h, px), w, h)
    }
  }

  final case class AHash(mediaId: Long, lo: Long, hi: Long)

  /** 64-bit average hash (aHash) of each image: real decode →
    * [[resizeNearest]] to 8×8 → bit j set iff 64·p_j > Σp (the integer
    * spelling of p_j > mean, no division rounding). Emitted as two 32-bit
    * halves so the packed value never touches the sign bit and XOR/
    * popcount hamming stays exact in both engines. A uniform brightness
    * shift moves every pixel AND the mean together, so variants hash to
    * (near-)identical codes — the invariance perceptual dedup relies on.
    */
  def imageAHash(ds: Dataset[MediaRow], batchSize: Int = 64): Dataset[AHash] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { m =>
          val dec = resizeNearest(decodeImage(m.content), 8, 8)
          var sum = 0L
          var j = 0
          while (j < 64) { sum += (dec.pixels(j) & 0xff); j += 1 }
          var lo = 0L; var hi = 0L
          j = 0
          while (j < 64) {
            if (64L * (dec.pixels(j) & 0xff) > sum) {
              if (j < 32) lo |= 1L << j else hi |= 1L << (j - 32)
            }
            j += 1
          }
          AHash(m.mediaId, lo, hi)
        }
      }
    }
  }

  /** Audio analogue of [[synthVariantImageCorpus]]: groups of 4
    * consecutive ids share one base PCM track (length and noise seeded by
    * `id div 4`) and differ only by a uniform gain offset (+5·variant).
    * Base samples are compressed into [0, 240) so the max offset (15)
    * NEVER clamps — a clamp is a nonlinearity that would perturb
    * Walsh-Hadamard coefficients near zero; headroom keeps the gain shift
    * exactly linear, so the DC-excluded fingerprint is exactly invariant.
    */
  def synthVariantAudioCorpus(docs: DataFrame, variants: Int = 4): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").cast("long")).as[Long].map { id =>
      val base = id / variants
      val delta = (id % variants) * 5L
      val n = 256 + 8 * (base % 96).toInt
      val s = new Array[Byte](n)
      var i = 0
      while (i < n) {
        // base-dependent STRIDE, not just a base-dependent offset: an
        // affine seed only shifts the one global LCG sequence (mod-256
        // carry aside), which left every track a gain-shifted copy of
        // every other and collapsed cross-base fingerprints; the stride
        // makes tracks genuinely distinct signals
        s(i) = ((((base + 7777L) * 2654435761L +
          i.toLong * (40503L + 2L * base)) % 2147483648L)
          % 256L % 240L + delta).toByte
        i += 1
      }
      MediaRow(id, "audio/wav", encodeWav(s), n, 1)
    }
  }

  final case class AudioFp(mediaId: Long, fp: Long)

  /** 32-bit spectral fingerprint of each track: real WAV decode → Walsh-
    * Hadamard transform of the first 64 samples (the ±1 integer-exact
    * stand-in for the DFT a Shazam-style fingerprinter uses — sign of
    * coefficient k is `(−1)^popcount(k AND n)` weighting, so the whole
    * transform is integer arithmetic an engine without a codec replays
    * verbatim) → bit k ⟺ W_k > 0 for k = 1..32. Coefficient 0 (the DC
    * term) is EXCLUDED: a uniform gain shift moves only W_0, which is
    * precisely why the fingerprint collapses level-shifted duplicates.
    */
  def audioWhtFingerprint(ds: Dataset[MediaRow], batchSize: Int = 64): Dataset[AudioFp] = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { m =>
          val s = decodeAudio(m.content)
          var fp = 0L
          var k = 1
          while (k <= 32) {
            var w = 0L
            var n = 0
            while (n < 64) {
              val sign = if (java.lang.Integer.bitCount(k & n) % 2 == 0) 1L else -1L
              w += sign * (s(n) & 0xff)
              n += 1
            }
            if (w > 0) fp |= 1L << (k - 1)
            k += 1
          }
          AudioFp(m.mediaId, fp)
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
