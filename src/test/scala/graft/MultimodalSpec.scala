package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{Decoded, MediaRow}

/** Unit coverage for the multimodal batch kernels (the q26/q50 oracles check
  * the Spark plumbing; these pin the kernel functions themselves).
  */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("shot corpus: per-frame motion localizes the planted cut exactly") {
    import spark.implicits._
    val docs = Seq(5L, 12L, 31L).toDF("doc_id")
    val fm = Multimodal.videoFrameMotion(Multimodal.synthShotVideoCorpus(docs))
      .collect().groupBy(_.mediaId)
    for (id <- Seq(5L, 12L, 31L)) {
      val n = 4 + (id % 3).toInt
      val cut = 1 + (id % (n - 1)).toInt
      val frames = fm(id).sortBy(_.frameIdx)
      assert(frames.length == n)
      assert(frames.head.motionAbs == 0L)
      val total = frames.map(_.motionAbs).sum
      val keys = frames.filter(f => f.frameIdx == 0 || f.motionAbs * 2 >= total)
        .map(_.frameIdx).toList
      assert(keys == List(0, cut),
        s"video $id: keyframes $keys, expected List(0, $cut)")
    }
  }

  test("decodeStub dimensions cover the payload; resizeStub subsamples deterministically") {
    val bytes = (0 until 100).map(_.toByte).toArray
    val d = Multimodal.decodeStub(bytes)
    assert(d.width == 10 && d.height == 10 && (d.pixels sameElements bytes))
    val r = Multimodal.resizeStub(d, 5, 5)
    assert(r.width == 5 && r.height == 5 && r.pixels.length == 25)
    // nearest-neighbor: pixel i maps to floor(i * 100 / 25) = 4i
    assert(r.pixels.zipWithIndex.forall { case (p, i) => p == bytes(i * 4) })
    val up = Multimodal.resizeStub(Decoded(2, 1, Array[Byte](7, 9)), 4, 1)
    assert(up.pixels.toSeq == Seq[Byte](7, 7, 9, 9))
  }

  test("sampleFrames keeps every k-th chunk with its original index; tail chunk short") {
    val bytes = (0 until 25).map(_.toByte).toArray
    val frames = Multimodal.sampleFrames(bytes, frameBytes = 10, everyK = 2).toSeq
    assert(frames.map(_._1) == Seq(0, 2))
    assert(frames(0)._2.toSeq == (0 until 10).map(_.toByte))
    assert(frames(1)._2.toSeq == (20 until 25).map(_.toByte)) // short tail frame
    assert(Multimodal.sampleFrames(Array.empty[Byte], 10, 2).isEmpty)
  }

  test("documents corpus is pure ASCII (q26/q50 oracle equivalence guard)") {
    // mediaFromDocuments chunks UTF-8 BYTES while the DuckDB oracle slices
    // CHARACTERS (substr/ascii) — the two agree only when every character is
    // one byte. Guard the assumption at each scale factor the driver uses;
    // a multi-byte corpus must switch the oracle to a byte-iterating form
    // (documented at Multimodal.mediaFromDocuments).
    import org.apache.spark.sql.functions._
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val nonAscii = spark.read.parquet(s"/root/testdata/$sf/documents.parquet")
        .where(length(col("text")) =!= octet_length(col("text")))
        .count()
      assert(nonAscii == 0, s"$sf: $nonAscii docs with multi-byte chars — " +
        "q26/q50 character-based oracles no longer byte-equivalent")
    }
  }

  test("meanByte treats bytes as unsigned; extractFeatures batches preserve every row") {
    assert(Multimodal.meanByte(Array[Byte](-1, 1)) == 128.0) // 255 and 1
    assert(Multimodal.meanByte(Array.empty[Byte]) == 0.0)
    import spark.implicits._
    val rows = (0L until 150L).map(i =>
      MediaRow(i, "image/test", s"payload-$i".getBytes("UTF-8"), 0, 0))
    val feats = Multimodal.extractFeatures(spark.createDataset(rows), batchSize = 32)
      .collect()
    assert(feats.length == 150 && feats.map(_.mediaId).toSet == (0L until 150L).toSet)
    val f0 = feats.find(_.mediaId == 0L).get
    assert(f0.nBytes == "payload-0".length.toLong)
    assert(f0.contentHash == Multimodal.contentHash("payload-0".getBytes("UTF-8")))
  }

  test("real codec: PNG encode → ImageIO decode round-trips the raster exactly") {
    for (seed <- Seq(0L, 7L, 12345L)) {
      val w = 16 + (seed % 16).toInt; val h = 12 + (seed % 8).toInt
      val raster = Multimodal.synthRaster(seed, w, h)
      val png = Multimodal.encodePng(w, h, raster)
      // honest compressed image bytes, not a raw buffer in disguise
      assert(png.take(4).map(_ & 0xff).sameElements(Seq(0x89, 'P'.toInt, 'N'.toInt, 'G'.toInt)))
      val dec = Multimodal.decodeImage(png)
      assert(dec.width == w && dec.height == h)
      assert(dec.pixels.sameElements(raster), s"seed=$seed raster drift")
    }
  }

  test("real codec: WAV encode → javax.sound decode round-trips the samples exactly") {
    for (seed <- Seq(0L, 7L, 999L)) {
      val n = 256 + 8 * (seed % 96).toInt
      val samples = Multimodal.synthRaster(seed + 7777L, n, 1)
      val wav = Multimodal.encodeWav(samples)
      assert(new String(wav.take(4), "US-ASCII") == "RIFF" &&
        new String(wav.slice(8, 12), "US-ASCII") == "WAVE",
        "honest WAV container bytes")
      assert(Multimodal.decodeAudio(wav).sameElements(samples), s"seed=$seed drift")
    }
  }

  test("real codec: AVI encode → RIFF demux + ImageIO decode round-trips every frame") {
    for (seed <- Seq(0L, 5L, 4242L)) {
      val w = 16 + (seed % 8).toInt; val h = 12 + (seed % 4).toInt
      val n = 3 + (seed % 4).toInt
      val rasters = (0 until n).map(f => Multimodal.synthRaster(seed + 100003L * (f + 1), w, h))
      val avi = Multimodal.encodeAvi(w, h, rasters.map(Multimodal.encodePng(w, h, _)))
      // honest RIFF container bytes with the AVI form type
      assert(new String(avi.take(4), "US-ASCII") == "RIFF" &&
        new String(avi.slice(8, 12), "US-ASCII") == "AVI ")
      val dec = Multimodal.decodeVideo(avi)
      assert(dec.width == w && dec.height == h && dec.frames.length == n)
      for (f <- 0 until n)
        assert(dec.frames(f).pixels.sameElements(rasters(f)), s"seed=$seed frame=$f drift")
    }
  }

  test("decodeVideo rejects non-RIFF payloads and header/frame mismatches") {
    intercept[IllegalArgumentException] {
      Multimodal.decodeVideo("not a container at all".getBytes("US-ASCII"))
    }
    // a frame whose dims disagree with the avih header must throw, not pass
    val good = Multimodal.encodePng(4, 3, Multimodal.synthRaster(1L, 4, 3))
    val bad = Multimodal.encodeAvi(5, 3, Seq(good))
    intercept[IllegalArgumentException] { Multimodal.decodeVideo(bad) }
  }

  test("videoFeatures: decoded features match the codec-free prediction") {
    import spark.implicits._
    val docs = (0L until 24L).toDF("doc_id")
    val feats = Multimodal.videoFeatures(Multimodal.synthVideoCorpus(docs), batchSize = 8)
      .collect().sortBy(_.mediaId)
    assert(feats.length == 24)
    for (ft <- feats) {
      val w = 16 + (ft.mediaId % 8).toInt; val h = 12 + (ft.mediaId % 4).toInt
      val n = 3 + (ft.mediaId % 4).toInt
      val rasters = (0 until n).map(f =>
        Multimodal.synthRaster(ft.mediaId + 100003L * (f + 1), w, h).map(_ & 0xff))
      val sum = rasters.flatten.map(_.toLong).sum
      val fMoment = rasters.zipWithIndex.map { case (r, f) => f.toLong * r.map(_.toLong).sum }.sum
      val motion = (1 until n).map { f =>
        rasters(f).zip(rasters(f - 1)).map { case (a, b) => math.abs(a - b).toLong }.sum
      }.sum
      assert(ft.nFrames == n && ft.width == w && ft.height == h)
      assert(ft.nPixels == n.toLong * w * h && ft.sumPix == sum)
      assert(ft.frameMoment == fMoment && ft.motionAbs == motion)
      assert(ft.meanMilli == 1000L * sum / (n.toLong * w * h))
    }
  }

  test("imageFeatures: decoded features match the codec-free prediction") {
    import spark.implicits._
    val docs = (0L until 40L).toDF("doc_id")
    val feats = Multimodal.imageFeatures(Multimodal.synthImageCorpus(docs), batchSize = 16)
      .collect().sortBy(_.mediaId)
    assert(feats.length == 40)
    for (f <- feats) {
      val w = 16 + (f.mediaId % 16).toInt; val h = 12 + (f.mediaId % 8).toInt
      val raster = Multimodal.synthRaster(f.mediaId, w, h)
      val sum = raster.map(_ & 0xff).map(_.toLong).sum
      val moment = raster.zipWithIndex.map { case (b, i) => i.toLong * (b & 0xff) }.sum
      assert(f.width == w && f.height == h && f.nPixels == w.toLong * h)
      assert(f.sumPix == sum && f.momentPix == moment)
      assert(f.meanMilli == 1000L * sum / (w.toLong * h))
    }
  }

  test("resizeNearest: identity at same dims; exact floor-division sampling map") {
    val d = Multimodal.Decoded(4, 2,
      Array[Byte](10, 20, 30, 40, 50, 60, 70, 80))
    val same = Multimodal.resizeNearest(d, 4, 2)
    assert(same.pixels.toSeq == d.pixels.toSeq, "same-dims resize is identity")
    val half = Multimodal.resizeNearest(d, 2, 1)
    // target (x, y) samples source (x·4 div 2, y·2 div 1) = (0,0) and (2,0)
    assert(half.pixels.toSeq == Seq[Byte](10, 30))
    val up = Multimodal.resizeNearest(d, 8, 2)
    // upscale duplicates columns: x·4 div 8 = 0,0,1,1,2,2,3,3
    assert(up.pixels.take(8).toSeq ==
      Seq[Byte](10, 10, 20, 20, 30, 30, 40, 40))
  }

  test("aHash: brightness variants are near-identical, cross-base pairs are not") {
    import spark.implicits._
    val docs = spark.range(0, 64).select(org.apache.spark.sql.functions
      .col("id").as("doc_id"))
    val hashes = Multimodal.imageAHash(
        Multimodal.synthVariantImageCorpus(docs))
      .collect().map(h => h.mediaId -> (h.lo, h.hi)).toMap
    def hamming(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    // within-group (same base, different exposure): tiny distance
    val within = for {
      base <- 0L until 16L; i <- 0 to 2; j <- (i + 1) to 3
    } yield hamming(hashes(base * 4 + i), hashes(base * 4 + j))
    assert(within.max <= 4, s"exposure variants must collapse: max ${within.max}")
    // cross-base (independent noise rasters): far apart on average
    val cross = for { a <- 0L until 16L; b <- (a + 1) until 16L }
      yield hamming(hashes(a * 4), hashes(b * 4))
    assert(cross.sum.toDouble / cross.size > 16.0,
      s"independent images must differ: mean ${cross.sum.toDouble / cross.size}")
  }

  test("WHT audio fingerprint: gain variants collapse, cross-base tracks differ") {
    import spark.implicits._
    val docs = spark.range(0, 64).select(org.apache.spark.sql.functions
      .col("id").as("doc_id"))
    val fps = Multimodal.audioWhtFingerprint(
        Multimodal.synthVariantAudioCorpus(docs))
      .collect().map(f => f.mediaId -> f.fp).toMap
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val within = for {
      base <- 0L until 16L; i <- 0 to 2; j <- (i + 1) to 3
    } yield hamming(fps(base * 4 + i), fps(base * 4 + j))
    // DC exclusion + clamp-free headroom make a uniform gain shift
    // EXACTLY invisible — every planted pair collapses to hamming 0
    assert(within.max == 0, s"gain variants must collapse: max ${within.max}")
    val cross = for { a <- 0L until 16L; b <- (a + 1) until 16L }
      yield hamming(fps(a * 4), fps(b * 4))
    assert(cross.sum.toDouble / cross.size > 8.0,
      s"independent tracks must differ: mean ${cross.sum.toDouble / cross.size}")
  }

  test("WHT fingerprint matches a direct transform of the decoded samples") {
    import spark.implicits._
    val docs = spark.range(0, 8).select(org.apache.spark.sql.functions
      .col("id").as("doc_id"))
    val corpus = Multimodal.synthVariantAudioCorpus(docs).collect()
    val fps = Multimodal.audioWhtFingerprint(
      Multimodal.synthVariantAudioCorpus(docs))
      .collect().map(f => f.mediaId -> f.fp).toMap
    corpus.foreach { m =>
      val s = Multimodal.decodeAudio(m.content)
      var want = 0L
      for (k <- 1 to 32) {
        val w = (0 until 64).map { n =>
          (if (java.lang.Integer.bitCount(k & n) % 2 == 0) 1L else -1L) *
            (s(n) & 0xff)
        }.sum
        if (w > 0) want |= 1L << (k - 1)
      }
      assert(fps(m.mediaId) == want, s"media ${m.mediaId}")
    }
  }

  test("aHash halves never touch the sign bit and pack 64 bits exactly") {
    import spark.implicits._
    val docs = spark.range(0, 32).select(org.apache.spark.sql.functions
      .col("id").as("doc_id"))
    Multimodal.imageAHash(Multimodal.synthVariantImageCorpus(docs))
      .collect().foreach { h =>
        assert(h.lo >= 0 && h.lo < (1L << 32), s"lo out of range: ${h.lo}")
        assert(h.hi >= 0 && h.hi < (1L << 32), s"hi out of range: ${h.hi}")
      }
  }

  test("PNG tEXt splice: metadata round-trips, the raster survives, tampering is caught") {
    val png = Multimodal.encodePng(16, 12, Multimodal.synthRaster(7L, 16, 12))
    val kv = Seq("src" -> "srcA", "lang" -> "en", "note" -> "x y z")
    val spliced = Multimodal.injectPngText(png, kv)
    assert(Multimodal.extractPngText(spliced) == kv, "exact round-trip")
    // the spliced file still decodes through the real codec to the same raster
    val before = Multimodal.decodeImage(png)
    val after = Multimodal.decodeImage(spliced)
    assert(after.width == before.width && after.height == before.height
      && after.pixels.sameElements(before.pixels),
      "splicing must not disturb the image data")
    // flip one metadata byte: the CRC-verifying walker must refuse
    val tampered = spliced.clone()
    tampered(33 + 12) = (tampered(33 + 12) ^ 0x01).toByte
    intercept[IllegalArgumentException](Multimodal.extractPngText(tampered))
  }
}
