package graft

import org.apache.spark.sql.functions._
import graft.ext.Multimodal
import graft.functions.PolyHash

/** Multimodal plumbing (SURVEY §7.6): real schema/encoders/batching around a
  * stubbed codec.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media = Multimodal.syntheticMedia(
    Seq((0L, "aa bb"), (1L, "cc dd"), (2L, "ee ff"), (3L, "gg hh"),
      (4L, "ii jj"), (5L, "kk ll"))
      .toDF("doc_id", "text"))

  test("media schema: binary payload + typed metadata, kind round-robin") {
    val m = media
    m.schema("payload").dataType.typeName shouldBe "binary"
    val kinds = m.select("media_id", "kind").as[(Long, String)].collect().toMap
    kinds(0L) shouldBe "image"
    kinds(1L) shouldBe "audio"
    kinds(2L) shouldBe "video"
    kinds(3L) shouldBe "image"
  }

  test("feature extraction: deterministic stub, fixed dim, matches formula") {
    val f = Multimodal.extractFeatures(media).collect().map(r => r.media_id -> r).toMap
    f.values.foreach(_.features.length shouldBe Multimodal.FeatureDim)
    val h = PolyHash.of("aa bb")
    f(0L).features(0) shouldBe (h * 3 % 997).toDouble / 997.0
    f(0L).features(7) shouldBe (h * 17 % 997).toDouble / 997.0
    // deterministic across runs
    Multimodal.extractFeatures(media).collect().map(_.features.toSeq).toSet shouldBe
      f.values.map(_.features.toSeq).toSet
  }

  test("features pool REAL decoded content; match the closed form per modality") {
    val real = Multimodal.withRealVideoPayloads(
      Multimodal.withRealAudioPayloads(Multimodal.withRealImagePayloads(media)))
    val f = Multimodal.extractFeatures(real).collect()
      .map(r => r.media_id -> r.features).toMap
    // image doc 0: 32x32 BMP seeded from PolyHash("aa bb"); band i pools
    // Σ(R+G+B) of pixel value (seed*31 + x*131 + y*52501) mod 2^24
    val hi = PolyHash.of("aa bb")
    val expectImg = Array.tabulate(8) { i =>
      val ys = (0 until 32).filter(y => y * 8 / 32 == i)
      val s = (for { y <- ys; x <- 0 until 32 } yield {
        val v = java.lang.Math.floorMod(hi * 31 + x * 131 + y * 52501, 0x1000000L)
        ((v >> 16) & 0xFF) + ((v >> 8) & 0xFF) + (v & 0xFF)
      }).sum
      s.toDouble / (ys.size.toLong * 32 * 765.0)
    }
    f(0L).toSeq shouldBe expectImg.toSeq
    // audio doc 1: WAV seeded from PolyHash("cc dd"), encSamplesOf(1040)
    // samples; octile i pools unsigned amplitude (seed*(j+1)) mod 2^16
    val ha = PolyHash.of("cc dd")
    val n = Multimodal.encSamplesOf(1040L)
    val expectAud = Array.tabulate(8) { i =>
      val js = (0 until n).filter(j => j.toLong * 8 / n == i)
      js.map(j => (ha * (j + 1)) % 65536L).sum.toDouble / (js.size * 65536.0)
    }
    f(1L).toSeq shouldBe expectAud.toSeq
    // video doc 2 ("ee ff", 3 frames): block i pools demuxed frame bytes
    // (fseed*(j+1)) mod 256 over the concatenated 3*768-byte stream
    val seeds = (0 until 3).map(fi =>
      (PolyHash.of(if (fi == 0) "ee ff" else "") * 131 + fi) % PolyHash.Mod)
    val stream = seeds.flatMap(s => (0 until 768).map(j =>
      java.lang.Math.floorMod(s * (j + 1), 256L)))
    val expectVid = Array.tabulate(8) { i =>
      val gs = stream.indices.filter(g => g.toLong * 8 / stream.size == i)
      gs.map(stream).sum.toDouble / (gs.size * 255.0)
    }
    f(2L).toSeq shouldBe expectVid.toSeq
  }

  test("codec is initialized per partition, not per row (batch contract)") {
    val m = media.repartition(3)
    val before = Multimodal.StubCodec.initCount.get()
    Multimodal.extractFeatures(m).collect()
    val inits = Multimodal.StubCodec.initCount.get() - before
    // one codec per non-empty partition; never one per row (6 rows)
    inits should be <= 3L
    inits should be >= 1L
  }

  test("frame sampling: videos only, stride-2 fan-out, hash per frame") {
    val frames = Multimodal.sampleFrames(media, stride = 2).collect()
    // videos are doc_id 2 (n_frames=3 -> idx 0,2) and 5 (n_frames=1 -> idx 0)
    frames.map(f => (f.media_id, f.frame_idx)).toSet shouldBe
      Set((2L, 0), (2L, 2), (5L, 0))
    // frame hash = position-salted hash of the frame's 8-token chunk:
    // frame 0 covers tokens [0, 8) = "ee ff"; frame 2 covers [8, 16) = empty
    frames.find(f => f.media_id == 2L && f.frame_idx == 0).get.frame_hash shouldBe
      (PolyHash.of("ee ff") * 131 + 0) % PolyHash.Mod
    frames.find(f => f.media_id == 2L && f.frame_idx == 2).get.frame_hash shouldBe
      (PolyHash.of("") * 131 + 2) % PolyHash.Mod
  }

  test("frame near-dup: videos sharing local content pair up; disjoint do not") {
    // Video-kind ids (≡ 2 mod 3): docs 2 and 5 share ALL tokens (one's
    // sampled frames a subset of the other's), doc 8 shares nothing.
    val longText = (0 until 40).map(i => s"w$i").mkString(" ")
    val other = (0 until 40).map(i => s"x$i").mkString(" ")
    val docs = Seq((2L, longText), (5L, longText), (8L, other))
      .toDF("doc_id", "text")
    val frames = Multimodal.sampleFrames(Multimodal.syntheticMedia(docs)).toDF()
    val pairs = graft.ext.Dedup.jaccardOverKeys(
        frames, "media_id", "frame_hash", threshold = 300L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    pairs.map(p => (p._1, p._2)) shouldBe Array((2L, 5L))
    pairs.head._3 should be >= 300L
  }

  test("video codec: RIFF/AVI container round-trips uncompressed DIB frames") {
    val codec = new Multimodal.VideoCodec
    val avi = codec.encodeAvi(Seq(7L, 9999L), width = 16, height = 16)
    // genuine RIFF/AVI magic; parser finds exactly the encoded frames
    new String(avi.take(4), "US-ASCII") shouldBe "RIFF"
    new String(avi.slice(8, 12), "US-ASCII") shouldBe "AVI "
    codec.isAviPayload(avi) shouldBe true
    val frames = codec.decodeFrames(avi)
    frames.length shouldBe 2
    frames.foreach(_.length shouldBe 16 * 16 * 3)
    frames(0) shouldBe codec.frameBytes(7L, 16, 16)
    frames(1) shouldBe codec.frameBytes(9999L, 16, 16)
    // content hash folds the UNSIGNED decoded bytes
    val expect = codec.frameBytes(7L, 16, 16)
      .foldLeft(0L)((h, b) => (h * 31 + (b & 0xFF)) % PolyHash.Mod)
    codec.frameContentHash(frames(0)) shouldBe expect
  }

  test("video codec: corrupt chunk sizes fail loudly instead of hanging or overrunning") {
    val codec = new Multimodal.VideoCodec
    val avi = codec.encodeAvi(Seq(7L), width = 16, height = 16)
    // corrupt the top-level hdrl LIST size to 0xFFFFFFF8 (signed -8):
    // unvalidated, the scan pointer would advance by zero and spin forever
    val bad = avi.clone()
    val listOff = 12 // first LIST directly after RIFF size 'AVI '
    bad(listOff + 4) = 0xF8.toByte; bad(listOff + 5) = 0xFF.toByte
    bad(listOff + 6) = 0xFF.toByte; bad(listOff + 7) = 0xFF.toByte
    val ex = intercept[IllegalArgumentException](codec.decodeFrames(bad))
    ex.getMessage should include("corrupt AVI")
    // truncation mid-frame also fails loudly, never copies past the buffer
    val cut = java.util.Arrays.copyOfRange(avi, 0, avi.length - 100)
    // restore the RIFF size so the sniff+outer bound still admit the blob
    intercept[IllegalArgumentException](codec.decodeFrames(cut))
  }

  test("image codec: extreme aspect ratios clamp the short side to 1, never 0") {
    val codec = new Multimodal.ImageCodec
    val banner = codec.encodeBmp(200, 1, seed = 5L)
    val (w, h, n) = codec.decodeResize(banner, maxSide = 64)
    (w, h) shouldBe ((64, 1))
    n shouldBe 64L * 1 * 3
  }

  test("decodeVideoFrames takes the REAL container path on AVI payloads") {
    val real = Multimodal.withRealVideoPayloads(media)
    val byId = real.collect().map(m => m.media_id -> m).toMap
    new String(byId(2L).payload.take(4), "US-ASCII") shouldBe "RIFF"
    byId(0L).payload shouldBe "aa bb".getBytes("UTF-8") // image row untouched
    val out = Multimodal.decodeVideoFrames(real).collect()
    // one row per (video, frame): docs 2 (n_frames=3) and 5 (n_frames=1)
    out.map(f => (f.media_id, f.frame_idx)).toSet shouldBe
      Set((2L, 0), (2L, 1), (2L, 2), (5L, 0))
    out.foreach(_.n_bytes shouldBe 16L * 16 * 3)
    // frame content ties back to the local-chunk seed the signature path uses
    val codec = new Multimodal.VideoCodec
    val seed = (PolyHash.of("ee ff") * 131 + 0) % PolyHash.Mod
    out.find(f => f.media_id == 2L && f.frame_idx == 0).get.frame_hash shouldBe
      codec.frameContentHash(codec.frameBytes(seed, 16, 16))
  }

  test("audio codec: real WAV bytes round-trip through javax.sound") {
    val codec = new Multimodal.AudioCodec
    val wav = codec.encodeWav(seed = 7L, nSamples = 8, rate = 16000)
    // genuine RIFF/WAVE container, decodable by the platform reader
    codec.isWavPayload(wav) shouldBe true
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    ais.getFormat.getSampleRate shouldBe 16000f
    ais.getFrameLength shouldBe 8L
    // nearest-neighbor 16k->8k keeps frames 0,2,4,6; sample i unsigned is
    // (7*(i+1)) mod 2^16 -> checksum 7*(1+3+5+7) = 112
    codec.decodeResample(wav, outRate = 8000) shouldBe ((8L, 4L, 112L))
    // identity rate keeps all frames: 7*(1+..+8) = 252
    codec.decodeResample(wav, outRate = 16000) shouldBe ((8L, 8L, 252L))
  }

  test("resample takes the REAL decode path on real WAV payloads") {
    val real = Multimodal.withRealAudioPayloads(media)
    val byId = real.collect().map(m => m.media_id -> m).toMap
    new String(byId(1L).payload.take(4), "ISO-8859-1") shouldBe "RIFF"
    byId(0L).payload shouldBe "aa bb".getBytes("UTF-8") // image row untouched
    val out = Multimodal.resampleAudio(real, outRate = 8000).collect()
      .map(r => r.media_id -> r).toMap
    out.keySet shouldBe Set(1L, 4L)
    out.values.foreach { r =>
      // measured output count == arithmetic expectation (encode window / 2)
      val durationMs = 1000L + r.media_id * 40L
      r.n_samples shouldBe Multimodal.encSamplesOf(durationMs) / 2
      r.rate shouldBe 8000
    }
    // checksum replays arithmetically from the seed (doc 1 text "cc dd")
    val seed = PolyHash.of("cc dd")
    val nOut = Multimodal.encSamplesOf(1040L) / 2
    val expect = (0L until nOut).map(j => (seed * (2 * j + 1)) % 65536L).sum % 2147483647L
    out(1L).checksum shouldBe expect
  }

  test("audio resample: audio only, metadata sample count, stub checksum") {
    val out = Multimodal.resampleAudio(media, outRate = 8000).collect()
    out.length should be > 0
    out.foreach { r =>
      r.media_id % 3 shouldBe 1 // audio kind
      r.rate shouldBe 8000
      r.n_samples shouldBe (1000L + r.media_id * 40L) * 8000L / 1000L
    }
  }

  test("image codec: real BMP bytes round-trip through javax.imageio") {
    val codec = new Multimodal.ImageCodec
    val bmp = codec.encodeBmp(48, 32, seed = 12345L)
    // genuine BMP container: magic bytes + decodable at the encoded dims
    bmp(0).toChar shouldBe 'B'
    bmp(1).toChar shouldBe 'M'
    codec.isImagePayload(bmp) shouldBe true
    val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bmp))
    (src.getWidth, src.getHeight) shouldBe ((48, 32))
    // pixel content is the deterministic fill, not zeros
    src.getRGB(5, 7) should not be src.getRGB(6, 7)
    // real resize: long side capped, aspect kept, bytes measured off raster
    codec.decodeResize(bmp, maxSide = 24) shouldBe ((24, 16, 24L * 16 * 3))
    // never upscale
    codec.decodeResize(bmp, maxSide = 100) shouldBe ((48, 32, 48L * 32 * 3))
  }

  test("r21 raster-fill encodeBmp is byte-identical to the per-pixel setRGB reference") {
    // The optimization round swapped per-pixel setRGB/getRGB for direct
    // raster access; the corpus contract is byte-identical BMPs per
    // (dims, seed), so pin the new path against an inline setRGB replica
    // and pin the pooled features against the decoded reference image.
    val codec = new Multimodal.ImageCodec
    for ((w, h, seed) <- Seq((48, 32, 12345L), (144, 80, 7L), (1, 1, 0L), (33, 17, -9L))) {
      val ref = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        ref.setRGB(x, y,
          java.lang.Math.floorMod(seed * 31 + x * 131 + y * 52501, 0x1000000L).toInt)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(ref, "bmp", bos)
      codec.encodeBmp(w, h, seed) shouldBe bos.toByteArray
      // bulk-getRGB band pooling == per-pixel getRGB pooling
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(codec.encodeBmp(w, h, seed)))
      val sums = new Array[Long](Multimodal.FeatureDim)
      val cnts = new Array[Long](Multimodal.FeatureDim)
      for (y <- 0 until h; x <- 0 until w) {
        val v = img.getRGB(x, y)
        val b = y * Multimodal.FeatureDim / h
        sums(b) += ((v >> 16) & 0xFF) + ((v >> 8) & 0xFF) + (v & 0xFF)
        cnts(b) += 1
      }
      val expected = Array.tabulate(Multimodal.FeatureDim)(i =>
        if (cnts(i) == 0) 0.0 else sums(i).toDouble / (cnts(i) * 765.0))
      codec.bandFeatures(codec.encodeBmp(w, h, seed)) shouldBe expected
    }
  }

  test("decode+resize takes the REAL decode path on real image payloads") {
    val real = Multimodal.withRealImagePayloads(media)
    // image rows now carry genuine BMPs; others untouched
    val byId = real.collect().map(m => m.media_id -> m).toMap
    byId(0L).payload(0).toChar shouldBe 'B'
    byId(1L).payload shouldBe "cc dd".getBytes("UTF-8")
    val out = Multimodal.decodeAndResize(real, maxSide = 32).collect()
      .map(d => d.media_id -> d).toMap
    out.keySet shouldBe Set(0L, 3L)
    // measured dims/bytes off the decoded+resized raster equal the
    // metadata arithmetic (BMPs were encoded at metadata dims)
    byId(0L).width shouldBe 32 // doc 0: 32x32 -> no resize at maxSide 32
    out(0L).width shouldBe 32
    out(0L).n_bytes shouldBe 32L * 32 * 3
    val m3 = byId(3L) // doc 3: 80x80 -> scaled to 32x32
    math.max(m3.width, m3.height) should be > 32
    out(3L).width shouldBe (m3.width * math.min(1.0, 32.0 / math.max(m3.width, m3.height))).toInt
    out(3L).n_bytes shouldBe out(3L).width.toLong * out(3L).height * 3
  }

  test("decode+resize: caps the long side, preserves stub byte accounting") {
    val out = Multimodal.decodeAndResize(media, maxSide = 32).collect()
      .map(d => d.media_id -> d).toMap
    out.keySet shouldBe Set(0L, 3L) // the image rows
    out.values.foreach { d =>
      d.width should be <= 32
      d.height should be <= 32
      d.n_bytes shouldBe d.width.toLong * d.height * 3
    }
  }

  test("provided embeddings take precedence; coverage reports the split without decoding") {
    // model vectors for ids 0, 2, 4 only — the other half falls back
    val provided = Seq((0L, Seq(9.0, 9.0)), (2L, Seq(8.0, 8.0)), (4L, Seq(7.0, 7.0)))
      .toDF("media_id", "features")
    val out = Multimodal.featuresWithProvided(media, provided).collect()
      .map(r => r.getLong(0) -> r).toMap
    out.keySet shouldBe (0L to 5L).toSet
    Seq(0L, 2L, 4L).foreach { id =>
      out(id).getLong(3) shouldBe 1L // pretrained
      out(id).getSeq[Double](2).head should be >= 7.0 // the MODEL vector won
    }
    Seq(1L, 3L, 5L).foreach { id =>
      out(id).getLong(3) shouldBe 0L
      all(out(id).getSeq[Double](2)) should be < 1.0 // pooled features are normalized
    }
    // the coverage report agrees with the per-row flags, per kind
    val cov = Multimodal.providedCoverage(media, provided).collect()
      .map(r => r.getString(0) -> r).toMap
    cov.keySet shouldBe Set("image", "audio", "video")
    // kinds: 0,3=image 1,4=audio 2,5=video; provided = {0,2,4}
    cov("image").getLong(2) shouldBe 1L // of 2 -> 5000 bp
    cov("image").getLong(3) shouldBe 5000L
    cov.values.map(_.getLong(1)).sum shouldBe 6L
    cov.values.map(_.getLong(2)).sum shouldBe 3L
  }
}
