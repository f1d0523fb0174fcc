package graft

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

/** The real multimodal kernel (VERDICT r7 #4: "replace the resize stub
  * with a real pure-JVM image op"). What is pinned:
  *
  *  - pngMedia emits REAL decodable PNGs whose dimensions follow the
  *    generation contract the n21 oracle mirrors (1+len%64 × 1+len%48);
  *  - resizePng's output PNG decodes to exactly the aspect-fit target
  *    dimensions, including the ≥1 px clamp for degenerate thin images;
  *  - the resample is a true nearest-neighbor over the DECODED source
  *    pixels: the resized raster matches an independent in-test
  *    resample pixel-for-pixel (not just by signature), and the sig
  *    column is the md5 of exactly those pixels;
  *  - the whole pipeline is deterministic across runs (parquet binary
  *    columns must be reproducible for the oracle hash compare).
  */
class MultimodalSpec extends AnyFunSuite {

  private def spark = SparkTestSession.spark

  private def docsDF(texts: Seq[String]) = {
    val s = spark
    import s.implicits._
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  // text lengths chosen to hit: small square-ish, needs-downscale, and
  // the thin-image clamp (len%64 vs len%48 wildly unequal)
  private val texts = Seq(
    "ab",                      // len 2  → 3×3 (no downscale)
    "x" * 63,                  // len 63 → 64×16 → 32×8
    "y" * 47,                  // len 47 → 48×48 → 32×32
    "z" * 96,                  // len 96 → 33×1 → 32×1 (1·32/33=0 → the ≥1 clamp)
    "w" * 191)                 // len 191 → 64×48 → 32×24

  test("pngMedia: real PNGs, dims follow the generation contract") {
    Multimodal.pngMedia(docsDF(texts)).collect().foreach { m =>
      val len = texts(m.doc_id.toInt).getBytes("UTF-8").length
      val img = ImageIO.read(new ByteArrayInputStream(m.payload))
      assert(img != null, s"doc ${m.doc_id}: payload is not a decodable image")
      assert(img.getWidth == 1 + len % 64, s"doc ${m.doc_id} width")
      assert(img.getHeight == 1 + len % 48, s"doc ${m.doc_id} height")
    }
  }

  test("resizePng: output PNG decodes to the aspect-fit dims; resample matches " +
      "an independent nearest-neighbor; sig pins the resized pixels") {
    val media = Multimodal.pngMedia(docsDF(texts))
    val byId = media.collect().map(m => m.doc_id -> m.payload).toMap
    Multimodal.resizePng(media, maxSide = 32).collect().foreach { r =>
      val src = ImageIO.read(new ByteArrayInputStream(byId(r.doc_id)))
      // dim contract (incl. clamp)
      val scale = math.max(src.getWidth, src.getHeight)
      val wantW = if (scale <= 32) src.getWidth
        else math.max(1, src.getWidth * 32 / scale)
      val wantH = if (scale <= 32) src.getHeight
        else math.max(1, src.getHeight * 32 / scale)
      assert((r.new_w, r.new_h) == (wantW, wantH), s"doc ${r.doc_id} target dims")
      val out = ImageIO.read(new ByteArrayInputStream(r.resized_png))
      assert((out.getWidth, out.getHeight) == (wantW, wantH),
        s"doc ${r.doc_id}: re-encoded PNG dims drifted from the meta columns")
      // independent nearest-neighbor resample: every output pixel must be
      // the source pixel at (x·w/nw, y·h/nh), bit-exact through the PNG
      // roundtrip (TYPE_INT_RGB is lossless in PNG)
      val md = java.security.MessageDigest.getInstance("MD5")
      val buf = java.nio.ByteBuffer.allocate(4)
      for (y <- 0 until wantH; x <- 0 until wantW) {
        val want = src.getRGB(x * src.getWidth / wantW, y * src.getHeight / wantH) & 0xffffff
        assert((out.getRGB(x, y) & 0xffffff) == want,
          s"doc ${r.doc_id}: pixel ($x,$y) is not the nearest-neighbor sample")
        buf.clear(); buf.putInt(want); md.update(buf.array())
      }
      val wantSig = md.digest().take(8).map("%02x".format(_)).mkString
      assert(r.sig == wantSig, s"doc ${r.doc_id}: sig does not hash the resized raster")
    }
  }

  test("deterministic across runs") {
    def sigs = Multimodal.resizePng(Multimodal.pngMedia(docsDF(texts)))
      .collect().map(r => r.doc_id -> r.sig).toMap
    assert(sigs == sigs)
  }

  test("gifMedia/frameSampleGif: real multi-frame container, gray pixels " +
      "round-trip the GIF palette exactly") {
    val media = Multimodal.gifMedia(docsDF(texts)).collect()
    // every payload is a real GIF (magic bytes) with the contract's
    // frame count readable by a fresh, independent reader
    media.foreach { m =>
      assert(new String(m.payload.take(3), "US-ASCII") == "GIF")
      val len = texts(m.doc_id.toInt).getBytes("UTF-8").length
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(m.payload))
      val reader = ImageIO.getImageReadersByFormatName("gif").next()
      reader.setInput(iis)
      assert(reader.getNumImages(true) == 1 + len % 5, s"doc ${m.doc_id}")
      // gray values must round-trip exactly: frame 0 pixel (0,0) is
      // dig(0) by the generation contract
      val md = java.security.MessageDigest.getInstance("MD5")
      val dig = md.digest(texts(m.doc_id.toInt).getBytes("UTF-8"))
      val img0 = reader.read(0)
      assert((img0.getRGB(0, 0) & 0xff) == (dig(0) & 0xff), s"doc ${m.doc_id}")
      reader.dispose(); iis.close()
    }
    // the kernel's own walk agrees with the contract for every frame
    val frames = Multimodal.frameSampleGif(Multimodal.gifMedia(docsDF(texts)))
      .collect()
    texts.zipWithIndex.foreach { case (t, i) =>
      val len = t.getBytes("UTF-8").length
      val mine = frames.filter(_.doc_id == i)
      assert(mine.length == 1 + len % 5)
      assert(mine.forall(f => f.width == 1 + len % 64 && f.height == 1 + len % 48))
      // frames differ in content (the f*7 term) — signatures distinct
      assert(mine.map(_.sig).distinct.length == mine.length, s"doc $i")
    }
  }

  test("wavMedia: real RIFF/WAVE containers an independent AudioSystem parse " +
      "agrees with; format + frame count follow the generation contract") {
    Multimodal.wavMedia(docsDF(texts)).collect().foreach { m =>
      val len = texts(m.doc_id.toInt).getBytes("UTF-8").length
      // container magic: RIFF....WAVE
      assert(new String(m.payload.take(4), "US-ASCII") == "RIFF", s"doc ${m.doc_id}")
      assert(new String(m.payload.slice(8, 12), "US-ASCII") == "WAVE", s"doc ${m.doc_id}")
      // a FRESH, independent parse (AudioSystem statics, not the
      // kernel's SPI providers) must agree on every format field
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new ByteArrayInputStream(m.payload))
      val fmt = ais.getFormat
      assert(fmt.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
      assert(fmt.getSampleRate == 8000f && fmt.getSampleSizeInBits == 16 &&
        fmt.getChannels == 1 && !fmt.isBigEndian, s"doc ${m.doc_id}: $fmt")
      assert(ais.getFrameLength == 16 + len % 241, s"doc ${m.doc_id} frames")
      ais.close()
    }
  }

  test("audioStats: decoded samples match the md5 generation contract exactly " +
      "(sum, sum of squares, min/max, duration)") {
    val stats = Multimodal.audioStats(Multimodal.wavMedia(docsDF(texts)))
      .collect().map(s => s.doc_id -> s).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val bytes = t.getBytes("UTF-8")
      val n = 16 + bytes.length % 241
      val dig = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      // independent re-derivation: walk every sample the generator wrote
      val samples = (0 until n).map(j => ((dig(j % 16) & 0xff) - 128) * 256)
      val s = stats(i.toLong)
      assert(s.sample_rate == 8000 && s.channels == 1 && s.bits == 16, s"doc $i")
      assert(s.n_samples == n, s"doc $i n_samples")
      assert(s.duration_ms == n * 1000L / 8000, s"doc $i duration")
      assert(s.sum_pcm == samples.map(_.toLong).sum, s"doc $i sum")
      assert(s.sum_sq == samples.map(v => v.toLong * v).sum, s"doc $i sumsq")
      assert(s.min_pcm == samples.min && s.max_pcm == samples.max, s"doc $i extrema")
    }
  }

  test("audioStats: non-conforming payload fails loudly instead of mis-decoding") {
    val s = spark
    import s.implicits._
    // a big-endian 16-bit WAV-like stream: the JDK writer always emits
    // little-endian WAVE, so hand-build an AIFF container (big-endian
    // PCM) — the kernel must refuse, not silently byte-swap
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, true)
    val pcm = Array.tabulate[Byte](32)(i => i.toByte)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, 16L)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.AIFF, out)
    val media = Seq(Multimodal.WavMedia(0L, out.toByteArray))
      .toDS()
    val err = intercept[org.apache.spark.SparkException] {
      Multimodal.audioStats(media).collect()
    }
    assert(err.getMessage.contains("refusing to mis-decode") ||
      Option(err.getCause).exists(_.getMessage.contains("refusing to mis-decode")))
  }

  test("audio pipeline deterministic across runs") {
    def sums = Multimodal.audioPcmStats(docsDF(texts))
      .collect().map(r => r.getLong(0) -> r.getLong(6)).toMap
    assert(sums == sums)
  }
}
