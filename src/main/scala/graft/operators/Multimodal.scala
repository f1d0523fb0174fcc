package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed per-partition in batches.
  *
  * TWO TIERS, deliberately kept side by side:
  *
  *  - REAL kernels (n21/n48/n50/n71): the formats the JDK ships codecs
  *    for (PNG/GIF via `javax.imageio`, WAV PCM via
  *    `javax.sound.sampled` — no new dependency) are decoded,
  *    resampled, and frame-walked for REAL ([[resizePng]],
  *    [[channelStats]], [[frameSampleGif]], [[audioStats]]), each
  *    verified against an oracle that recomputes the decoded structure
  *    in closed form from the generation contract.
  *  - STUB kernels (n11/n14/n17): the formats the container has NO
  *    codec for (compressed audio MP3/AAC, video containers H.264/MP4,
  *    JPEG-XL, ...) keep a clearly-marked deterministic stand-in for
  *    the codec call, inside the SAME partition-batched plumbing. Each
  *    stub's scaladoc states why it stays a stub rather than being
  *    pointed at the real kernels: the stub tier is what makes the
  *    absent-codec path testable at all (a deterministic fake is
  *    oracle-expressible in DuckDB; a real MP3/H.264 decode would be
  *    neither runnable here nor reproducible in SQL), and its queries
  *    pin the PLUMBING — schema, batch shape, fan-out — that a
  *    production codec would drop into unchanged.
  *
  * At scale the payload column stays columnar parquet binary; decode
  * runs executor-side per partition with zero driver involvement.
  */
object Multimodal {

  /** Per-partition reusable codec handles. `javax.imageio`'s static
    * `ImageIO.read`/`write` helpers scan the plugin registry on EVERY
    * call and spool every stream through a DISK-backed cache file by
    * default — per-image costs that dominate a small-image workload.
    * Each kernel instead allocates one reader/writer per partition
    * batch (the production amortize-init-per-batch shape) and wraps
    * payloads in memory-cached streams, so decode/encode never touches
    * the plugin registry or the filesystem. */
  private def newReader(fmt: String): javax.imageio.ImageReader =
    javax.imageio.ImageIO.getImageReadersByFormatName(fmt).next()

  private def newWriter(fmt: String): javax.imageio.ImageWriter =
    javax.imageio.ImageIO.getImageWritersByFormatName(fmt).next()

  /** Decode one single-frame payload with a reused reader (memory
    * stream, forward-only, metadata ignored). */
  private def readOne(reader: javax.imageio.ImageReader,
      payload: Array[Byte]): java.awt.image.BufferedImage = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    reader.setInput(iis, true, true)
    val img = reader.read(0)
    iis.close()
    img
  }

  /** Encode one image with a reused writer into a memory stream. */
  private def writeOne(writer: javax.imageio.ImageWriter,
      img: java.awt.image.BufferedImage): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    writer.setOutput(ios)
    writer.write(img)
    ios.close()
    out.toByteArray
  }

  /** Decoded-media metadata record (what a real image decode would
    * return: dimensions + content signature). */
  final case class MediaMeta(
      doc_id: Long, mime: String, n_bytes: Long,
      width: Int, height: Int, sig: String)

  /** documents → media table: payload = utf-8 bytes standing in for an
    * image blob; mime/meta typed alongside. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "utf-8").as("payload"),
      struct(
        lit("image/fake").as("mime"),
        col("lang").as("tag")).as("meta"))

  /** STUB DECODE — stands in for a decoder of a format the container
    * has no codec for. Deterministic fake: dimensions derived from the
    * byte length, signature = md5 prefix of the payload. The
    * mapPartitions batch shape (iterator-in/iterator-out per partition,
    * one digest instance per batch) is exactly how a real decoder runs.
    *
    * WHY THIS STAYS A STUB (r8 consolidation; r11 scope narrowed): the
    * REAL decode tier exists — [[channelStats]] (n48) decodes actual
    * PNG pixels and [[audioStats]] (n71) actual WAV PCM, each
    * hash-verified against a closed-form oracle. This kernel covers the
    * complementary case: a mime type with NO JDK codec (compressed
    * audio/video — MP3, AAC, H.264).
    * Pointing it at the PNG kernel would just duplicate n48; deleting
    * it would leave the absent-codec path — the path a production
    * pipeline hits for most media — without a pinned schema/batch-shape
    * contract (n11). The deterministic fake is what keeps that contract
    * DuckDB-oracle-checkable. */
  def decodeStub(media: DataFrame): Dataset[MediaMeta] = {
    implicit val enc: Encoder[MediaMeta] = Encoders.product[MediaMeta]
    media.select(col("doc_id"), col("payload"), col("meta.mime"))
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { row =>
          val id = row.getLong(0)
          val payload = row.getAs[Array[Byte]](1)
          val mime = row.getString(2)
          md.reset()
          val sig = md.digest(payload).take(8).map("%02x".format(_)).mkString
          MediaMeta(id, mime, payload.length.toLong,
            (payload.length % 640).toInt, (payload.length % 480).toInt, sig)
        }
      }
  }

  /** Full stub pipeline: construct → decode → metadata frame. */
  def decodedMeta(docs: DataFrame): DataFrame = decodeStub(mediaTable(docs)).toDF()

  /** One sampled video frame. */
  final case class Frame(doc_id: Long, frame_idx: Int, ts_ms: Long, sig: String)

  /** STUB FRAME-SAMPLER — the video analog of [[decodeStub]]: payload
    * stands in for a container stream whose frame count is derived
    * deterministically from the byte length (a real sampler would read
    * the container's timebase). The generator shape is the real thing:
    * iterator-in/iterator-out `mapPartitions` with a per-document
    * `flatMap` fan-out (0..n frames per row — rows with zero frames
    * vanish), one digest instance per partition batch. At scale this is
    * the map-side explode that precedes per-frame feature extraction —
    * no shuffle, no driver involvement, output co-partitioned with the
    * input.
    *
    * WHY THIS STAYS A STUB (r8 consolidation): the REAL frame walk is
    * [[frameSampleGif]] (n50) — an actual multi-frame container opened
    * with an imageio reader, every frame decoded and pixel-signed.
    * This kernel keeps the VIDEO-container contract n50 cannot model
    * with a JDK codec: frames indexed by a timebase (`ts_ms`) rather
    * than enumeration order, and a 0-frame row that VANISHES from the
    * fan-out (GIF containers always hold ≥1 frame, so n50 can never
    * exercise the empty-container branch its plumbing must handle). */
  def frameSample(media: DataFrame): Dataset[Frame] = {
    implicit val enc: Encoder[Frame] = Encoders.product[Frame]
    media.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.flatMap { row =>
          val id = row.getLong(0)
          val payload = row.getAs[Array[Byte]](1)
          val nFrames = payload.length % 8 // fake container length probe
          (0 until nFrames).iterator.map { i =>
            md.reset()
            md.update(payload)
            md.update(s":$i".getBytes("UTF-8"))
            val sig = md.digest().take(8).map("%02x".format(_)).mkString
            Frame(id, i, i * 333L, sig)
          }
        }
      }
  }

  /** documents → sampled-frame table (stub decode, real plumbing). */
  def sampledFrames(docs: DataFrame): DataFrame = frameSample(mediaTable(docs)).toDF()

  /** 8-dim feature vector extracted from a payload. */
  final case class Features(doc_id: Long, f0: Double, f1: Double, f2: Double,
      f3: Double, f4: Double, f5: Double, f6: Double, f7: Double)

  /** STUB FEATURE EXTRACTOR — stands in for an image/audio embedding
    * model: 8 evenly-spaced payload bytes normalized to [0,1] (a real
    * extractor would run a model over the decoded media; the
    * per-partition batch shape — where a real impl would amortize model
    * load per batch, exactly like a pandas_udf over mapInPandas — is
    * the production plumbing). Output feeds the similarity operators
    * (Similarity.cosinePairs / topK) unchanged: media → features →
    * ANN is the composed pipeline.
    *
    * WHY THIS STAYS A STUB (r8 consolidation): the REAL
    * pixel-statistics kernel is [[channelStats]] (n48) — decoded
    * channel sums, exactly the degenerate "feature vector" a real
    * codec allows here. What n48 cannot model is the thing this stub
    * pins: a LEARNED embedding (a model forward pass) has no
    * closed-form oracle by definition, so the feature-extraction
    * contract — fixed-width vector schema, batch-amortized model
    * init, [0,1] normalization, ANN-ready output — is verified on a
    * deterministic stand-in instead. Swapping the stand-in for a model
    * touches nothing outside the mapPartitions body. */
  def featureExtract(media: DataFrame): Dataset[Features] = {
    implicit val enc: Encoder[Features] = Encoders.product[Features]
    media.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        // (a real extractor initializes its model HERE, once per batch)
        rows.map { row =>
          val id = row.getLong(0)
          val p = row.getAs[Array[Byte]](1)
          val n = p.length
          def f(i: Int): Double =
            if (n == 0) 0.0 else (p((i * (n - 1)) / 7) & 0xff) / 255.0
          Features(id, f(0), f(1), f(2), f(3), f(4), f(5), f(6), f(7))
        }
      }
  }

  /** documents → feature table (stub extract, real plumbing). */
  def extractedFeatures(docs: DataFrame): DataFrame =
    featureExtract(mediaTable(docs)).toDF()

  /** One real PNG payload (doc_id + encoded image bytes). */
  final case class PngMedia(doc_id: Long, payload: Array[Byte])

  /** documents → REAL PNG media table: each doc becomes an actual PNG
    * image, generated deterministically from its text — dimensions
    * `1 + utf8len % 64` × `1 + utf8len % 48` (so the verify oracle can
    * derive them from the text alone) and pixels seeded from the text's
    * md5 digest. The encoder is `javax.imageio` (in the JDK — no new
    * dependency); one reusable digest per partition batch, the same
    * executor-side batch shape as every media kernel here. */
  def pngMedia(docs: DataFrame): Dataset[PngMedia] = {
    implicit val enc: Encoder[PngMedia] = Encoders.product[PngMedia]
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val writer = newWriter("png")
        rows.map { row =>
          val id = row.getLong(0)
          val bytes = row.getString(1).getBytes("UTF-8")
          val w = 1 + bytes.length % 64
          val h = 1 + bytes.length % 48
          md.reset()
          val dig = md.digest(bytes)
          val pix = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val r = dig((x + y) % 16) & 0xff
              val g = dig((x * 3 + y) % 16) & 0xff
              val b = dig((x + y * 5) % 16) & 0xff
              pix(y * w + x) = (r << 16) | (g << 8) | b
              x += 1
            }
            y += 1
          }
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          img.setRGB(0, 0, w, h, pix, 0, w)
          PngMedia(id, writeOne(writer, img))
        }
      }
  }

  /** Resize record: decoded dims, aspect-fit target dims, resized-pixel
    * signature, and the re-encoded PNG. */
  final case class ResizedPng(doc_id: Long, width: Int, height: Int,
      new_w: Int, new_h: Int, sig: String, resized_png: Array[Byte])

  /** REAL RESIZE KERNEL (no stub): `javax.imageio` PNG decode →
    * aspect-preserving fit into `maxSide` (integer math; degenerate
    * thin images clamp to ≥ 1 px) → nearest-neighbor resample (an
    * explicit pixel loop, NOT Graphics2D filtering, so the output is
    * bit-deterministic across JVMs/platforms) → PNG re-encode. The
    * signature is the md5 of the resized raster's packed RGB ints, so
    * it pins actual pixel content; MultimodalSpec checks it against an
    * independent in-test resample and the n21 oracle checks the dims
    * (derivable from the text by the pngMedia generation contract).
    * Same mapPartitions batch shape as every media kernel — at scale
    * the decode/resample runs executor-side over parquet binary
    * columns with zero driver involvement. */
  def resizePng(media: Dataset[PngMedia], maxSide: Int = 32): Dataset[ResizedPng] = {
    implicit val enc: Encoder[ResizedPng] = Encoders.product[ResizedPng]
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val reader = newReader("png")
      val writer = newWriter("png")
      val four = new Array[Byte](4)
      rows.map { m =>
        val img = readOne(reader, m.payload)
        val w = img.getWidth
        val h = img.getHeight
        val src = img.getRGB(0, 0, w, h, null, 0, w)
        val scale = math.max(w, h)
        val (nw, nh) =
          if (scale <= maxSide) (w, h)
          else (math.max(1, w * maxSide / scale), math.max(1, h * maxSide / scale))
        val dst = new Array[Int](nw * nh)
        md.reset()
        var y = 0
        while (y < nh) {
          val srow = (y * h / nh) * w
          var x = 0
          while (x < nw) {
            val rgb = src(srow + x * w / nw) & 0xffffff
            dst(y * nw + x) = rgb
            // same digest bytes as the original per-pixel putInt: big-endian
            // 0x00 r g b per resized pixel, row-major
            four(0) = 0
            four(1) = ((rgb >> 16) & 0xff).toByte
            four(2) = ((rgb >> 8) & 0xff).toByte
            four(3) = (rgb & 0xff).toByte
            md.update(four)
            x += 1
          }
          y += 1
        }
        val resized = new java.awt.image.BufferedImage(
          nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
        resized.setRGB(0, 0, nw, nh, dst, 0, nw)
        val sig = md.digest().take(8).map("%02x".format(_)).mkString
        ResizedPng(m.doc_id, w, h, nw, nh, sig, writeOne(writer, resized))
      }
    }
  }

  /** documents → resized-media metadata through the REAL kernel:
    * generate PNG → decode → resample → meta columns. The oracle twin
    * derives width/height/new_w/new_h from the text length (the
    * generation contract); pixel content is pinned by MultimodalSpec. */
  def resizedMeta(docs: DataFrame): DataFrame =
    resizePng(pngMedia(docs)).toDF()
      .select(col("doc_id"), col("width"), col("height"),
        col("new_w"), col("new_h"))

  /** Per-image exact channel sums from DECODED pixels. */
  final case class ChannelStats(doc_id: Long, width: Int, height: Int,
      sum_r: Long, sum_g: Long, sum_b: Long)

  /** REAL FEATURE KERNEL (no stub): PNG decode → integer channel sums
    * over every pixel — the simplest real member of the
    * mean-color/histogram feature family, chosen because the n48
    * oracle can reproduce it EXACTLY: the pngMedia generation contract
    * makes each channel sum a closed form over the text's md5 bytes
    * (Σ_k dig[k]·c_k with c_k counting the residue class of each
    * channel's pixel-index arithmetic), so the DuckDB twin verifies
    * ACTUAL DECODED PIXELS against pure SQL arithmetic — any drift in
    * the encoder, the decoder, or the generation contract breaks the
    * hash. Same mapPartitions batch shape as every media kernel. */
  def channelStats(media: Dataset[PngMedia]): Dataset[ChannelStats] = {
    implicit val enc: Encoder[ChannelStats] = Encoders.product[ChannelStats]
    media.mapPartitions { rows =>
      val reader = newReader("png")
      rows.map { m =>
        val img = readOne(reader, m.payload)
        val w = img.getWidth
        val h = img.getHeight
        val pix = img.getRGB(0, 0, w, h, null, 0, w)
        var sr = 0L; var sg = 0L; var sb = 0L
        var i = 0
        while (i < pix.length) {
          val rgb = pix(i)
          sr += (rgb >> 16) & 0xff
          sg += (rgb >> 8) & 0xff
          sb += rgb & 0xff
          i += 1
        }
        ChannelStats(m.doc_id, w, h, sr, sg, sb)
      }
    }
  }

  /** documents → decoded-pixel channel stats through the real kernel. */
  def imageChannelStats(docs: DataFrame): DataFrame =
    channelStats(pngMedia(docs)).toDF()

  /** One real multi-frame container payload. */
  final case class GifMedia(doc_id: Long, payload: Array[Byte])

  /** documents → REAL ANIMATED-GIF media: a multi-frame container per
    * doc, written with `javax.imageio`'s sequence writer. Frame count
    * `1 + utf8len % 5` and dims `1 + utf8len % 64` × `1 + utf8len % 48`
    * follow the same text-derived generation contract as [[pngMedia]],
    * so the n50 oracle can predict the decoded structure from the text
    * alone. Frames are TYPE_BYTE_GRAY with md5-seeded pixels (gray
    * values live in GIF's exact 256-entry palette — no quantization
    * drift between encoder and decoder). */
  def gifMedia(docs: DataFrame): Dataset[GifMedia] = {
    implicit val enc: Encoder[GifMedia] = Encoders.product[GifMedia]
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val writer = newWriter("gif")
        rows.map { row =>
          val id = row.getLong(0)
          val bytes = row.getString(1).getBytes("UTF-8")
          val w = 1 + bytes.length % 64
          val h = 1 + bytes.length % 48
          val nFrames = 1 + bytes.length % 5
          md.reset()
          val dig = md.digest(bytes)
          val out = new java.io.ByteArrayOutputStream()
          val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          val data = new Array[Byte](w * h)
          var f = 0
          while (f < nFrames) {
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                data(y * w + x) = (dig((x + y * 3 + f * 7) % 16) & 0xff).toByte
                x += 1
              }
              y += 1
            }
            img.getRaster.setDataElements(0, 0, w, h, data)
            writer.writeToSequence(
              new javax.imageio.IIOImage(img, null, null), null)
            f += 1
          }
          writer.endWriteSequence()
          ios.close()
          GifMedia(id, out.toByteArray)
        }
      }
  }

  /** One decoded container frame. */
  final case class DecodedFrame(doc_id: Long, frame_idx: Int,
      width: Int, height: Int, sig: String)

  /** REAL FRAME-SAMPLE KERNEL (no stub — supersedes [[frameSample]]'s
    * stub probe for the n50 path): open the container with an imageio
    * reader, enumerate its ACTUAL frames (`getNumImages(true)` walks
    * the stream), decode each, and emit per-frame metadata + a pixel
    * signature. The n50 oracle checks the decoded frame structure
    * against the generation contract — a miscounted or misdimensioned
    * frame anywhere in writer or reader breaks the hash. Same
    * mapPartitions batch shape as every media kernel. */
  def frameSampleGif(media: Dataset[GifMedia]): Dataset[DecodedFrame] = {
    implicit val enc: Encoder[DecodedFrame] = Encoders.product[DecodedFrame]
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val reader = newReader("gif")
      rows.flatMap { m =>
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(m.payload))
        // seekForwardOnly must stay false: getNumImages(true) walks the
        // whole container, then read(i) seeks back per frame
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        val frames = (0 until n).map { i =>
          val img = reader.read(i)
          val w = img.getWidth
          val h = img.getHeight
          val pix = img.getRGB(0, 0, w, h, null, 0, w)
          md.reset()
          var j = 0
          while (j < pix.length) {
            md.update((pix(j) & 0xff).toByte)
            j += 1
          }
          DecodedFrame(m.doc_id, i, w, h,
            md.digest().take(8).map("%02x".format(_)).mkString)
        }
        iis.close()
        frames
      }
    }
  }

  /** documents → decoded real container frames (generate → decode). */
  def gifFrames(docs: DataFrame): DataFrame =
    frameSampleGif(gifMedia(docs)).toDF()
      .select(col("doc_id"), col("frame_idx"), col("width"), col("height"))

  // ------------------------------------------------------------------ audio

  /** One real WAV payload (doc_id + RIFF/WAVE container bytes). */
  final case class WavMedia(doc_id: Long, payload: Array[Byte])

  /** `javax.sound.sampled`'s static `AudioSystem.read/write` helpers
    * re-scan the provider registry per call (same trap as `ImageIO`'s
    * statics, see [[newReader]]); each kernel instead resolves the SPI
    * providers ONCE per partition batch via `ServiceLoader` (the JDK's
    * `java.desktop` module `provides` them) and falls back to the
    * static helpers only if the loader surfaces none. */
  private def audioReaders(): Vector[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator().asScala.toVector
  }

  private def wavFileWriter(): Option[javax.sound.sampled.spi.AudioFileWriter] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader
      .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .iterator().asScala
      .find(_.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
  }

  /** Parse one WAV container with a reused reader set; falls back to
    * `AudioSystem` if no SPI provider accepted the payload. */
  private def openAudio(readers: Vector[javax.sound.sampled.spi.AudioFileReader],
      payload: Array[Byte]): javax.sound.sampled.AudioInputStream = {
    val in = () => new java.io.ByteArrayInputStream(payload)
    readers.iterator.flatMap { r =>
      try Iterator.single(r.getAudioInputStream(in()))
      catch { case _: javax.sound.sampled.UnsupportedAudioFileException => Iterator.empty }
    }.nextOption().getOrElse(
      javax.sound.sampled.AudioSystem.getAudioInputStream(in()))
  }

  /** documents → REAL WAV media table: each doc becomes an actual
    * RIFF/WAVE container written by the JDK's WAVE `AudioFileWriter`
    * (in `java.desktop` — no new dependency). Generation contract the
    * n71 oracle mirrors: 8000 Hz, 16-bit signed little-endian PCM,
    * mono; `n = 16 + utf8len % 241` frames; frame `i`'s sample is
    * `(md5(text)[i mod 16] − 128) · 256` — n ≥ 16 so every digest byte
    * is used at least once (min/max are digest-wide extrema). Same
    * executor-side `mapPartitions` batch shape as every media kernel. */
  def wavMedia(docs: DataFrame): Dataset[WavMedia] = {
    implicit val enc: Encoder[WavMedia] = Encoders.product[WavMedia]
    docs.select(col("doc_id"), col("text"))
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val writer = wavFileWriter()
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
        rows.map { row =>
          val id = row.getLong(0)
          val bytes = row.getString(1).getBytes("UTF-8")
          val n = 16 + bytes.length % 241
          md.reset()
          val dig = md.digest(bytes)
          val pcm = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val v = ((dig(i % 16) & 0xff) - 128) * 256
            pcm(2 * i) = (v & 0xff).toByte          // little-endian
            pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
            i += 1
          }
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
          val out = new java.io.ByteArrayOutputStream()
          writer match {
            case Some(w) =>
              w.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
            case None =>
              javax.sound.sampled.AudioSystem.write(
                ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
          }
          ais.close()
          WavMedia(id, out.toByteArray)
        }
      }
  }

  /** Exact integer stats over DECODED PCM samples — the audio analog of
    * [[ChannelStats]]. */
  final case class AudioStats(doc_id: Long, sample_rate: Int, channels: Int,
      bits: Int, n_samples: Long, duration_ms: Long,
      sum_pcm: Long, sum_sq: Long, min_pcm: Int, max_pcm: Int)

  /** REAL AUDIO KERNEL (no stub — the audio tier's upgrade matching
    * what n48 did for images): the WAV container is parsed by the
    * JDK's actual RIFF reader (header walk: format chunk → encoding,
    * rate, width, channel count; data chunk → frame stream), every
    * 16-bit little-endian sample is decoded, and the kernel emits
    * exact integer statistics — frame count, integer-floor duration,
    * Σ sample, Σ sample² (loudness/energy up to scale), min/max. The
    * n71 oracle reproduces ALL of it in closed form from the
    * [[wavMedia]] generation contract (md5 bytes × residue-class
    * counts), so actual decoded samples are verified against pure SQL
    * arithmetic — any drift in the RIFF writer, the parser, or the
    * sample decode breaks the hash. Same `mapPartitions` batch shape
    * as every media kernel; non-PCM or big-endian payloads fail
    * loudly rather than mis-decode. */
  def audioStats(media: Dataset[WavMedia]): Dataset[AudioStats] = {
    implicit val enc: Encoder[AudioStats] = Encoders.product[AudioStats]
    media.mapPartitions { rows =>
      val readers = audioReaders()
      rows.map { m =>
        val ais = openAudio(readers, m.payload)
        val fmt = ais.getFormat
        require(fmt.getEncoding ==
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
            fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian,
          s"doc ${m.doc_id}: unsupported WAV encoding $fmt — refusing to mis-decode")
        val data = ais.readAllBytes()
        ais.close()
        val nSamples = data.length / 2
        var sum = 0L; var sumSq = 0L
        var min = Int.MaxValue; var max = Int.MinValue
        var i = 0
        while (i < nSamples) {
          val v = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort.toInt
          sum += v
          sumSq += v.toLong * v
          if (v < min) min = v
          if (v > max) max = v
          i += 1
        }
        val sr = math.round(fmt.getSampleRate)
        val frames = nSamples / fmt.getChannels
        AudioStats(m.doc_id, sr, fmt.getChannels, fmt.getSampleSizeInBits,
          nSamples.toLong, frames.toLong * 1000L / sr, sum, sumSq, min, max)
      }
    }
  }

  /** documents → decoded-PCM stats through the real audio kernel. */
  def audioPcmStats(docs: DataFrame): DataFrame =
    audioStats(wavMedia(docs)).toDF()
}
