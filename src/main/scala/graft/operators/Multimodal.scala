package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads with typed metadata, processed per-partition in batches.
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic stub ([[decodeStub]]); everything
  * around it — binary column construction, metadata struct schema,
  * partition-batched processing via `mapPartitions`, output encoder —
  * is the real Spark plumbing a production decode UDF would use. At
  * scale the payload column stays columnar parquet binary; decode runs
  * executor-side per partition with zero driver involvement.
  */
object Multimodal {

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

  /** STUB DECODE — stands in for an image decoder (no codec libs in
    * this container). Deterministic fake: dimensions derived from the
    * byte length, signature = md5 prefix of the payload. The
    * mapPartitions batch shape (iterator-in/iterator-out per partition,
    * one digest instance per batch) is exactly how a real decoder runs. */
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
    * input. */
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
    * ANN is the composed pipeline. */
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

  /** Resize record: original fake dims + aspect-fit target dims. */
  final case class Resized(doc_id: Long, width: Int, height: Int,
      new_w: Int, new_h: Int, sig: String)

  /** STUB RESIZE — aspect-preserving fit into 64×64 over the fake
    * decoded dimensions (integer math, exactly mirrored by the oracle;
    * a real impl resamples pixels here). Same per-partition batch shape
    * as the other media stubs. */
  def resize(media: DataFrame, maxSide: Int = 64): Dataset[Resized] = {
    implicit val enc: Encoder[Resized] = Encoders.product[Resized]
    media.select(col("doc_id"), col("payload"))
      .mapPartitions { rows =>
        val md = java.security.MessageDigest.getInstance("MD5")
        rows.map { row =>
          val id = row.getLong(0)
          val p = row.getAs[Array[Byte]](1)
          val w = p.length % 640
          val h = p.length % 480
          val scale = math.max(w, h)
          val (nw, nh) =
            if (scale <= maxSide) (w, h)
            else (w * maxSide / scale, h * maxSide / scale)
          md.reset()
          val sig = md.digest(p).take(8).map("%02x".format(_)).mkString
          Resized(id, w, h, nw, nh, sig)
        }
      }
  }

  /** documents → resized-media metadata (stub resample, real plumbing). */
  def resizedMeta(docs: DataFrame): DataFrame = resize(mediaTable(docs)).toDF()
}
