package graft.ext

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.PolyHash

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines (SURVEY §7.6): media as opaque `binary` payloads + typed
  * metadata, with decode / feature-extraction / resize / frame-sampling as
  * partition-batched typed transforms.
  *
  * The actual codecs are STUBBED — this container has no image/audio
  * libraries — behind [[StubCodec]], a deterministic fake whose outputs are
  * pure arithmetic over the payload hash (and therefore oracle-checkable).
  * Everything around the stub is real and load-bearing:
  *  - the media schema (binary payload + typed metadata columns),
  *  - `Dataset[T]` encoders for each stage's row type,
  *  - `mapPartitions` batching: the codec is initialized ONCE per partition
  *    (the expensive-handle pattern that mapInPandas batches give Python
  *    pipelines) and streamed over the iterator — no per-row setup, no
  *    whole-partition materialization,
  *  - frame sampling as a flatMap fan-out (one row per sampled frame).
  *
  * Scale notes: decode is embarrassingly parallel; the only planning concern
  * is partition *balance* (media bytes are skewed in the wild), so the entry
  * point repartitions by media_id before the heavy stage. Feature vectors
  * feed [[Similarity]] unchanged.
  */
object Multimodal {

  val FeatureDim = 8

  /** One media object: opaque payload + typed metadata (schema-on-write). */
  case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      width: Int,
      height: Int,
      sample_rate: Int,
      duration_ms: Long,
      n_frames: Int)

  case class FeatureRow(media_id: Long, kind: String, features: Array[Double])

  case class FrameRow(media_id: Long, frame_idx: Int, frame_hash: Long)

  case class DecodedImage(media_id: Long, width: Int, height: Int, n_bytes: Long)

  /** The deterministic fake codec. A real deployment replaces exactly this
    * class (payload → pixels/samples); everything else stays. Instances are
    * created per PARTITION, never per row — `initCount` lets tests assert
    * that batching contract.
    */
  final class StubCodec {
    StubCodec.initCount.incrementAndGet()

    private def h(payload: Array[Byte]): Long =
      PolyHash.of(new String(payload, StandardCharsets.UTF_8))

    /** Fake embedding: f_i = ((h * (2i+3)) mod 997) / 997. */
    def features(payload: Array[Byte]): Array[Double] = {
      val hp = h(payload)
      Array.tabulate(FeatureDim)(i => (hp * (2 * i + 3) % 997).toDouble / 997.0)
    }

    /** Fake frame content hash for frame `idx`: hash of the frame's LOCAL
      * content slice (8 tokens starting at 4·idx), position-salted. Local
      * slices are the point — like real video frames, near-identical media
      * share the signatures of their unchanged regions, which is what makes
      * frame-signature near-dup detection ([[graft.ext.Dedup.jaccardOverKeys]]
      * over frames) meaningful.
      */
    def frameHash(payload: Array[Byte], idx: Int): Long = {
      val text = new String(payload, StandardCharsets.UTF_8)
      // SQL-trim (0x20 only) + limit=-1 split: Java's String.trim strips all
      // control whitespace and split() drops trailing empties — either would
      // shift chunks against the DuckDB oracle on texts with tabs/newlines
      // at the edges.
      var b = 0
      var e = text.length
      while (b < e && text.charAt(b) == ' ') b += 1
      while (e > b && text.charAt(e - 1) == ' ') e -= 1
      val toks = text.substring(b, e).split("\\s+", -1)
      val chunk = toks.slice(4 * idx, 4 * idx + 8).mkString(" ")
      (PolyHash.of(chunk) * 131 + idx) % PolyHash.Mod
    }

    /** Fake decode: byte count a real RGB decode would produce. */
    def decodedBytes(width: Int, height: Int): Long = width.toLong * height * 3

    /** Fake resampled-waveform checksum at the target rate. */
    def sampleChecksum(payload: Array[Byte], rate: Int): Long =
      h(payload) * rate % PolyHash.Mod
  }

  object StubCodec {
    /** Test hook: number of codec instantiations in this JVM. */
    val initCount = new java.util.concurrent.atomic.AtomicLong(0)
  }

  /** Model the documents table as a media table (deterministic): payload =
    * UTF-8 text bytes, kind round-robins by doc_id, metadata derived
    * arithmetically (all reproducible in the oracle).
    */
  def syntheticMedia(docs: DataFrame): Dataset[MediaRow] = {
    import docs.sparkSession.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        (lit(32) + (col("doc_id") % 8) * 16).cast("int").as("width"),
        (lit(32) + (col("doc_id") % 4) * 16).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        (lit(1000L) + col("doc_id") * 40L).as("duration_ms"),
        (lit(1) + col("doc_id") % 5).cast("int").as("n_frames"))
      .as[MediaRow]
  }

  /** Feature extraction, partition-batched. `numPartitions` balances the
    * decode stage (payload sizes are skewed in real corpora).
    */
  def extractFeatures(media: Dataset[MediaRow], numPartitions: Int = 0): Dataset[FeatureRow] = {
    import media.sparkSession.implicits._
    val balanced =
      if (numPartitions > 0) media.repartition(numPartitions, col("media_id"))
      else media
    balanced.mapPartitions { it =>
      val codec = new StubCodec // once per partition
      it.map(m => FeatureRow(m.media_id, m.kind, codec.features(m.payload)))
    }
  }

  /** Frame sampling: videos fan out to one row per sampled frame (every
    * `stride`-th frame), other kinds produce nothing.
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 2): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.filter(col("kind") === "video").mapPartitions { it =>
      val codec = new StubCodec
      it.flatMap { m =>
        (0 until m.n_frames by stride).iterator
          .map(i => FrameRow(m.media_id, i, codec.frameHash(m.payload, i)))
      }
    }
  }

  case class ResampledAudio(media_id: Long, rate: Int, n_samples: Long, checksum: Long)

  /** Audio resample (audio only): sample count from metadata at the target
    * rate, stubbed sample checksum. Completes the per-modality surface
    * (image→resize, video→frames, audio→resample, all→features).
    */
  def resampleAudio(media: Dataset[MediaRow], outRate: Int): Dataset[ResampledAudio] = {
    import media.sparkSession.implicits._
    media.filter(col("kind") === "audio").mapPartitions { it =>
      val codec = new StubCodec
      it.map { m =>
        val n = m.duration_ms * outRate / 1000
        ResampledAudio(m.media_id, outRate, n, codec.sampleChecksum(m.payload, outRate))
      }
    }
  }

  /** Image decode + resize: metadata-driven dimensions, stubbed pixels. */
  def decodeAndResize(media: Dataset[MediaRow], maxSide: Int): Dataset[DecodedImage] = {
    import media.sparkSession.implicits._
    media.filter(col("kind") === "image").mapPartitions { it =>
      val codec = new StubCodec
      it.map { m =>
        val scale = math.min(1.0, maxSide.toDouble / math.max(m.width, m.height))
        val (w, h) = ((m.width * scale).toInt, (m.height * scale).toInt)
        DecodedImage(m.media_id, w, h, codec.decodedBytes(w, h))
      }
    }
  }
}
