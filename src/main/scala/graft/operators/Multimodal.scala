package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north star): image/audio/video as opaque
  * `binary` columns with typed metadata structs. The real decode needs
  * native codecs absent from this container, so the decode kernel is a
  * clearly-marked deterministic STUB ([[FakeImageCodec]]); the Spark-side
  * contract — binary payload schema, batch-shaped partition processing,
  * metadata struct, frame sampling — is real and tested.
  *
  * In Scala the `mapInPandas` batch-UDF shape becomes `mapPartitions`
  * over a typed Dataset: one codec instance per partition (the expensive
  * init the batch shape exists to amortize), streaming rows through it.
  */
object Multimodal {

  case class MediaMeta(width: Int, height: Int, channels: Int, format: String)
  case class DecodedImage(doc_id: Long, width: Int, height: Int,
                          channels: Int, format: String, n_bytes: Long)
  case class FrameOffset(doc_id: Long, frame_no: Long, offset: Long)

  /** STUB image codec: parses deterministic pseudo-metadata from the
    * payload bytes. A production build replaces `decodeMeta` with a real
    * image library behind the same signature. */
  object FakeImageCodec extends Serializable {
    /** Deterministic fake "decode": metadata derived from payload length
      * and first bytes — stable under task retries. */
    def decodeMeta(payload: Array[Byte]): MediaMeta = {
      // ??? — real codec goes here; deterministic fake for the harness:
      val n = if (payload == null) 0 else payload.length
      val b0 = if (n > 0) payload(0) & 0xFF else 0
      MediaMeta(width = 64 + (n % 512), height = 64 + (b0 * 4),
        channels = 3, format = if (n % 2 == 0) "png" else "jpeg")
    }

    /** Deterministic fake resize: new metadata after fitting into a box. */
    def resize(meta: MediaMeta, maxSide: Int): MediaMeta = {
      val scale = math.min(1.0, maxSide.toDouble / math.max(meta.width, meta.height))
      meta.copy(width = (meta.width * scale).toInt, height = (meta.height * scale).toInt)
    }

    /** Deterministic fake frame sampling for "video" payloads: frame
      * offsets (byte positions) every `stride` bytes. */
    def sampleFrames(payload: Array[Byte], stride: Int): Seq[Long] =
      if (payload == null || payload.isEmpty) Nil
      else 0L.until(payload.length.toLong, stride.toLong)
  }

  /** Attach a binary media column synthesized from text (the testdata has
    * no real media; payload = UTF-8 bytes stands in for image bytes —
    * the schema/partitioning contract is what's exercised). */
  def withBinaryPayload(df: DataFrame, from: String, as: String = "media"): DataFrame =
    df.withColumn(as, encode(col(from), "UTF-8"))

  /** One row per sampled frame of each "video" payload — the typed
    * explode shape of frame extraction (one codec per partition, rows
    * streamed). The stub's offsets are arithmetic, which is what makes
    * the whole operator DuckDB-oracle-able (q69). */
  def sampleFrameOffsets(df: DataFrame, idCol: String = "doc_id",
                         mediaCol: String = "media", stride: Int = 100): Dataset[FrameOffset] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(mediaCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = FakeImageCodec // per-partition init point
        rows.flatMap { case (id, payload) =>
          codec.sampleFrames(payload, stride).zipWithIndex.map {
            case (off, i) => FrameOffset(id, i.toLong, off)
          }
        }
      }
  }

  case class AudioWindow(doc_id: Long, window_no: Long,
                         start_sample: Long, end_sample: Long)

  /** One row per analysis window of each "audio" payload — the
    * spectrogram-framing plumbing (window/hop in samples over PCM16
    * mono: n_samples = n_bytes/2), same typed-explode shape as
    * [[sampleFrameOffsets]] and equally arithmetic → oracle-able
    * (q138). Trailing partial windows are dropped (STFT convention). */
  def sampleAudioWindows(df: DataFrame, idCol: String = "doc_id",
                         mediaCol: String = "media",
                         windowSamples: Long = 400, hopSamples: Long = 160): Dataset[AudioWindow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(mediaCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, payload) =>
          val nSamples = if (payload == null) 0L else payload.length.toLong / 2
          val lastStart = nSamples - windowSamples
          if (lastStart < 0) Iterator.empty
          else (0L to lastStart by hopSamples).iterator.zipWithIndex.map {
            case (st, i) => AudioWindow(id, i.toLong, st, st + windowSamples)
          }
        }
      }
  }

  /** Decode metadata for each media payload — one codec per partition,
    * rows streamed (never materialized per-partition). */
  def decodeMetadata(df: DataFrame, idCol: String = "doc_id",
                     mediaCol: String = "media"): Dataset[DecodedImage] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(mediaCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        val codec = FakeImageCodec // per-partition init point
        rows.map { case (id, payload) =>
          val m = codec.decodeMeta(payload)
          DecodedImage(id, m.width, m.height, m.channels, m.format,
            if (payload == null) 0L else payload.length.toLong)
        }
      }
  }
}
