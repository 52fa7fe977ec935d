package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, processed in batched per-partition passes.
  *
  * The Spark-side shape is real and tested — binary payload column, schema,
  * partition-batched processing (the Scala analog of mapInPandas batches),
  * deterministic output schema. The actual codec call is STUBBED
  * (FakeDecoder) because no image/audio libraries exist in this
  * environment; swap `FakeDecoder.decode` for a real codec binding to
  * productionize.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])
  case class DecodedMeta(doc_id: Long, media_type: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, decoded_ok: Boolean)

  /** STUB decoder — deterministic fake standing in for the real codec.
    * Derives "dimensions" from payload bytes so tests are stable. */
  object FakeDecoder {
    def decode(payload: Array[Byte], mediaType: String): (Int, Int, Int) = {
      val h = payload.foldLeft(17L)((acc, b) => (acc * 31 + (b & 0xff)) & 0x7fffffffL)
      val width = 320 + (h % 1600).toInt
      val height = 240 + ((h / 1600) % 840).toInt
      val frames = mediaType match {
        case "video" => 1 + (payload.length % 240)
        case "audio" => 1 + (payload.length % 48000)
        case _ => 1
      }
      (width, height, frames)
    }
  }

  /** Documents -> opaque binary payloads with a media_type column
    * (deterministic synthesis: payload = utf8 bytes of text). */
  def asMedia(docs: DataFrame): Dataset[MediaRecord] = {
    val mt = when(col("doc_id") % 3 === 0, lit("image"))
      .when(col("doc_id") % 3 === 1, lit("audio")).otherwise(lit("video"))
    docs.select(col("doc_id"), mt.as("media_type"),
        col("text").cast("binary").as("payload"))
      .as[MediaRecord](Encoders.product[MediaRecord])
  }

  /** Partition-batched decode: one iterator pass per partition (the Scala
    * analog of a mapInPandas batch), emitting typed metadata. */
  def decodeMeta(media: Dataset[MediaRecord]): Dataset[DecodedMeta] =
    media.mapPartitions { it =>
      it.map { r =>
        val (w, h, f) = FakeDecoder.decode(r.payload, r.media_type)
        DecodedMeta(r.doc_id, r.media_type, r.payload.length.toLong, w, h, f,
          decoded_ok = true)
      }
    }(Encoders.product[DecodedMeta])

  /** Full pipeline: documents -> media -> decoded metadata DataFrame. */
  def pipeline(docs: DataFrame): DataFrame = decodeMeta(asMedia(docs)).toDF()

  case class Frame(doc_id: Long, frame_idx: Int, payload: Array[Byte])

  /** Frame sampling: every Nth frame of each video as its own row —
    * flatMap inside one partition pass; output rows bounded by
    * n_frames/everyN per video. Frame extraction itself is the stubbed
    * codec step (deterministic byte slice standing in for the decoded
    * frame). */
  def sampleFrames(media: Dataset[MediaRecord], everyN: Int = 24): Dataset[Frame] = {
    require(everyN > 0)
    media.mapPartitions { it =>
      it.flatMap { r =>
        if (r.media_type != "video") Iterator.empty
        else {
          val (_, _, frames) = FakeDecoder.decode(r.payload, r.media_type)
          (0 until frames by everyN).iterator.map { f =>
            // STUB frame bytes: rotated slice of the payload, deterministic
            val off = if (r.payload.isEmpty) 0 else f % r.payload.length
            Frame(r.doc_id, f, r.payload.drop(off) ++ r.payload.take(off))
          }
        }
      }
    }(Encoders.product[Frame])
  }

  /** Resize-shaped transform: payload -> bounded-size thumbnail payload
    * (STUB: truncation standing in for a real scaler; the Spark-side
    * contract — binary in, bounded binary out, schema preserved — is
    * real). */
  def thumbnail(media: Dataset[MediaRecord], maxBytes: Int = 256): Dataset[MediaRecord] =
    media.mapPartitions { it =>
      it.map(r => r.copy(payload = r.payload.take(maxBytes)))
    }(Encoders.product[MediaRecord])
}
