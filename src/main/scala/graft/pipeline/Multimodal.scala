package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque binary columns
  * with typed metadata, processed in batched per-partition passes.
  *
  * The media payloads are REAL container files (PNG/JPEG/GIF/WAV/AVI —
  * see [[MediaCodec]]): magic numbers, chunk/segment structure, CRCs and
  * spec-defined header fields are genuine, synthesized deterministically
  * from each doc and parsed back by real byte-level walkers. The only
  * stand-in left is the pixel/sample stream INSIDE the containers (no
  * image/audio codec libraries exist in this environment): the document
  * text bytes ride as the embedded stream payload, so decode work is
  * real container parsing plus a deterministic body slice where a pixel
  * decoder would run in production.
  *
  * The Spark-side shape is the point: binary payload column, typed
  * metadata schema, partition-batched processing (the Scala analog of
  * mapInPandas batches), corrupt blobs flowing through as
  * decoded_ok=false data rather than exceptions. All three operators are
  * oracle-gated (q51/q75/q76): the DuckDB side re-derives every parsed
  * field from the synthesis closed forms, so each gate run re-proves the
  * parsers invert the writers on real bytes.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, media_type: String, payload: Array[Byte])
  case class DecodedMeta(doc_id: Long, media_type: String, format: String,
      n_bytes: Long, width: Int, height: Int, n_frames: Int, decoded_ok: Boolean)

  /** Documents -> real media containers with a media_type column.
    * media_type rotates by doc_id mod 3 (image/audio/video); the
    * container format, dimensions and frame counts are MediaCodec's
    * deterministic closed forms; the text bytes become the embedded
    * stream body. Docs with doc_id mod 97 == 0 synthesize CORRUPT
    * payloads (0x00-prefixed raw bytes) to exercise the failure path. */
  def asMedia(docs: DataFrame): Dataset[MediaRecord] = {
    val mt = when(col("doc_id") % 3 === 0, lit("image"))
      .when(col("doc_id") % 3 === 1, lit("audio")).otherwise(lit("video"))
    docs.select(col("doc_id"), mt.as("media_type"),
        col("text").cast("binary").as("body"))
      .as[(Long, String, Array[Byte])](
        Encoders.tuple(Encoders.scalaLong, Encoders.STRING, Encoders.BINARY))
      .mapPartitions { it =>
        it.map { case (id, m, body) => MediaRecord(id, m, MediaCodec.encode(id, body)) }
      }(Encoders.product[MediaRecord])
  }

  /** Partition-batched decode: one iterator pass per partition (the Scala
    * analog of a mapInPandas batch), REAL header parsing per payload,
    * emitting typed metadata. Unparseable payloads yield a zeroed row
    * with decoded_ok=false — corrupt blobs are data, not exceptions. */
  def decodeMeta(media: Dataset[MediaRecord]): Dataset[DecodedMeta] =
    media.mapPartitions { it =>
      it.map { r =>
        val m = MediaCodec.decode(r.payload)
        DecodedMeta(r.doc_id, r.media_type, m.format, r.payload.length.toLong,
          m.width, m.height, m.nFrames, m.ok)
      }
    }(Encoders.product[DecodedMeta])

  /** Full pipeline: documents -> media -> decoded metadata DataFrame. */
  def pipeline(docs: DataFrame): DataFrame = decodeMeta(asMedia(docs)).toDF()

  /** Asset-QA rollup — the dashboard over [[pipeline]]'s decode run
    * ("which format from which feed is breaking, and how big is the
    * broken slice?"): per (media_type, format), asset count, decode
    * successes, the decode rate, exact total bytes, and the mean
    * width/height over DECODED rows (a failed decode has no
    * dimensions; averaging its zeros would understate real assets).
    * Exact longs + two IEEE divisions; one map-combinable aggregate
    * over the decode output. */
  def qaReport(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val meta = pipeline(docs)
    meta.groupBy(col("media_type"), col("format"))
      .agg(count(lit(1)).as("n_assets"),
        sum(when(col("decoded_ok"), 1L).otherwise(0L)).as("n_ok"),
        sum(col("n_bytes")).as("total_bytes"),
        sum(when(col("decoded_ok"), col("width").cast("long"))).as("__sw"),
        sum(when(col("decoded_ok"), col("height").cast("long"))).as("__sh"))
      .select(col("media_type"), col("format"), col("n_assets"), col("n_ok"),
        (col("n_ok").cast("double") / col("n_assets").cast("double"))
          .as("ok_rate"),
        col("total_bytes"),
        when(col("n_ok") === 0L, lit(null).cast("double"))
          .otherwise(col("__sw").cast("double") / col("n_ok").cast("double"))
          .as("mean_width"),
        when(col("n_ok") === 0L, lit(null).cast("double"))
          .otherwise(col("__sh").cast("double") / col("n_ok").cast("double"))
          .as("mean_height"))
  }

  case class Frame(doc_id: Long, frame_idx: Int, payload: Array[Byte])

  /** Frame sampling: every Nth frame of each parseable video as its own
    * row. The frame COUNT is the real avih dwTotalFrames read from the
    * container, and the sliced bytes come from the real movi stream
    * chunk located by the RIFF walk; only the per-frame byte extraction
    * (a deterministic rotated slice of the stream body) stands in for a
    * video codec. Output rows are bounded by n_frames/everyN per
    * video. */
  def sampleFrames(media: Dataset[MediaRecord], everyN: Int = 24): Dataset[Frame] = {
    require(everyN > 0)
    media.mapPartitions { it =>
      it.flatMap { r =>
        if (r.media_type != "video") Iterator.empty
        else {
          val m = MediaCodec.decode(r.payload)
          if (!m.ok || m.format != "avi") Iterator.empty
          else {
            val body = r.payload.slice(m.bodyOffset, m.bodyOffset + m.bodyLen)
            (0 until m.nFrames by everyN).iterator.map { f =>
              // stand-in frame bytes: rotated slice of the real stream body
              val off = if (body.isEmpty) 0 else f % body.length
              Frame(r.doc_id, f, body.drop(off) ++ body.take(off))
            }
          }
        }
      }
    }(Encoders.product[Frame])
  }

  case class Thumb(doc_id: Long, media_type: String, format: String,
      width: Int, height: Int, thumb_w: Int, thumb_h: Int, payload: Array[Byte])

  /** Thumbnail planning: REAL parsed dimensions scaled aspect-preserving
    * into a `box`-pixel bounding square with exact integer arithmetic
    * (floor(d * box / maxDim), min 1), plus a bounded-size payload slice
    * of the real embedded stream body standing in for the re-encoded
    * pixels. Non-image and unparseable records pass through with zeroed
    * thumb dims and an empty payload. */
  def thumbnail(media: Dataset[MediaRecord], box: Int = 128,
      maxBytes: Int = 256): Dataset[Thumb] = {
    require(box > 0 && maxBytes >= 0)
    media.mapPartitions { it =>
      it.map { r =>
        val m = MediaCodec.decode(r.payload)
        // non-positive parsed dims (possible only on foreign/hostile
        // containers — our writers emit 1..) fall through as unplannable
        val isImage = m.ok && m.width > 0 && m.height > 0 &&
          (m.format == "png" || m.format == "jpeg" || m.format == "gif")
        if (!isImage) Thumb(r.doc_id, r.media_type, m.format, m.width, m.height,
          0, 0, Array.emptyByteArray)
        else {
          val maxDim = math.max(m.width, m.height)
          // Long arithmetic: w*box overflows Int for spec-legal foreign
          // dims (e.g. a PNG declaring width 2e7 at box=128); the
          // quotient itself is <= box, so the narrowing back is exact
          val (tw, th) =
            if (maxDim <= box) (m.width, m.height)
            else (math.max(1L, m.width.toLong * box / maxDim).toInt,
              math.max(1L, m.height.toLong * box / maxDim).toInt)
          val body = r.payload.slice(m.bodyOffset, m.bodyOffset + math.min(maxBytes, m.bodyLen))
          Thumb(r.doc_id, r.media_type, m.format, m.width, m.height, tw, th, body)
        }
      }
    }(Encoders.product[Thumb])
  }
}
