package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video payloads as opaque `binary`
 * columns with typed metadata, processed batch-wise inside executor tasks
 * (`mapPartitions` over a typed Dataset — the Scala analogue of
 * `mapInPandas` batching).
 *
 * The actual codecs are NOT in this container, so the decode is a
 * deterministic fake format ("GRFT" header + width/height/format fields);
 * everything Spark-side — schema, binary handling, batched partition
 * processing, partition sizing — is real and tested. Swapping
 * `decodeHeader` for a javacv/ffmpeg call is a one-function change.
 */
object Multimodal {

  final case class MediaRow(id: Long, media: Array[Byte])
  final case class MediaMeta(id: Long, format: String, width: Int, height: Int, n_bytes: Long, ok: Boolean)

  private val MAGIC = "GRFT".getBytes("US-ASCII")

  /** Render the fake media format: GRFT | fmt(4) | width(4) | height(4) | payload. */
  def encodeFake(format: String, width: Int, height: Int, payload: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16 + payload.length)
    bb.put(MAGIC)
    bb.put(format.padTo(4, ' ').substring(0, 4).getBytes("US-ASCII"))
    bb.putInt(width).putInt(height)
    bb.put(payload)
    bb.array()
  }

  /** STUB boundary: a real build decodes image/audio bytes here (libs not in
    * this container). The fake header decode keeps the pipeline testable. */
  def decodeHeader(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    if (bytes == null || bytes.length < 16) return None
    if (!bytes.take(4).sameElements(MAGIC)) return None
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.position(4)
    val fmt = new Array[Byte](4); bb.get(fmt)
    val w = bb.getInt; val h = bb.getInt
    Some((new String(fmt, "US-ASCII").trim, w, h))
  }

  /** Deterministic media synthesis from a documents table: payload = utf-8
    * text bytes, dimensions derived from the id. */
  def synthesize(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val enc = udf { (id: Long, text: String) =>
      val fmts = Array("img", "aud", "vid")
      val fmt = fmts((id % 3).toInt)
      encodeFake(fmt, (64 + id % 512).toInt, (64 + (id / 3) % 512).toInt,
        Option(text).getOrElse("").getBytes("UTF-8"))
    }
    docs.select(col(idCol).as("id"), enc(col(idCol), col(textCol)).as("media"))
  }

  /** Batched decode: one partition = one batch, like mapInPandas. */
  def decodeMeta(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id"), col("media")).as[MediaRow].mapPartitions { it =>
      it.map { r =>
        decodeHeader(r.media) match {
          case Some((fmt, w, h)) => MediaMeta(r.id, fmt, w, h, r.media.length.toLong, ok = true)
          case None              => MediaMeta(r.id, "unknown", 0, 0, Option(r.media).map(_.length.toLong).getOrElse(0L), ok = false)
        }
      }
    }
  }

  /** Resize stub: recompute header dimensions, payload untouched (a real
    * build rescales pixels here). Keeps binary-in/binary-out shape. */
  def resize(media: DataFrame, maxDim: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id"), col("media")).as[MediaRow].mapPartitions { it =>
      it.map { r =>
        decodeHeader(r.media) match {
          case Some((fmt, w, h)) if math.max(w, h) > maxDim =>
            val scale = maxDim.toDouble / math.max(w, h)
            val payload = r.media.drop(16)
            MediaRow(r.id, encodeFake(fmt, (w * scale).toInt, (h * scale).toInt, payload))
          case _ => r
        }
      }
    }.toDF("id", "media")
  }

  /** Frame-sample stub for "video" rows: emits every nth payload chunk as a
    * frame row (id, frame_idx, frame binary). */
  def sampleFrames(media: DataFrame, everyNth: Int, chunk: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("id"), col("media")).as[MediaRow].mapPartitions { it =>
      it.flatMap { r =>
        decodeHeader(r.media) match {
          case Some(("vid", _, _)) =>
            val payload = r.media.drop(16)
            payload.grouped(chunk).zipWithIndex.collect {
              case (frame, idx) if idx % everyNth == 0 => (r.id, idx, frame)
            }
          case _ => Iterator.empty
        }
      }
    }.toDF("id", "frame_idx", "frame")
  }
}
