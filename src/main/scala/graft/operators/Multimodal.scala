package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: image/audio/video payloads as opaque `binary`
 * columns with typed metadata, processed batch-wise inside executor tasks
 * (`mapPartitions` over a typed Dataset — the Scala analogue of
 * `mapInPandas` batching).
 *
 * Metadata decode handles REAL container formats at the header level —
 * PNG (IHDR chunk) and JPEG (SOF marker scan) width/height extraction,
 * the same parse an `imagesize`-style tool does — plus the deterministic
 * "GRFT" fake format for synthetic pipelines. Full pixel/sample decode
 * needs codec libraries that are NOT in this container; that boundary is
 * `decodeHeader` → a javacv/ffmpeg call is a one-function swap, and
 * everything Spark-side (schema, binary handling, batched partition
 * processing, partition sizing) is real and tested.
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

  private val PNG_SIG: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) | ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  /** PNG: 8-byte signature, then the FIRST chunk must be IHDR (PNG spec
    * §5.6) with big-endian u32 width/height at byte offsets 16/20. */
  private def decodePng(b: Array[Byte]): Option[(String, Int, Int)] =
    if (b.length >= 24 && b.take(8).sameElements(PNG_SIG) &&
      b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      Some(("png", be32(b, 16), be32(b, 20)))
    else None

  /** Start-of-frame markers carrying dimensions: C0–CF minus DHT (C4),
    * JPG-extension (C8) and DAC (CC). */
  private def isSof(m: Int): Boolean =
    m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc

  /** JPEG: SOI, then walk marker segments to the first SOFn — height/width
    * are big-endian u16 at +5/+7 of the SOF segment (ITU T.81 §B.2.2).
    * Stops (None) at EOI/SOS without a SOF, or on any malformed length. */
  private def decodeJpeg(b: Array[Byte]): Option[(String, Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None // lost marker sync
      var j = i
      while (j + 1 < b.length && (b(j + 1) & 0xff) == 0xff) j += 1 // fill bytes
      val m = b(j + 1) & 0xff
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i = j + 2 // standalone markers
      else {
        if (j + 3 >= b.length) return None
        val segLen = be16(b, j + 2)
        if (segLen < 2) return None
        if (isSof(m)) {
          if (j + 9 > b.length) return None // need len(2)+precision(1)+h(2)+w(2)
          return Some(("jpeg", be16(b, j + 7), be16(b, j + 5)))
        }
        if (m == 0xd9 || m == 0xda) return None // EOI / entropy data — no SOF
        i = j + 2 + segLen
      }
    }
    None
  }

  private def decodeGrft(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    if (bytes.length < 16 || !bytes.take(4).sameElements(MAGIC)) return None
    val bb = java.nio.ByteBuffer.wrap(bytes)
    bb.position(4)
    val fmt = new Array[Byte](4); bb.get(fmt)
    val w = bb.getInt; val h = bb.getInt
    Some((new String(fmt, "US-ASCII").trim, w, h))
  }

  /** Header-level metadata decode: real PNG/JPEG parsing, plus the GRFT
    * fake format. The DEEP-decode boundary (pixels/samples — codec libs
    * not in this container) stays behind this function. */
  def decodeHeader(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    if (bytes == null || bytes.length < 4) return None
    decodePng(bytes).orElse(decodeJpeg(bytes)).orElse(decodeGrft(bytes))
  }

  /** Minimal REAL PNG file prefix (signature + complete IHDR chunk with a
    * correct CRC32) — what any header-level size extractor reads. */
  def pngHeader(width: Int, height: Int): Array[Byte] = {
    val body = java.nio.ByteBuffer.allocate(17)
    body.put("IHDR".getBytes("US-ASCII"))
    body.putInt(width).putInt(height)
    body.put(8.toByte).put(6.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    val crc = new java.util.zip.CRC32
    crc.update(body.array())
    val bb = java.nio.ByteBuffer.allocate(8 + 4 + 17 + 4)
    bb.put(PNG_SIG).putInt(13).put(body.array()).putInt(crc.getValue.toInt)
    bb.array()
  }

  /** Minimal REAL JPEG file prefix: SOI, JFIF APP0, SOF0 with the given
    * dimensions (ITU T.81 / JFIF 1.02 layout). */
  def jpegHeader(width: Int, height: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(2 + 18 + 19)
    bb.put(0xff.toByte).put(0xd8.toByte) // SOI
    bb.put(0xff.toByte).put(0xe0.toByte).putShort(16) // APP0, len 16
    bb.put("JFIF".getBytes("US-ASCII")).put(0.toByte)
    bb.put(1.toByte).put(1.toByte).put(0.toByte) // version 1.1, no units
    bb.putShort(1).putShort(1).put(0.toByte).put(0.toByte) // density, no thumb
    bb.put(0xff.toByte).put(0xc0.toByte).putShort(17) // SOF0, len 8 + 3*3
    bb.put(8.toByte).putShort(height.toShort).putShort(width.toShort).put(3.toByte)
    for (c <- 1 to 3) bb.put(c.toByte).put(0x11.toByte).put(0.toByte)
    bb.array()
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
