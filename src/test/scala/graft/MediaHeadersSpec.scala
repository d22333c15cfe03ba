package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MediaHeaders

/** The dependency-free PNG/JPEG header parsing behind the multimodal
  * decode op: real dimensions from hand-built container bytes, clean
  * rejection of everything else. */
class MediaHeadersSpec extends AnyFunSuite {

  private def pngBytes(w: Int, h: Int, colorType: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(40)
    out.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    out.putInt(13) // IHDR length
    out.put("IHDR".getBytes)
    out.putInt(w).putInt(h)
    out.put(8.toByte).put(colorType.toByte) // bit depth, color type
    out.put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
    out.array()
  }

  private def jpegBytes(w: Int, h: Int, channels: Int): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(64)
    out.put(0xff.toByte).put(0xd8.toByte)                 // SOI
    out.put(0xff.toByte).put(0xe0.toByte).putShort(4)     // APP0, len 4
    out.putShort(0)                                       // APP0 payload
    out.put(0xff.toByte).put(0xc0.toByte).putShort(11)    // SOF0, len
    out.put(8.toByte).putShort(h.toShort).putShort(w.toShort)
    out.put(channels.toByte)
    out.array()
  }

  test("PNG IHDR: dimensions and channels per color type") {
    assert(MediaHeaders.parse(pngBytes(640, 480, 6))
      .contains(MediaHeaders.Header("image/png", 640, 480, 4)))
    assert(MediaHeaders.parse(pngBytes(1, 1, 0))
      .contains(MediaHeaders.Header("image/png", 1, 1, 1)))
    assert(MediaHeaders.parse(pngBytes(8192, 2, 2))
      .contains(MediaHeaders.Header("image/png", 8192, 2, 3)))
  }

  test("JPEG SOF0: dimensions after APP segments") {
    assert(MediaHeaders.parse(jpegBytes(320, 200, 3))
      .contains(MediaHeaders.Header("image/jpeg", 320, 200, 3)))
  }

  test("JPEG: 0xFF fill padding and TEM markers do not desync the scan") {
    // T.81 §B.1.1.2: markers may be preceded by any number of 0xFF fill
    // bytes; TEM (0x01) is standalone. Both used to be misread as
    // length-bearing markers, silently dropping valid JPEGs to the stub.
    val out = java.nio.ByteBuffer.allocate(64)
    out.put(0xff.toByte).put(0xd8.toByte)                 // SOI
    out.put(0xff.toByte).put(0xff.toByte).put(0xff.toByte) // two fill bytes...
    out.put(0xe0.toByte).putShort(4).putShort(0)          // ...then APP0
    out.put(0xff.toByte).put(0x01.toByte)                 // TEM, standalone
    out.put(0xff.toByte).put(0xc0.toByte).putShort(11)    // SOF0
    out.put(8.toByte).putShort(240.toShort).putShort(424.toShort)
    out.put(1.toByte)
    assert(MediaHeaders.parse(out.array())
      .contains(MediaHeaders.Header("image/jpeg", 424, 240, 1)))
  }

  test("non-media payloads are rejected, not misparsed") {
    assert(MediaHeaders.parse("plain text payload here".getBytes).isEmpty)
    assert(MediaHeaders.parse(Array.emptyByteArray).isEmpty)
    assert(MediaHeaders.parse(Array[Byte](0x89.toByte, 0x50)).isEmpty) // truncated magic
  }

  test("decode op routes a PNG payload through the REAL header path") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // smuggle a PNG into the same pipeline shape the op uses
    val src = Seq((1L, pngBytes(100, 50, 2)), (2L, "text".getBytes))
      .toDF("doc_id", "payload").as[(Long, Array[Byte])]
    val out = src.mapPartitions { it =>
      it.map { case (id, bytes) =>
        MediaHeaders.parse(bytes) match {
          case Some(h) => (id, h.mime, h.width, h.height, h.channels)
          case None => (id, "application/octet-stream", -1, -1, -1)
        }
      }
    }.toDF("doc_id", "mime", "w", "h", "c").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(out(1L) === (("image/png", 100)))
    assert(out(2L) === (("application/octet-stream", -1)))
  }
}
