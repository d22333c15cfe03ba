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

  private def gifBytes(w: Int, h: Int, v87: Boolean = false): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put((if (v87) "GIF87a" else "GIF89a").getBytes)
    out.putShort(w.toShort).putShort(h.toShort)
    out.put(0.toByte).put(0.toByte).put(0.toByte)
    out.array()
  }

  private def bmpBytes(w: Int, h: Int, bpp: Int, core: Boolean = false): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(64)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put('B'.toByte).put('M'.toByte)
    out.putInt(64).putInt(0).putInt(54) // file size, reserved, pixel offset
    if (core) {
      out.putInt(12).putShort(w.toShort).putShort(h.toShort)
      out.putShort(1.toShort).putShort(bpp.toShort)
    } else {
      out.putInt(40).putInt(w).putInt(h)
      out.putShort(1.toShort).putShort(bpp.toShort)
    }
    out.array()
  }

  private def webpVp8l(w: Int, h: Int, alpha: Boolean): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(40)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes).putInt(32).put("WEBP".getBytes)
    out.put("VP8L".getBytes).putInt(12)
    out.put(0x2f.toByte)
    val bits = ((w - 1) & 0x3fff) | (((h - 1) & 0x3fff) << 14) |
      (if (alpha) 1 << 28 else 0)
    out.putInt(bits)
    out.array()
  }

  test("GIF screen descriptor: LE dimensions, both versions, palette = 1") {
    assert(MediaHeaders.parse(gifBytes(320, 200))
      .contains(MediaHeaders.Header("image/gif", 320, 200, 1)))
    assert(MediaHeaders.parse(gifBytes(1, 7, v87 = true))
      .contains(MediaHeaders.Header("image/gif", 1, 7, 1)))
    assert(MediaHeaders.parse("GIF88a??".getBytes).isEmpty) // bad version
  }

  test("BMP DIB variants: info s32 dims (|negative height|), core u16, bpp map") {
    assert(MediaHeaders.parse(bmpBytes(800, 600, 24))
      .contains(MediaHeaders.Header("image/bmp", 800, 600, 3)))
    assert(MediaHeaders.parse(bmpBytes(64, -64, 32))
      .contains(MediaHeaders.Header("image/bmp", 64, 64, 4)))  // top-down rows
    assert(MediaHeaders.parse(bmpBytes(16, 16, 8))
      .contains(MediaHeaders.Header("image/bmp", 16, 16, 1)))  // palette
    assert(MediaHeaders.parse(bmpBytes(40, 30, 24, core = true))
      .contains(MediaHeaders.Header("image/bmp", 40, 30, 3)))
    assert(MediaHeaders.parse(bmpBytes(8, 8, 13)).isEmpty)     // bogus bpp
    // 16 bpp is not a legal BITMAPCOREHEADER depth (core allows
    // {1,4,8,24}) — reject as malformed rather than guess channels
    // (r19 ADVICE); the INFO header still takes 16 as best-effort 3
    assert(MediaHeaders.parse(bmpBytes(8, 8, 16, core = true)).isEmpty)
    assert(MediaHeaders.parse(bmpBytes(8, 8, 16))
      .contains(MediaHeaders.Header("image/bmp", 8, 8, 3)))
  }

  test("WebP: VP8 lossy start code, VP8L bitfield + alpha, VP8X canvas") {
    // VP8 (lossy): frame tag + 9D012A + 14-bit LE dims
    val vp8 = java.nio.ByteBuffer.allocate(32)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vp8.put("RIFF".getBytes).putInt(24).put("WEBP".getBytes)
    vp8.put("VP8 ".getBytes).putInt(12)
    vp8.put(0.toByte).put(0.toByte).put(0.toByte)       // frame tag
    vp8.put(0x9d.toByte).put(0x01.toByte).put(0x2a.toByte)
    vp8.putShort(640.toShort).putShort(360.toShort)
    assert(MediaHeaders.parse(vp8.array())
      .contains(MediaHeaders.Header("image/webp", 640, 360, 3)))
    assert(MediaHeaders.parse(webpVp8l(200, 100, alpha = false))
      .contains(MediaHeaders.Header("image/webp", 200, 100, 3)))
    assert(MediaHeaders.parse(webpVp8l(16384, 1, alpha = true))
      .contains(MediaHeaders.Header("image/webp", 16384, 1, 4)))
    // VP8X (extended): 24-bit LE canvas minus-one, alpha flag bit 4
    val vp8x = java.nio.ByteBuffer.allocate(32)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vp8x.put("RIFF".getBytes).putInt(22).put("WEBP".getBytes)
    vp8x.put("VP8X".getBytes).putInt(10)
    vp8x.put(0x10.toByte)                               // alpha flag
    vp8x.put(0.toByte).put(0.toByte).put(0.toByte)      // reserved
    vp8x.put(Array[Byte](0x1f, 0x03, 0x00))             // width-1 = 799
    vp8x.put(Array[Byte](0x57, 0x02, 0x00))             // height-1 = 599
    assert(MediaHeaders.parse(vp8x.array())
      .contains(MediaHeaders.Header("image/webp", 800, 600, 4)))
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
