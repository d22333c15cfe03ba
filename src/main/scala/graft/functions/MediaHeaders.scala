package graft.functions

/** Dependency-free media-container header parsing for the multimodal
  * decode op (B32). The environment has no image libraries, but image
  * DIMENSIONS need none — they are fixed-offset (PNG IHDR, GIF screen
  * descriptor, BMP DIB header) or marker/chunk-scan (JPEG SOFn, WebP
  * RIFF) byte reads. Payloads that are none of these fall back to the
  * op's clearly-declared deterministic stub, so the decode is REAL for
  * real images and the DuckDB-checked arithmetic on the synthetic text
  * payloads is unchanged. Formats: PNG, JPEG (r4); GIF87a/89a, BMP
  * (core + info DIB), WebP (VP8/VP8L/VP8X) (r19).
  */
object MediaHeaders {

  final case class Header(mime: String, width: Int, height: Int, channels: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le24(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16)
  private def le32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)

  private val PngMagic = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  /** PNG: 8-byte signature, then the IHDR chunk — width/height at fixed
    * offsets 16/20, color type at 25 (spec: ISO 15948 §11.2.2). */
  private def png(b: Array[Byte]): Option[Header] = {
    if (b.length < 26) return None
    var i = 0
    while (i < 8) { if (u8(b, i) != PngMagic(i)) return None; i += 1 }
    // IHDR must be the first chunk
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return None
    val channels = u8(b, 25) match {
      case 0 => 1 // grayscale
      case 2 => 3 // truecolor
      case 3 => 1 // palette
      case 4 => 2 // gray + alpha
      case 6 => 4 // truecolor + alpha
      case _ => return None
    }
    Some(Header("image/png", be32(b, 16), be32(b, 20), channels))
  }

  /** JPEG: scan marker segments from SOI until a frame header (SOFn,
    * 0xC0–0xCF except DHT/JPG/DAC); height/width/components follow the
    * segment's precision byte (ITU T.81 §B.2.2). */
  private def jpeg(b: Array[Byte]): Option[Header] = {
    if (b.length < 4 || u8(b, 0) != 0xff || u8(b, 1) != 0xd8) return None
    var i = 2
    while (i + 1 < b.length) {
      if (u8(b, i) != 0xff) return None // lost marker sync
      // any number of 0xFF fill bytes may pad the gap before a marker
      // (T.81 §B.1.1.2) — skip them instead of misreading one as a
      // length-bearing marker
      var m = i + 1
      while (m < b.length && u8(b, m) == 0xff) m += 1
      if (m >= b.length) return None
      val marker = u8(b, m)
      // standalone markers carry no length: SOI, RSTn, TEM
      if (marker == 0xd8 || marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) i = m + 1
      else if (marker == 0x00) return None // stuffed byte — not a marker
      else {
        if (m + 2 >= b.length) return None
        val len = be16(b, m + 1)
        if (len < 2) return None
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (m + 8 >= b.length) return None
          val height = be16(b, m + 4)
          val width = be16(b, m + 6)
          val channels = u8(b, m + 8)
          return Some(Header("image/jpeg", width, height, channels))
        }
        i = m + 1 + len
      }
    }
    None
  }

  /** GIF: "GIF87a"/"GIF89a" signature, then the logical screen
    * descriptor — width/height as little-endian u16 at offsets 6/8
    * (GIF89a spec §18). GIF frames are palette-indexed, so channels =
    * 1 (the PNG palette convention above). */
  private def gif(b: Array[Byte]): Option[Header] = {
    if (b.length < 10) return None
    if (!(b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')) return None
    Some(Header("image/gif", le16(b, 6), le16(b, 8), 1))
  }

  /** BMP: "BM" file header, then the DIB header whose leading u32 size
    * discriminates the variant — BITMAPCOREHEADER (12: u16 dims at
    * 18/20, bpp at 24) vs BITMAPINFOHEADER and successors (>= 40: s32
    * dims at 18/22 — height may be negative for top-down rows, take
    * |h| — bpp at 28). Channels: bpp/8 for 24/32-bit pixels, palette
    * (1/4/8 bpp) = 1, 16-bit masked = 3 as a BEST-EFFORT guess — an
    * exact answer needs the BITMAPV2+/BI_BITFIELDS masks (ARGB1555/
    * 4444 carry alpha), which sit past the fixed header this sniffer
    * reads (r19 ADVICE; same declared-approximation class as the
    * unrecognized-container stub). 16 bpp is only legal for
    * BITMAPINFOHEADER+ — the 12-byte core DIB allows {1,4,8,24}
    * (Windows BMP spec), so a core header claiming 16 is rejected as
    * malformed. */
  private def bmp(b: Array[Byte]): Option[Header] = {
    if (b.length < 26 || b(0) != 'B' || b(1) != 'M') return None
    val dib = le32(b, 14)
    val (w, h, bpp) =
      if (dib == 12) (le16(b, 18), le16(b, 20), le16(b, 24))
      else if (dib >= 40) {
        if (b.length < 30) return None
        (le32(b, 18), math.abs(le32(b, 22)), le16(b, 28))
      } else return None
    if (dib == 12 && !Set(1, 4, 8, 24).contains(bpp)) return None
    val channels = bpp match {
      case 1 | 4 | 8 => 1
      case 16 | 24   => 3
      case 32        => 4
      case _         => return None
    }
    if (w <= 0 || h <= 0) return None
    Some(Header("image/bmp", w, h, channels))
  }

  /** WebP: RIFF container ("RIFF" + size + "WEBP"), then the first
    * chunk discriminates the flavor (RIFF/WebP container spec):
    * VP8X — extended: canvas (width−1, height−1) as 24-bit LE at
    * payload offsets 4/7, alpha from flag bit 4;
    * VP8␣ — lossy: 3-byte frame tag, 0x9D012A start code, 14-bit
    * dims (VP8 spec §9.1), no alpha;
    * VP8L — lossless: 0x2F signature then a 4-byte LE bitfield —
    * width−1 = bits 0–13, height−1 = bits 14–27, alpha = bit 28. */
  private def webp(b: Array[Byte]): Option[Header] = {
    if (b.length < 30) return None
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'E' && b(10) == 'B' && b(11) == 'P')) return None
    val tag = new String(b.slice(12, 16), "ISO-8859-1")
    tag match {
      case "VP8X" =>
        val alpha = (u8(b, 20) & 0x10) != 0
        Some(Header("image/webp", le24(b, 24) + 1, le24(b, 27) + 1,
          if (alpha) 4 else 3))
      case "VP8 " =>
        // frame tag at 20..22, start code 9D 01 2A at 23..25
        if (u8(b, 23) != 0x9d || u8(b, 24) != 0x01 || u8(b, 25) != 0x2a) None
        else Some(Header("image/webp",
          le16(b, 26) & 0x3fff, le16(b, 28) & 0x3fff, 3))
      case "VP8L" =>
        if (u8(b, 20) != 0x2f) None
        else {
          val bits = le32(b, 21).toLong & 0xffffffffL
          val alpha = ((bits >> 28) & 1L) != 0
          Some(Header("image/webp", ((bits & 0x3fff) + 1).toInt,
            (((bits >> 14) & 0x3fff) + 1).toInt, if (alpha) 4 else 3))
        }
      case _ => None
    }
  }

  /** Parse a payload's container header, if it is one we understand. */
  def parse(bytes: Array[Byte]): Option[Header] =
    png(bytes).orElse(jpeg(bytes)).orElse(gif(bytes)).orElse(bmp(bytes))
      .orElse(webp(bytes))
}
