package graft.functions

/** Dependency-free media-container header parsing for the multimodal
  * decode op (B32). The environment has no image libraries, but PNG and
  * JPEG DIMENSIONS need none — they are fixed-offset (PNG IHDR) or
  * marker-scan (JPEG SOFn) byte reads. Payloads that are neither fall
  * back to the op's clearly-declared deterministic stub, so the decode
  * is REAL for real images and the DuckDB-checked arithmetic on the
  * synthetic text payloads is unchanged.
  */
object MediaHeaders {

  final case class Header(mime: String, width: Int, height: Int, channels: Int)

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be32(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)

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

  /** Parse a payload's container header, if it is one we understand. */
  def parse(bytes: Array[Byte]): Option[Header] =
    png(bytes).orElse(jpeg(bytes))
}
