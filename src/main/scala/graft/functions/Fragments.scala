package graft.functions

import java.util.regex.Pattern
import scala.collection.mutable.ArrayBuffer

/** One typed span detected inside a document. Mirrors the reference's
  * `DetectedBlock` (`/root/reference/etl_parser.py:451-458`): byte offsets
  * into the original text, a confidence in [0,1], and a small string map
  * of detector-specific metadata.
  */
final case class Fragment(
    format_type: String,
    start_index: Int,
    end_index: Int,
    confidence: Double,
    text: String,
    meta: Map[String, String])

/** Scala port of the reference's fragment-detector cascade
  * (`/root/reference/etl_parser.py:484-924`): eleven detectors run in a
  * fixed priority order over one document; high-priority detections
  * reserve their spans ("occupancy") so lower-priority detectors skip
  * them; a final containment pass drops lower-priority fragments fully
  * inside higher-priority ones (keeping higher-priority children).
  *
  * The algorithm is inherently sequential *within* a document (stateful
  * span accounting) but embarrassingly parallel *across* documents, so
  * in the engine it runs as one deterministic Scala function per row —
  * `explode(detect_fragments(text))` — and everything downstream
  * (dedup anti-joins, summary counts, normalizers) is declarative
  * DataFrame code that Catalyst optimizes. At 100 TB the detector cost
  * is embarrassingly-parallel CPU over the documents scan: no shuffle,
  * no driver involvement, linear in input bytes with the same scan caps
  * the reference uses (200 kB brace scan, 2 kB malformed tail, 200 CSV
  * lines, 400-char SQL).
  *
  * All constants (priority order, confidences, caps) are lifted
  * verbatim from the cited reference lines. Regexes are Java
  * translations of the reference's Python patterns; the ones that use
  * `\w` are compiled with UNICODE_CHARACTER_CLASS so they match
  * Python's unicode `\w` (pinned by unicode fuzz documents in the
  * differential fixture — BMP word chars; astral plane would also need
  * Python-len vs UTF-16-length alignment, which the corpus avoids).
  */
object Fragments {

  /** Total priority order, lower index = higher priority
    * (`etl_parser.py:461-474`). */
  val FormatPriority: Vector[String] = Vector(
    "JSON_LD", "JSON", "MALFORMED_JSON", "HTML_TABLE", "HTML",
    "YAML_FRONTMATTER", "CSV", "CSV_NO_HEADER", "KEY_VALUE",
    "JS_OBJECT", "SQL", "RAW_TEXT")

  private def priorityOf(t: String): Int = {
    val i = FormatPriority.indexOf(t)
    if (i < 0) FormatPriority.length else i
  }

  /** Formats whose detections reserve their span (`etl_parser.py:552`). */
  private val ReserveTypes = Set(
    "JSON_LD", "JSON", "MALFORMED_JSON", "HTML_TABLE", "HTML",
    "YAML_FRONTMATTER")

  private def clampConf(c: Double): Double = math.max(0.0, math.min(1.0, c))

  // ---- strict JSON validity (stand-in for the reference's json.loads) ----

  /** Minimal strict JSON validator with the same acceptance surface the
    * reference relies on (`json.loads` at `etl_parser.py:565/614/653`):
    * double-quoted strings only, no trailing commas, no unquoted keys,
    * no comments. Validity only — parsing to values is done by Spark's
    * `from_json`/`get_json_object` built-ins in the normalizer ops.
    */
  def isStrictJson(s: String): Boolean = {
    val t = s
    var i = 0
    val n = t.length
    def skipWs(): Unit = { while (i < n && (t(i) == ' ' || t(i) == '\t' || t(i) == '\n' || t(i) == '\r')) i += 1 }
    def fail(): Boolean = false
    def parseValue(): Boolean = {
      skipWs()
      if (i >= n) return fail()
      t(i) match {
        case '{' => parseObject()
        case '[' => parseArray()
        case '"' => parseString()
        case 't' => parseLit("true")
        case 'f' => parseLit("false")
        case 'n' => parseLit("null")
        // json.loads also accepts these non-standard literals by default
        // (etl_parser.py:565/614/653 use plain json.loads)
        case 'N' => parseLit("NaN")
        case 'I' => parseLit("Infinity")
        case '-' if t.startsWith("-Infinity", i) => parseLit("-Infinity")
        case c if c == '-' || (c >= '0' && c <= '9') => parseNumber()
        case _ => fail()
      }
    }
    def parseLit(lit: String): Boolean =
      if (t.startsWith(lit, i)) { i += lit.length; true } else fail()
    def parseString(): Boolean = {
      if (i >= n || t(i) != '"') return fail()
      i += 1
      while (i < n) {
        val c = t(i)
        if (c == '\\') {
          if (i + 1 >= n) return fail()
          val e = t(i + 1)
          if (e == 'u') {
            if (i + 5 >= n) return fail()
            var k = i + 2
            while (k < i + 6) {
              val h = t(k)
              val hex = (h >= '0' && h <= '9') || (h >= 'a' && h <= 'f') || (h >= 'A' && h <= 'F')
              if (!hex) return fail()
              k += 1
            }
            i += 6
          } else if ("\"\\/bfnrt".indexOf(e) >= 0) i += 2
          else return fail()
        } else if (c == '"') { i += 1; return true }
        else if (c < ' ') return fail() // unescaped control char
        else i += 1
      }
      fail()
    }
    def parseNumber(): Boolean = {
      val start = i
      if (i < n && t(i) == '-') i += 1
      if (i >= n || t(i) < '0' || t(i) > '9') return fail()
      if (t(i) == '0') i += 1
      else while (i < n && t(i) >= '0' && t(i) <= '9') i += 1
      if (i < n && t(i) == '.') {
        i += 1
        if (i >= n || t(i) < '0' || t(i) > '9') return fail()
        while (i < n && t(i) >= '0' && t(i) <= '9') i += 1
      }
      if (i < n && (t(i) == 'e' || t(i) == 'E')) {
        i += 1
        if (i < n && (t(i) == '+' || t(i) == '-')) i += 1
        if (i >= n || t(i) < '0' || t(i) > '9') return fail()
        while (i < n && t(i) >= '0' && t(i) <= '9') i += 1
      }
      i > start
    }
    def parseObject(): Boolean = {
      i += 1 // '{'
      skipWs()
      if (i < n && t(i) == '}') { i += 1; return true }
      while (true) {
        skipWs()
        if (!parseString()) return fail()
        skipWs()
        if (i >= n || t(i) != ':') return fail()
        i += 1
        if (!parseValue()) return fail()
        skipWs()
        if (i < n && t(i) == ',') { i += 1 }
        else if (i < n && t(i) == '}') { i += 1; return true }
        else return fail()
      }
      true
    }
    def parseArray(): Boolean = {
      i += 1 // '['
      skipWs()
      if (i < n && t(i) == ']') { i += 1; return true }
      while (true) {
        if (!parseValue()) return fail()
        skipWs()
        if (i < n && t(i) == ',') { i += 1 }
        else if (i < n && t(i) == ']') { i += 1; return true }
        else return fail()
      }
      true
    }
    val ok = parseValue()
    skipWs()
    ok && i == n
  }

  // ---- string-aware brace matcher (`etl_parser.py:484-525`) --------------

  /** From the first `{` at or after `startPos`, scan forward counting
    * brace depth while tracking single/double-quoted strings and
    * escapes; return Some(start, endExclusive) of the matching `}` or
    * None within `maxLen`. */
  def findJsonSpan(text: String, startPos: Int, maxLen: Int = 200000): Option[(Int, Int)] = {
    val n = text.length
    var i = startPos
    while (i < n && text(i) != '{') i += 1
    if (i >= n) return None
    val start = i
    var depth = 0
    var inString = false
    var escape = false
    var stringChar = ' '
    var j = i
    val limit = math.min(n, i + maxLen)
    while (j < limit) {
      val ch = text(j)
      if (inString) {
        if (escape) escape = false
        else if (ch == '\\') escape = true
        else if (ch == stringChar) inString = false
      } else {
        if (ch == '"' || ch == '\'') { inString = true; stringChar = ch }
        else if (ch == '{') depth += 1
        else if (ch == '}') {
          depth -= 1
          if (depth == 0) return Some((start, j + 1))
        }
      }
      j += 1
    }
    None
  }

  // ---- compiled patterns --------------------------------------------------

  private val JsonLdRe = Pattern.compile(
    """<script\b[^>]*type=["']application/ld\+json["'][^>]*>([\s\S]*?)</script>""",
    Pattern.CASE_INSENSITIVE)
  private val YamlRe = Pattern.compile(
    """(^|\n)---\s*\n([\s\S]{0,2000}?)\n---""", Pattern.MULTILINE)
  private val SectionHeaderRe = Pattern.compile(
    """(^|\n)---\s*([A-Z0-9 _\-()]+)\s*\n""", Pattern.CASE_INSENSITIVE)
  // UNICODE_CHARACTER_CLASS wherever the reference's pattern uses \w:
  // Python's \w is unicode-aware ('clé' is a KV key there), Java's
  // default \w is ASCII-only — without the flag the port would miss
  // non-ASCII keys the reference detects (pinned by the unicode fuzz
  // documents in fuzz_gen.py).
  private val UFlags = Pattern.UNICODE_CHARACTER_CLASS
  private val SectionNextDivRe = Pattern.compile(
    """\n---\s*[\w \-()/:]*\n""", Pattern.CASE_INSENSITIVE | UFlags)
  private val QuotedKvRe = Pattern.compile("\"\\w+\"\\s*:", UFlags)
  private val BareKvRe = Pattern.compile("\\w+\\s*:", UFlags)
  private val BlankLineRe = Pattern.compile("\\n\\s*\\n")
  private val UnclosedQuotedRe = Pattern.compile("[\"']\\w+[\"']\\s*:", UFlags)
  private val UnclosedBareRe = Pattern.compile("\\w+\\s*:\\s*", UFlags)
  private val TableOpenRe = Pattern.compile("<table\\b", Pattern.CASE_INSENSITIVE)
  private val TableCloseRe = Pattern.compile("</table\\s*>", Pattern.CASE_INSENSITIVE)
  private val TrRe = Pattern.compile("<tr\\b", Pattern.CASE_INSENSITIVE)
  private val CellRe = Pattern.compile("<t[dh]\\b", Pattern.CASE_INSENSITIVE)
  private val HtmlBlockOpenRe = Pattern.compile(
    "<(div|section|article|header|footer|main|nav|body)\\b", Pattern.CASE_INSENSITIVE)
  private val AnyTagRe = Pattern.compile("<[A-Za-z]+")
  private val CloseTagRe = Pattern.compile("</")
  private val KvFirstLineRe = Pattern.compile(
    "^\\s*[#\\-]*\\s*[\\w\\-\\s]{1,80}\\s*[:=]\\s*.+", UFlags)
  private val KvLineRe = Pattern.compile("^\\s*[\\w\\-\\s]{1,80}\\s*[:=]\\s*.+", UFlags)
  private val JsVarRe = Pattern.compile("\\b(var|let|const)\\s+([A-Za-z0-9_$]+)\\s*=\\s*\\{")
  private val SqlRe = Pattern.compile(
    "(--[^\\n]*\\n\\s*)?(SELECT|INSERT|UPDATE|DELETE|CREATE|DROP)\\b[\\s\\S]{0,400}?;",
    Pattern.CASE_INSENSITIVE)
  private val LetterRe = Pattern.compile("[A-Za-z]")

  private def countMatches(p: Pattern, s: String): Int = {
    val m = p.matcher(s); var c = 0
    while (m.find()) c += 1
    c
  }

  // ---- the detector -------------------------------------------------------

  /** Full cascade over one document; returns fragments sorted by
    * `start_index` after containment dedup (`etl_parser.py:866-924`). */
  def detect(text: String): Seq[Fragment] = {
    if (text == null) return Seq.empty
    val d = new Detector(text)
    d.runAll()
  }

  /** The cascade minus the final dedup pass — exposed so the
    * `op_fragment_priority_dedup` query can report dropped-vs-kept. */
  def detectRaw(text: String): Seq[Fragment] = {
    if (text == null) return Seq.empty
    val d = new Detector(text)
    d.runRaw()
  }

  /** Containment dedup (`etl_parser.py:884-924`): scan fragments in
    * (start, -length) order; a fragment fully contained in an
    * already-kept fragment of equal-or-higher priority is dropped.
    * A contained fragment that OUTRANKS every container survives
    * because the containment test itself requires the container to be
    * equal-or-higher priority — `containedBy` stays null for it. (The
    * reference's `else` arm re-checks the same inequality,
    * `etl_parser.py:907-917`; it is unreachable there for the same
    * reason — `p_k <= p_b` held when `contained_by` was set — and is
    * not ported.) */
  def dedupePrioritize(blocks: Seq[Fragment]): Seq[Fragment] = {
    val kept = ArrayBuffer.empty[Fragment]
    for (b <- blocks.sortBy(x => (x.start_index, -(x.end_index - x.start_index)))) {
      var containedBy: Fragment = null
      val it = kept.iterator
      while (containedBy == null && it.hasNext) {
        val k = it.next()
        if (b.start_index >= k.start_index && b.end_index <= k.end_index &&
            priorityOf(k.format_type) <= priorityOf(b.format_type))
          containedBy = k
      }
      if (containedBy == null) kept += b
    }
    kept.sortBy(_.start_index).map(f => f.copy(confidence = clampConf(f.confidence))).toSeq
  }

  private final class Detector(text: String) {
    private val n = text.length
    private val blocks = ArrayBuffer.empty[Fragment]
    private val occupied = ArrayBuffer.empty[(Int, Int)]

    private def markOccupied(start: Int, end: Int): Unit = occupied += ((start, end))

    private def isOccupied(start: Int, end: Int): Boolean =
      occupied.exists { case (a, b) => !(end <= a || start >= b) }

    private def addBlock(f: Fragment): Unit = {
      blocks += f
      if (ReserveTypes.contains(f.format_type)) markOccupied(f.start_index, f.end_index)
    }

    // 1. JSON-LD script bodies (`etl_parser.py:556-572`)
    private def detectJsonLd(): Unit = {
      val m = JsonLdRe.matcher(text)
      while (m.find()) {
        val start = m.start(1); val end = m.end(1)
        val conf = if (isStrictJson(m.group(1).trim)) 0.99 else 0.6
        addBlock(Fragment("JSON_LD", start, end, clampConf(conf),
          text.substring(start, end), Map("parsed" -> (conf > 0.9).toString)))
      }
    }

    // 2. YAML frontmatter (`etl_parser.py:575-588`)
    private def detectYamlFrontmatter(): Unit = {
      val m = YamlRe.matcher(text)
      while (m.find()) {
        val start = m.start(2); val end = m.end(2)
        val lines = m.group(2).split("\n", -1).filter(_.trim.nonEmpty)
        val colonRatio = lines.count(_.contains(":")).toDouble / math.max(1, lines.length)
        val conf = if (colonRatio > 0.5) 0.95 else 0.6
        if (!isOccupied(start, end))
          addBlock(Fragment("YAML_FRONTMATTER", start, end, clampConf(conf),
            text.substring(start, end), Map("colon_ratio" -> colonRatio.toString)))
      }
    }

    // 3. `--- <HEADER with JSON>` sections (`etl_parser.py:591-626`)
    private def detectSectionedJsons(): Unit = {
      val m = SectionHeaderRe.matcher(text)
      while (m.find()) {
        val header = m.group(2).trim.toUpperCase
        val bodyStart = m.end()
        val nextDiv = SectionNextDivRe.matcher(text)
        val bodyEnd = if (nextDiv.find(bodyStart)) bodyStart + (nextDiv.start - bodyStart) else n
        val body = text.substring(bodyStart, math.min(bodyEnd, n)).trim
        if (body.nonEmpty && header.contains("JSON") && !isOccupied(bodyStart, bodyEnd)) {
          findJsonSpan(text, bodyStart) match {
            case Some((s, e)) =>
              val strict = isStrictJson(text.substring(s, e))
              val (ftype, conf) = if (strict) ("JSON", 0.99) else ("MALFORMED_JSON", 0.45)
              addBlock(Fragment(ftype, s, e, clampConf(conf), text.substring(s, e),
                Map("section_header" -> header)))
            case None =>
              if (!isOccupied(bodyStart, bodyEnd))
                addBlock(Fragment("MALFORMED_JSON", bodyStart, bodyEnd, 0.4,
                  text.substring(bodyStart, bodyEnd), Map("section_header" -> header)))
          }
        }
      }
    }

    // 4. global strict/malformed JSON scan (`etl_parser.py:629-678`)
    private def detectJsonsGlobal(): Unit = {
      var i = 0
      var continueScan = true
      while (continueScan) {
        val pos = text.indexOf('{', i)
        if (pos < 0) continueScan = false
        else if (isOccupied(pos, pos + 1)) i = pos + 1
        else findJsonSpan(text, pos, 200000) match {
          case Some((s, e)) =>
            if (isOccupied(s, e)) i = e
            else {
              val snippet = text.substring(s, e)
              if (isStrictJson(snippet))
                addBlock(Fragment("JSON", s, e, 0.98, snippet, Map.empty))
              else {
                val kvLike = countMatches(QuotedKvRe, snippet) + countMatches(BareKvRe, snippet)
                val conf = if (kvLike >= 2) 0.5 else 0.25
                addBlock(Fragment("MALFORMED_JSON", s, e, clampConf(conf), snippet,
                  Map("kv_like" -> kvLike.toString)))
              }
              i = e
            }
          case None =>
            val tailEnd = math.min(n, pos + 2000)
            val remainder = text.substring(pos, tailEnd)
            val dn = BlankLineRe.matcher(remainder)
            val end = if (dn.find()) pos + dn.start else tailEnd
            if (!isOccupied(pos, end)) {
              val snippet = text.substring(pos, end)
              if (UnclosedQuotedRe.matcher(snippet).find() || UnclosedBareRe.matcher(snippet).find())
                addBlock(Fragment("MALFORMED_JSON", pos, end, 0.35, snippet,
                  Map("note" -> "unclosed")))
            }
            i = end
        }
        if (i >= n) continueScan = false
      }
    }

    // 5. HTML tables + generic HTML blocks (`etl_parser.py:683-726`)
    private def detectHtml(): Unit = {
      val tm = TableOpenRe.matcher(text)
      while (tm.find()) {
        val start = tm.start
        if (!isOccupied(start, start + 1)) {
          val closeM = TableCloseRe.matcher(text)
          if (closeM.find(start)) {
            val end = closeM.end
            val snippet = text.substring(start, end)
            // row/col counting via regex (the reference uses BeautifulSoup
            // here, `etl_parser.py:695-698`; only conf/meta depend on it)
            val rows = countMatches(TrRe, snippet)
            val cols = snippet.split("(?i)<tr").drop(1)
              .map(chunk => countMatches(CellRe, chunk)).foldLeft(0)(math.max)
            val conf = if (rows > 0 && cols >= 1) 0.95 else 0.6
            if (!isOccupied(start, end))
              addBlock(Fragment("HTML_TABLE", start, end, clampConf(conf), snippet,
                Map("rows" -> rows.toString, "cols" -> cols.toString)))
          }
        }
      }
      val bm = HtmlBlockOpenRe.matcher(text)
      while (bm.find()) {
        val start = bm.start
        if (!isOccupied(start, start + 1)) {
          val tag = bm.group(1)
          val closeRe = Pattern.compile("</" + Pattern.quote(tag) + "\\s*>", Pattern.CASE_INSENSITIVE)
          val closeM = closeRe.matcher(text)
          if (closeM.find(start)) {
            val end = closeM.end
            if (end - start > 20 && !isOccupied(start, end)) {
              val snippet = text.substring(start, end)
              val tagCount = countMatches(AnyTagRe, snippet)
              val closeCount = countMatches(CloseTagRe, snippet)
              val conf = 0.5 + math.min(0.4, math.min(tagCount, closeCount) * 0.03)
              addBlock(Fragment("HTML", start, end, clampConf(conf), snippet,
                Map("tag_count" -> tagCount.toString)))
            }
          }
        }
      }
    }

    // 6. CSV runs with consistent delimiter counts (`etl_parser.py:729-776`)
    private def detectCsvBlocks(): Unit = {
      val lines = text.split("\n", -1)
      val ln = lines.length
      val charPos = new Array[Int](ln + 1)
      var acc = 0
      var k = 0
      while (k < ln) { charPos(k) = acc; acc += lines(k).length + 1; k += 1 }
      charPos(ln) = acc
      var i = 0
      while (i < ln) {
        if (lines(i).trim.isEmpty) i += 1
        else {
          val cand = Seq(',', '\t', ';').find(dch =>
            lines(i).indexOf(dch) >= 0 && !lines(i).contains('{') && !lines(i).contains('}'))
          cand match {
            case None => i += 1
            case Some(dch) =>
              def cnt(s: String): Int = s.count(_ == dch)
              val counts = ArrayBuffer(cnt(lines(i)))
              var j = i + 1
              val maxLines = 200
              while (j < ln && j - i < maxLines && lines(j).trim.nonEmpty && cnt(lines(j)) > 0) {
                counts += cnt(lines(j)); j += 1
              }
              var advanced = false
              if (counts.length >= 2) {
                // only the top frequency matters (`etl_parser.py:763-764`)
                val topFreq = counts.groupBy(identity).map(_._2.size).max
                if (topFreq >= math.max(1, counts.length / 2)) {
                  val start = charPos(i)
                  val end = if (j - 1 < ln) charPos(j - 1) + lines(j - 1).length else charPos(ln)
                  if (!isOccupied(start, end)) {
                    val hasHeader = LetterRe.matcher(lines(i).split(Pattern.quote(dch.toString), -1)(0)).find()
                    val (ftype, conf) = if (hasHeader) ("CSV", 0.9) else ("CSV_NO_HEADER", 0.7)
                    addBlock(Fragment(ftype, start, end, conf, text.substring(start, end),
                      Map("delimiter" -> dch.toString, "rows" -> counts.length.toString)))
                    i = j
                    advanced = true
                  }
                }
              }
              if (!advanced) i += 1
          }
        }
      }
    }

    // 7. runs of `key: value` / `key=value` lines (`etl_parser.py:779-800`)
    private def detectKeyValues(): Unit = {
      val lines = text.split("\n", -1)
      val ln = lines.length
      val charPos = new Array[Int](ln + 1)
      var acc = 0
      var k = 0
      while (k < ln) { charPos(k) = acc; acc += lines(k).length + 1; k += 1 }
      charPos(ln) = acc
      var i = 0
      while (i < ln) {
        var advanced = false
        if (KvFirstLineRe.matcher(lines(i)).lookingAt()) {
          var j = i
          var kvCount = 0
          while (j < ln && KvLineRe.matcher(lines(j)).lookingAt()) { kvCount += 1; j += 1 }
          if (kvCount >= 2) {
            val start = charPos(i)
            val end = charPos(j - 1) + lines(j - 1).length
            if (!isOccupied(start, end)) {
              addBlock(Fragment("KEY_VALUE", start, end, 0.9, text.substring(start, end),
                Map("pairs" -> kvCount.toString)))
              i = j
              advanced = true
            }
          }
        }
        if (!advanced) i += 1
      }
    }

    // 8. `var/let/const name = {...}` (`etl_parser.py:803-816`). Note:
    // in the reference this detector is effectively shadowed — the
    // global JSON scan (step 4) has already claimed every brace span as
    // JSON or MALFORMED_JSON and marked it occupied, so the occupancy
    // check here rejects the body. Ported faithfully, divergence
    // documented in the op_detect_js_object query.
    private def detectJsObjects(): Unit = {
      val m = JsVarRe.matcher(text)
      while (m.find()) {
        val start = m.start
        if (!isOccupied(start, start + 1)) {
          val bracePos = start + m.group(0).lastIndexOf('{')
          findJsonSpan(text, bracePos) match {
            case Some((s, e)) =>
              if (!isOccupied(s, e))
                addBlock(Fragment("JS_OBJECT", start, e, 0.88, text.substring(start, e),
                  Map("var_name" -> m.group(2))))
            case None =>
          }
        }
      }
    }

    // 9. SQL statements up to `;` (`etl_parser.py:819-827`)
    private def detectSql(): Unit = {
      val m = SqlRe.matcher(text)
      while (m.find()) {
        val start = m.start; val end = m.end
        if (!isOccupied(start, end))
          addBlock(Fragment("SQL", start, end, 0.9, text.substring(start, end), Map.empty))
      }
    }

    // 10. leftover paragraphs = complement of occupied spans
    // (`etl_parser.py:830-863`)
    private def detectRawText(): Unit = {
      var spans = List((0, n))
      for ((a, b) <- occupied.sortBy(identity).toList) {
        spans = spans.flatMap { case (s, e) =>
          if (b <= s || a >= e) List((s, e))
          else {
            val left = if (s < a) List((s, a)) else Nil
            val right = if (b < e) List((b, e)) else Nil
            left ++ right
          }
        }
      }
      for ((s, e) <- spans) {
        val seg = text.substring(s, e).trim
        if (seg.length >= 20) {
          val parts = BlankLineRe.split(seg, -1)
          var pos = s
          for (p0 <- parts) {
            val p = p0.trim
            if (p.isEmpty) pos += p.length + 2
            else {
              // Python str.find(p, pos, e): the whole match must lie in [pos, e)
              val found = text.indexOf(p, pos)
              if (found >= 0 && found + p.length <= e) {
                val start = found
                val end = start + p.length
                if (!isOccupied(start, end))
                  addBlock(Fragment("RAW_TEXT", start, end, 0.35,
                    text.substring(start, end), Map.empty))
                pos = end
              }
            }
          }
        }
      }
    }

    /** Detector order is semantic (`etl_parser.py:866-877`). */
    def runRaw(): Seq[Fragment] = {
      detectJsonLd()
      detectYamlFrontmatter()
      detectSectionedJsons()
      detectJsonsGlobal()
      detectHtml()
      detectJsObjects()
      detectCsvBlocks()
      detectKeyValues()
      detectSql()
      detectRawText()
      blocks.sortBy(_.start_index).toSeq
    }

    def runAll(): Seq[Fragment] = dedupePrioritize(runRaw())
  }
}
