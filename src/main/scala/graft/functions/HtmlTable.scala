package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Port of the reference's streaming HTML table parser
  * (`/root/reference/script.py:21-76`, `HTMLTableParser`): a tiny tag
  * tokenizer that collects `<th>`/`<td>` cell text per `<tr>`, treats a
  * row of header cells as the header, and returns one `Map(header ->
  * cell)` per data row whose arity matches the header
  * (`script.py:66-76`). Rows with mismatched arity are dropped, exactly
  * like the reference. Like Python's `HTMLParser(convert_charrefs=True)`
  * the tokenizer decodes character references in cell text (numeric refs
  * plus the XML named set and nbsp; exotic HTML5 names pass through) and
  * ignores a `>` inside a quoted attribute value when finding tag ends.
  *
  * Used as a deterministic per-row Scala function (UDF): HTML parsing
  * has no Spark built-in, and per-document parsing is embarrassingly
  * parallel — no shuffle, no driver involvement.
  */
object HtmlTable {

  private val Named = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ")
  private val CharRefRe = "&(#x[0-9a-fA-F]+|#[0-9]+|[a-zA-Z][a-zA-Z0-9]*);".r

  /** Decode numeric and common named character references, like
    * `HTMLParser(convert_charrefs=True)` does for the refs our named
    * subset covers; unknown names are left verbatim. */
  private[functions] def decodeEntities(s: String): String =
    if (s.indexOf('&') < 0) s
    else CharRefRe.replaceAllIn(s, m => {
      val body = m.group(1)
      val out =
        if (body.startsWith("#x") || body.startsWith("#X"))
          try String.valueOf(Integer.parseInt(body.drop(2), 16).toChar)
          catch { case _: Exception => m.matched }
        else if (body.startsWith("#"))
          try String.valueOf(Integer.parseInt(body.drop(1)).toChar)
          catch { case _: Exception => m.matched }
        else Named.getOrElse(body, m.matched)
      java.util.regex.Matcher.quoteReplacement(out)
    })

  /** Index of the `>` ending the tag that opens at `lt`, skipping `>`
    * inside single- or double-quoted attribute values; -1 if unclosed. */
  private def tagEnd(html: String, lt: Int): Int = {
    var j = lt + 1
    var quote: Char = 0
    while (j < html.length) {
      val c = html.charAt(j)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return j
      j += 1
    }
    -1
  }

  def parse(html: String): Seq[Map[String, String]] = {
    if (html == null) return Seq.empty
    var headers: Vector[String] = Vector.empty
    val rows = ArrayBuffer.empty[Vector[String]]
    var currentRow = Vector.empty[String]
    var currentCell = new StringBuilder
    var inCell = false
    var isHeader = false

    var i = 0
    val n = html.length
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        val close = tagEnd(html, i)
        if (close < 0) { i = n }
        else {
          val inner = html.substring(i + 1, close).trim
          val isEnd = inner.startsWith("/")
          val name = (if (isEnd) inner.drop(1) else inner)
            .takeWhile(ch => ch.isLetterOrDigit).toLowerCase
          if (!isEnd) name match {
            case "tr" => currentRow = Vector.empty
            case "th" => inCell = true; isHeader = true
            case "td" => inCell = true; isHeader = false
            case _ =>
          }
          else name match {
            case "tr" =>
              if (isHeader) headers = currentRow else rows += currentRow
            case "th" | "td" =>
              inCell = false
              currentRow = currentRow :+ decodeEntities(currentCell.toString.trim)
              currentCell = new StringBuilder
            case _ =>
          }
          i = close + 1
        }
      } else {
        if (inCell) currentCell.append(c)
        i += 1
      }
    }
    if (headers.isEmpty) Seq.empty
    else rows.toSeq.collect {
      case r if r.length == headers.length => headers.zip(r).toMap
    }
  }
}
