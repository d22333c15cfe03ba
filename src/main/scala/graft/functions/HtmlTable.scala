package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Port of the reference's streaming HTML table parser
  * (`/root/reference/script.py:21-76`, `HTMLTableParser`): a tiny tag
  * tokenizer that collects `<th>`/`<td>` cell text per `<tr>`, treats a
  * row of header cells as the header, and returns one `Map(header ->
  * cell)` per data row whose arity matches the header
  * (`script.py:66-76`). Rows with mismatched arity are dropped, exactly
  * like the reference.
  *
  * Used as a deterministic per-row Scala function (UDF): HTML parsing
  * has no Spark built-in, and per-document parsing is embarrassingly
  * parallel — no shuffle, no driver involvement.
  */
object HtmlTable {

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
        val close = html.indexOf('>', i)
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
              currentRow = currentRow :+ currentCell.toString.trim
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
