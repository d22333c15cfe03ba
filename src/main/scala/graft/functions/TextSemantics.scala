package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's scalar text semantics, re-expressed as pure Catalyst
  * `Column` expressions (whole-stage-codegen friendly; no UDFs).
  *
  * Semantics sources (declared, not copied):
  *  - type coercion      `/root/reference/script.py:482-507`
  *  - key cleaning       `/root/reference/script.py:509-515`
  *  - OCR fixes          `/root/reference/script.py:469-480`
  *  - JSON repair        `/root/reference/etl_parser.py:972-989`,
  *                       `/root/reference/script.py:236-267`
  *  - entity extraction  `/root/reference/script.py:425-463`
  *  - format dispatch    `/root/reference/script.py:174-205`
  *
  * Regexes stay inside the RE2-compatible subset (no lookaround, no
  * backreferences in patterns) so the DuckDB oracle can state the same
  * expression.
  */
object TextSemantics {

  private val TrueWords  = Seq("true", "yes", "on")
  private val FalseWords = Seq("false", "no", "off")
  private val NullWords  = Seq("null", "none", "n/a", "na")

  /** Declared coercion semantics (SURVEY.md §1.2): word-list booleans and
    * nulls; numeric detection on the `,`→`.` normalized value — a `.`
    * means float, otherwise integer; anything else stays a string.
    * Returns struct(kind, as_bool, as_num): a closed sum type the
    * engine can keep columnar.
    */
  def coerceType(v: Column): Column = {
    val t = trim(v)
    val low = lower(t)
    val norm = regexp_replace(t, ",", ".")
    val asDouble = norm.try_cast("double")
    val asLong = t.try_cast("long")
    val kind =
      when(low.isin(TrueWords ++ FalseWords: _*), "boolean")
        .when(low.isin(NullWords: _*), "null")
        .when(norm.contains(".") && asDouble.isNotNull, "double")
        .when(asLong.isNotNull, "long")
        .otherwise("string")
    struct(
      kind.as("kind"),
      when(kind === "boolean", low.isin(TrueWords: _*)).as("as_bool"),
      when(kind === "double", asDouble)
        .when(kind === "long", asLong.cast("double")).as("as_num"))
  }

  /** Key normalization: drop non-word chars (keep spaces/hyphens),
    * collapse whitespace to `_`, lowercase. */
  def cleanKey(k: Column): Column =
    lower(regexp_replace(regexp_replace(k, "[^\\w\\s-]", ""), "\\s+", "_"))

  /** OCR error fixes: `l0cation`→`location` (ci), capital `O` before a
    * digit → `0`, spelled `one hundred and twenty` → `120` (ci). */
  def fixOcr(s: Column): Column = {
    val a = regexp_replace(s, "(?i)l0cation", "location")
    val b = regexp_replace(a, "O(\\d)", "0$1")
    regexp_replace(b, "(?i)one hundred and twenty", "120")
  }

  /** Conservative JSON repair chain: single→double quoted values,
    * quote unquoted keys, insert missing commas between adjacent string
    * fields, strip trailing commas. Idempotent on strict JSON that
    * avoids the repaired patterns. */
  def repairJson(s: Column): Column = {
    val quotedValues = regexp_replace(s, ":\\s*'([^']*)'", ": \"$1\"")
    val quotedKeys = regexp_replace(quotedValues,
      "([{,]\\s*)([A-Za-z_][A-Za-z0-9_]*)\\s*:", "$1\"$2\":")
    val commas = regexp_replace(quotedKeys, "\"\\s*\\n\\s*\"", "\",\n\"")
    regexp_replace(commas, ",\\s*([}\\]])", "$1")
  }

  /** Entity extraction from prose: first email / phone / URL / price. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\(?\\d{3}\\)?[-. ]?\\d{3}[-. ]?\\d{4}"
  val UrlRe   = "https?://[^ \\n]+"
  val PriceRe = "\\$\\d+[.,]\\d{2}"

  def entityEmail(s: Column): Column = regexp_extract(s, EmailRe, 0)
  def entityPhone(s: Column): Column = regexp_extract(s, PhoneRe, 0)
  def entityUrl(s: Column): Column   = regexp_extract(s, UrlRe, 0)
  def entityPrice(s: Column): Column = regexp_extract(s, PriceRe, 0)

  /** First-match-wins format dispatch over a section body. */
  def dispatchFormat(s: Column): Column = {
    val t = trim(s)
    val lines = split(t, "\n")
    val colonLines = size(filter(lines, l => l.contains(":")))
    when(t.contains("application/ld+json"), "json_ld")
      .when(t.startsWith("{") && t.contains("\""), "json")
      .when(lower(t).contains("<table"), "html_table")
      .when(size(lines) >= lit(2) &&
        size(split(element_at(lines, 1), ",")) > 1 &&
        size(split(element_at(lines, 1), ",")) === size(split(element_at(lines, 2), ",")),
        "csv")
      .when(colonLines * 2 > size(lines), "key_value")
      .when(t.startsWith("var ") || t.startsWith("let ") || t.startsWith("const "), "javascript")
      .otherwise("text")
  }
}
