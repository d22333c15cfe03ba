package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's scalar text semantics, re-expressed as pure Catalyst
  * `Column` expressions (whole-stage-codegen friendly; no UDFs).
  *
  * Semantics sources (declared, not copied):
  *  - type coercion      `/root/reference/script.py:482-507`
  *  - key cleaning       `/root/reference/script.py:509-515`
  *  - OCR fixes          `/root/reference/script.py:469-480`
  *  - JSON repair        `/root/reference/script.py:236-250` (impl B
  *                       `fix_json`; chosen over impl A's
  *                       `etl_parser.py:972-989` because it is
  *                       lookaround-free and covers single-quoted keys)
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

  /** Coercion semantics (`script.py:482-507`): strip whitespace then
    * surrounding quotes; word-list booleans and nulls; if the stripped
    * value contains `.` try float on the `,`→`.` normalized value;
    * otherwise try int on the value as-is (`"1,5"` therefore stays a
    * string — the float path is only reached when a `.` is present in
    * the ORIGINAL value); anything else stays a string.
    * Returns struct(kind, as_bool, as_num): a closed sum type the
    * engine can keep columnar.
    */
  def coerceType(v: Column): Column = {
    // Python strip('"\'') removes any run of quote chars at both ends
    val t = regexp_replace(regexp_replace(trim(v), "^[\"']+", ""), "[\"']+$", "")
    val low = lower(t)
    // Spark's string casts accept Java-isms Python rejects ("1.5d",
    // "Infinity") — gate both numeric paths with Python's grammar
    val norm = regexp_replace(t, ",", ".")
    val asDouble = when(
      norm.rlike("^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?$"),
      norm.try_cast("double"))
    val asLong = when(t.rlike("^[+-]?[0-9]+$"), t.try_cast("long"))
    val kind =
      when(low.isin(TrueWords ++ FalseWords: _*), "boolean")
        .when(low.isin(NullWords: _*), "null")
        .when(t.contains(".") && asDouble.isNotNull, "double")
        .when(!t.contains(".") && asLong.isNotNull, "long")
        .otherwise("string")
    struct(
      kind.as("kind"),
      when(kind === "boolean", low.isin(TrueWords: _*)).as("as_bool"),
      when(kind === "double", asDouble)
        .when(kind === "long", asLong.cast("double")).as("as_num"))
  }

  /** Key normalization (`script.py:509-515`): drop non-word chars (keep
    * spaces/hyphens), trim, collapse whitespace to `_`, lowercase —
    * trim comes before the `\s+` collapse so ` First Name ` becomes
    * `first_name`, not `_first_name_`. `(?U)` makes Java's `\w`/`\s`
    * unicode-aware like Python's (same rule as the Fragments /
    * DataConverter ports; ASCII oracle corpora are unaffected). */
  def cleanKey(k: Column): Column =
    lower(regexp_replace(trim(regexp_replace(k, "(?U)[^\\w\\s-]", "")), "(?U)\\s+", "_"))

  /** OCR error fixes (`script.py:469-480`): `l0cation`→`location` (ci),
    * capital `O` directly before a digit → `0`, spelled
    * `one hundred and twenty` → `120` (ci). The reference's second rule
    * is written `\bO\b(?=\d)` which can never match (a digit is a word
    * character, so no boundary follows the `O`); we implement the
    * clearly intended semantics instead. */
  def fixOcr(s: Column): Column = {
    val a = regexp_replace(s, "(?i)l0cation", "location")
    val b = regexp_replace(a, "O(\\d)", "0$1")
    regexp_replace(b, "(?i)one hundred and twenty", "120")
  }

  /** JSON repair chain, exactly impl B's `fix_json` order
    * (`script.py:236-250`): strip trailing commas, insert missing
    * commas between adjacent string properties, convert any
    * single-quoted span to double quotes (keys AND values), then quote
    * bare keys. */
  def repairJson(s: Column): Column = {
    val noTrailing = regexp_replace(s, ",(\\s*[}\\]])", "$1")
    val commas = regexp_replace(noTrailing, "\"\\s*\\n\\s*\"", "\",\n\"")
    val doubleQuoted = regexp_replace(commas, "'([^']*)'", "\"$1\"")
    regexp_replace(doubleQuoted, "(?U)(\\w+):", "\"$1\":")
  }

  /** Entity extraction from prose (`script.py:425-463`): first email /
    * phone / URL / price occurrence. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\(?\\d{3}\\)?[-. ]?\\d{3}[-. ]?\\d{4}"
  val UrlRe   = "https?://[^ \\n]+"
  val PriceRe = "\\$\\d+[.,]\\d{2}"

  def entityEmail(s: Column): Column = regexp_extract(s, EmailRe, 0)
  def entityPhone(s: Column): Column = regexp_extract(s, PhoneRe, 0)
  def entityUrl(s: Column): Column   = regexp_extract(s, UrlRe, 0)
  def entityPrice(s: Column): Column = regexp_extract(s, PriceRe, 0)

  /** First-match-wins format dispatch over a section body, mirroring
    * `parse_single_format` (`script.py:174-205`) with its helper
    * predicates `looks_like_csv` (`script.py:308-323`: ≥2 non-blank
    * lines, delimiter count of line 1 > 0 and consistent over the
    * first 3 lines for `,` or tab) and `looks_like_key_value`
    * (`script.py:350-363`: >50% of non-blank lines are `key: value` /
    * `key=value`). */
  def dispatchFormat(s: Column): Column = {
    val t = trim(s)
    // looks_like_csv filters blank lines but counts separators on the
    // UNTRIMMED lines (script.py:310-322 strips only for the filter);
    // looks_like_key_value matches on the STRIPPED lines (script.py:351)
    val rawLines = filter(split(t, "\n"), l => trim(l) =!= "")
    val lines = transform(rawLines, l => trim(l))
    def cnt(l: Column, d: String): Column =
      (length(l) - length(regexp_replace(l, java.util.regex.Pattern.quote(d), ""))).cast("int")
    val first = try_element_at(rawLines, lit(1))
    val sepCount = when(cnt(first, ",") > 0, cnt(first, ",")).otherwise(cnt(first, "\t"))
    val first3 = slice(rawLines, lit(1), least(lit(3), size(rawLines)))
    val looksCsv = size(rawLines) >= 2 && sepCount > 0 &&
      forall(first3, l => cnt(l, ",") === sepCount || cnt(l, "\t") === sepCount)
    val kvLines = size(filter(lines, l => l.rlike("(?U)^\\w+\\s*[:=]\\s*.+")))
    val looksKv = kvLines * 2 > size(lines)
    when(t.contains("<script") && t.contains("application/ld+json"), "json_ld")
      .when(t.contains("{") && t.contains("\""), "json")
      .when(lower(t).contains("<table"), "html_table")
      .when(looksCsv, "csv")
      .when(looksKv, "key_value")
      .when(t.contains("var ") && t.contains("{"), "javascript")
      .otherwise("text")
  }
}
