package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Fragments

/** Differential tests for the detector cascade port.
  *
  * The golden summaries were produced by EXECUTING the reference
  * (`python etl_parser.py input.txt` / `input2.txt`) and are recorded in
  * SURVEY.md §2 "Observed behavior". The fixture files are read from the
  * read-only reference checkout at test time (content is data, not code).
  */
class FragmentsSpec extends AnyFunSuite {

  private def summary(text: String): Map[String, Int] =
    Fragments.detect(text).groupBy(_.format_type).map { case (k, v) => k -> v.size }

  private def read(p: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")

  test("golden: input.txt fragment summary matches the executed reference") {
    val expected = Map(
      "KEY_VALUE" -> 5, "RAW_TEXT" -> 8, "JSON" -> 1, "MALFORMED_JSON" -> 2,
      "HTML_TABLE" -> 1, "CSV" -> 2, "JSON_LD" -> 1, "SQL" -> 2)
    assert(summary(read("/root/reference/input.txt")) === expected)
  }

  test("golden: input2.txt fragment summary matches the executed reference") {
    val expected = Map(
      "RAW_TEXT" -> 14, "JSON" -> 3, "HTML_TABLE" -> 1, "KEY_VALUE" -> 3,
      "CSV" -> 2, "YAML_FRONTMATTER" -> 1, "HTML" -> 1)
    assert(summary(read("/root/reference/input2.txt")) === expected)
  }

  test("golden: fragments are sorted by start_index and confidences clamped") {
    for (f <- Seq("/root/reference/input.txt", "/root/reference/input2.txt")) {
      val frags = Fragments.detect(read(f))
      assert(frags.map(_.start_index) === frags.map(_.start_index).sorted)
      assert(frags.forall(b => b.confidence >= 0.0 && b.confidence <= 1.0))
      assert(frags.forall(b => b.text == read(f).substring(b.start_index, b.end_index)))
    }
  }

  test("findJsonSpan: matches braces, ignores braces inside strings") {
    assert(Fragments.findJsonSpan("xx {\"a\": \"}\"} yy", 0) === Some((3, 13)))
    assert(Fragments.findJsonSpan("{'s': '{'}", 0) === Some((0, 10)))
    assert(Fragments.findJsonSpan("{\"a\": {\"b\": 1}}", 0) === Some((0, 15)))
    assert(Fragments.findJsonSpan("no braces here", 0) === None)
    assert(Fragments.findJsonSpan("{never closes", 0) === None)
    // escape handling: \" inside string does not close it
    assert(Fragments.findJsonSpan("""{"a": "x\"}"}""", 0) === Some((0, 13)))
  }

  test("isStrictJson: acceptance matches json.loads on the edge cases") {
    assert(Fragments.isStrictJson("""{"a": 1, "b": [1.5, true, null], "c": {"d": "e"}}"""))
    assert(Fragments.isStrictJson("[]"))
    assert(Fragments.isStrictJson("\"s\""))
    assert(Fragments.isStrictJson("-1.5e3"))
    assert(!Fragments.isStrictJson("""{"a": 1,}"""))     // trailing comma
    assert(!Fragments.isStrictJson("""{a: 1}"""))        // unquoted key
    assert(!Fragments.isStrictJson("""{'a': 1}"""))      // single quotes
    assert(!Fragments.isStrictJson("""{"a": 01}"""))     // leading zero
    assert(!Fragments.isStrictJson("""{"a": 1"""))       // unclosed
    assert(!Fragments.isStrictJson("""{"a": 1} x"""))    // trailing junk
    // json.loads accepts the non-standard IEEE literals by default
    assert(Fragments.isStrictJson("""{"a": NaN}"""))
    assert(Fragments.isStrictJson("[Infinity, -Infinity]"))
    assert(!Fragments.isStrictJson("""{"a": -NaN}"""))   // json.loads rejects
    assert(!Fragments.isStrictJson("""{"a": Inf}"""))
  }

  test("detector: strict vs malformed vs unclosed JSON classification") {
    val strict = Fragments.detect("""pad pad pad {"a": 1, "b": "x"} pad""")
    assert(strict.exists(f => f.format_type == "JSON" && f.confidence == 0.98))
    val malformed = Fragments.detect("pad pad pad {a: 1, b: 'x',} pad")
    assert(malformed.exists(f => f.format_type == "MALFORMED_JSON" && f.confidence == 0.5))
    val unclosed = Fragments.detect("pad pad pad {\"a\": 1, \"b\":\n\nmore text here")
    assert(unclosed.exists(f => f.format_type == "MALFORMED_JSON" &&
      f.meta.get("note").contains("unclosed")))
  }

  test("detector: containment dedup keeps higher-priority children") {
    // SQL inside a RAW_TEXT paragraph: both survive (RAW_TEXT is lower
    // priority than SQL, so the child outranks its container).
    val text = "Some prose mentioning that DROP TABLE users; is dangerous advice."
    val frags = Fragments.detect(text)
    assert(frags.exists(_.format_type == "SQL"))
    assert(frags.exists(_.format_type == "RAW_TEXT"))
    // but a RAW_TEXT paragraph that IS exactly a KEY_VALUE block is dropped
    val kv = "alpha: 1\nbeta: 2\ngamma: 3 with trailing words"
    val kvFrags = Fragments.detect(kv)
    assert(kvFrags.map(_.format_type) === Seq("KEY_VALUE"))
  }

  test("detector: CSV header vs no-header classification") {
    val header = Fragments.detect("name,qty,price\nwidget,2,9\ngadget,3,7")
    assert(header.exists(f => f.format_type == "CSV" && f.confidence == 0.9))
    val noHeader = Fragments.detect("10,20,30\n40,50,60\n70,80,90")
    assert(noHeader.exists(f => f.format_type == "CSV_NO_HEADER" && f.confidence == 0.7))
  }
}
