package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextSemantics

/** Unit + generated-property tests for the scalar semantics layer,
  * pinned to the reference edge cases (`script.py:482-533`,
  * SURVEY.md §5.2 #3/#4). */
class TextSemanticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def coerceKinds(vals: Seq[String]): Seq[(String, String)] = {
    val df = vals.toDF("v")
      .select(col("v"), TextSemantics.coerceType(col("v")).getField("kind").as("k"))
    df.collect().map(r => (r.getString(0), r.getString(1))).toSeq
  }

  test("coerceType: reference word lists, quotes, and the '.'-gate") {
    val got = coerceKinds(Seq(
      "true", "YES", "on", "False", "no", "OFF",      // booleans, any case
      "null", "None", "N/A", "na",                    // nulls
      "\"true\"", "'42'",                             // quote-stripped first
      "42", "  7  ", "+5", "-12",                     // ints
      "3.14", "-0.5", "1,5",                          // floats; euro-comma ONLY with a dot
      "9,99",                                         // no dot -> int fails -> string
      "1.2.3", "abc", "2 years", "2.3%", ""           // strings
    )).toMap
    assert(got("true") == "boolean" && got("YES") == "boolean" && got("OFF") == "boolean")
    assert(got("null") == "null" && got("N/A") == "null" && got("na") == "null")
    assert(got("\"true\"") == "boolean") // reference strips surrounding quotes first
    assert(got("'42'") == "long")
    assert(got("42") == "long" && got("  7  ") == "long" && got("+5") == "long")
    assert(got("3.14") == "double" && got("-0.5") == "double")
    assert(got("1,5") == "string",
      "no '.' in original -> float path not taken -> int('1,5') fails -> string")
    assert(got("9,99") == "string")
    assert(got("1.2.3") == "string" && got("2 years") == "string" && got("2.3%") == "string")
  }

  test("coerceType: totality over generated noise (never throws, closed kinds)") {
    val gen = Gen.listOfN(300, Gen.oneOf(
      Gen.alphaNumStr,
      Gen.asciiPrintableStr,
      Gen.oneOf("true", "no", "N/A", "1.5", "1,5", "'x'", "\"9.99\"", "-", ".", ","),
      Gen.chooseNum(Long.MinValue, Long.MaxValue).map(_.toString),
      Gen.chooseNum(-1e9, 1e9).map(_.toString)))
    val vals = gen.sample.get
    val kinds = coerceKinds(vals).map(_._2).toSet
    assert(kinds.subsetOf(Set("boolean", "null", "double", "long", "string")))
  }

  test("cleanKey: trims before collapsing whitespace") {
    val got = Seq(" First Name ", "Total (USD)", "a  b--c!", "UPPER", " x ")
      .toDF("k").select(TextSemantics.cleanKey(col("k"))).as[String].collect()
    assert(got === Array("first_name", "total_usd", "a_b--c", "upper", "x"))
  }

  test("cleanKey: unicode word chars survive like Python's \\w") {
    val got = Seq(" Clé (É) ", "Straße Nr!")
      .toDF("k").select(TextSemantics.cleanKey(col("k"))).as[String].collect()
    assert(got === Array("clé_é", "straße_nr"))
  }

  test("repairJson: fixes the reference's broken-JSON catalogue") {
    val broken = Seq(
      "{id: 1, status: 'open',}",                        // unquoted keys, single quotes, trailing comma
      "{'a': 1}",                                        // single-quoted KEY (ADVICE fix)
      "{\"a\": 1,\n \"b\": [2, 3,],}",                   // trailing commas in object + array
      "{\"a\": \"x\"\n\"b\": \"y\"}")                    // missing comma between properties
    val repaired = broken.toDF("b")
      .select(TextSemantics.repairJson(col("b")).as("r"),
        get_json_object(col("r"), "$.a").as("a"))
      .collect()
    assert(graft.functions.Fragments.isStrictJson(repaired(0).getString(0)))
    assert(graft.functions.Fragments.isStrictJson(repaired(1).getString(0)))
    assert(repaired(1).getString(1) == "1")
    assert(graft.functions.Fragments.isStrictJson(repaired(2).getString(0)))
    assert(graft.functions.Fragments.isStrictJson(repaired(3).getString(0)))
  }

  test("repairJson: identity on generated strict flat JSON") {
    val key = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString.take(8))
    val value = Gen.oneOf(
      Gen.nonEmptyListOf(Gen.alphaNumChar).map(s => "\"" + s.mkString.take(10) + "\""),
      Gen.chooseNum(-100000L, 100000L).map(_.toString))
    val objGen = Gen.nonEmptyListOf(Gen.zip(key, value)).map { kvs =>
      kvs.distinctBy(_._1).map { case (k, v) => s""""$k": $v""" }
        .mkString("{", ", ", "}")
    }
    val objs = Gen.listOfN(100, objGen).sample.get
    val out = objs.toDF("j")
      .select(col("j"), TextSemantics.repairJson(col("j")).as("r")).collect()
    out.foreach(r => assert(r.getString(0) == r.getString(1),
      s"repair not identity on strict: ${r.getString(0)}"))
  }

  test("fixOcr: reference substitutions") {
    val got = Seq("The l0cation is O5 and one hundred and twenty meters from L0CATION O77")
      .toDF("t").select(TextSemantics.fixOcr(col("t"))).as[String].head()
    assert(got == "The location is 05 and 120 meters from location 077")
  }

  test("fixOcr: DECLARED divergence from the reference on 'O<digit>'") {
    // The reference's rule is `\bO\b(?=\d)` with IGNORECASE
    // (script.py:469-480): a digit is a word char, so no boundary ever
    // follows the O and the rule is a no-op — the reference leaves 'O5'
    // unchanged. This port implements the clearly intended semantics
    // (capital O before a digit → 0) instead; that choice is pinned
    // here and documented in SURVEY §2 A23. Lowercase 'o5' stays
    // unchanged: the intended rule models OCR confusing the 0 glyph
    // with capital O, and the oracle SQL states the same case-sensitive
    // rule.
    val got = Seq("O5 o5 zero")
      .toDF("t").select(TextSemantics.fixOcr(col("t"))).as[String].head()
    assert(got == "05 o5 zero")
  }

  test("dispatchFormat: first-match-wins order on the reference's branches") {
    val cases = Seq(
      "<script type=\"application/ld+json\">{}</script>" -> "json_ld",
      "{\"a\": 1}" -> "json",
      "pre <TABLE><tr><td>x</td></tr></TABLE>" -> "html_table",
      "a,b,c\n1,2,3\n4,5,6" -> "csv",
      "a\tb\n1\t2" -> "csv",
      "k: 1\nmode = on\nprose" -> "key_value",
      "var x = {a: 1}" -> "javascript",
      "plain prose only" -> "text",
      "one,line" -> "text", // <2 lines: not CSV
      // separator counts run on UNTRIMMED lines (script.py:310-322
      // strips only for the blank filter): the leading tab makes line 2
      // count 2 tabs vs line 1's single tab -> inconsistent -> not CSV
      "a\tb\n\t1\t2" -> "text",
      // Python's \w is unicode-aware: accented keys count as kv lines
      "clé: 1\nnäme = x\nprose line" -> "key_value")
    val got = cases.map(_._1).toDF("t")
      .select(TextSemantics.dispatchFormat(col("t"))).as[String].collect()
    cases.zip(got).foreach { case ((in, want), actual) =>
      assert(actual == want, s"dispatch($in)")
    }
  }

  test("entity extraction: first match of each entity class") {
    val row = Seq("mail a.b+c@ex-ample.org, dial (555) 123-4567, see https://x.io/p?q=1 for $12.50")
      .toDF("t")
      .select(
        TextSemantics.entityEmail(col("t")),
        TextSemantics.entityPhone(col("t")),
        TextSemantics.entityUrl(col("t")),
        TextSemantics.entityPrice(col("t"))).head()
    assert(row.getString(0) == "a.b+c@ex-ample.org")
    assert(row.getString(1) == "(555) 123-4567")
    assert(row.getString(2).startsWith("https://x.io/p?q=1"))
    assert(row.getString(3) == "$12.50")
  }
}
