package graft

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{DataConverter, TextSemantics}

/** The two independent implementations of `convert_type`
  * (`script.py:482-507`) must agree: the columnar
  * `TextSemantics.coerceType` (struct sum type, used by
  * `op_coerce_type`) and the scalar `DataConverter.convertType`
  * (Jackson node, fuzz-verified against the executed reference).
  * Divergence here means one of them mis-ports the reference. */
class CoercionParitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val values = Seq(
    "true", "Yes", "ON", "False", "no", "OFF",
    "null", "None", "N/A", "na", "NA",
    "5", "+5", "-7", "05", "007", " 42 ",
    "1.5", "12.", ".5", "-0.25", "1.5e3", "2E2", "1,5", "1.2.3", "1,000.50",
    "1e5", "Infinity", "NaN", "1.5d", "1.5f", "0.1D",
    "'quoted'", "\"double\"", "\"\"x\"\"", "''", "\"'mixed'\"",
    "", "  ", "word", "two words", "a;b;c", "$4.99", "v1.2")

  private def kindOf(n: JsonNode): String =
    if (n.isBoolean) "boolean"
    else if (n.isNull) "null"
    else if (n.isDouble) "double"
    else if (n.isIntegralNumber) "long"
    else "string"

  test("columnar cleanKey agrees with the fuzz-verified scalar cleanKey") {
    import spark.implicits._
    val keys = Seq(" First Name ", "Total (USD)", "a  b--c!", "key_1",
      "UPPER lower", "tabs\tand spaces", "trailing! ", "-lead", "x")
    val rows = keys.toDF("k")
      .select(col("k"), TextSemantics.cleanKey(col("k")).as("c")).collect()
    for (r <- rows)
      assert(r.getString(1) == DataConverter.cleanKey(r.getString(0)),
        s"cleanKey mismatch for '${r.getString(0)}'")
  }

  test("columnar fixOcr agrees with the scalar port outside the documented divergence") {
    import spark.implicits._
    // the scalar port keeps the reference's never-matching \bO\b(?=\d)
    // rule verbatim; the columnar port implements the intended O<digit>
    // rule — parity holds on every input without that pattern
    val texts = Seq("visit l0cation now", "L0CATION x", "one hundred and twenty",
      "ONE HUNDRED AND TWENTY units", "plain text", "l0cation one hundred and twenty")
    val rows = texts.toDF("t")
      .select(col("t"), TextSemantics.fixOcr(col("t")).as("f")).collect()
    for (r <- rows)
      assert(r.getString(1) == DataConverter.fixOcrErrors(r.getString(0)),
        s"fixOcr mismatch for '${r.getString(0)}'")
  }

  test("columnar coerceType agrees with the fuzz-verified scalar convertType") {
    import spark.implicits._
    val rows = values.toDF("v")
      .select(col("v"), TextSemantics.coerceType(col("v")).as("c"))
      .select(col("v"), col("c.kind"), col("c.as_bool"), col("c.as_num"))
      .collect()
    for (r <- rows) {
      val v = r.getString(0)
      val want = DataConverter.convertType(v)
      assert(r.getString(1) == kindOf(want), s"kind mismatch for '$v' (scalar: $want)")
      if (want.isBoolean)
        assert(r.getBoolean(2) == want.asBoolean(), s"bool mismatch for '$v'")
      if (want.isDouble || want.isIntegralNumber)
        assert(r.getDouble(3) == want.asDouble(), s"num mismatch for '$v'")
    }
  }
}
