package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.HtmlTable
import graft.operators.Sections

/** Unit tests for the normalizer pieces: the HTML table state machine
  * (`script.py:21-76` port) and the single-key flatten
  * (`script.py:517-533` port). */
class NormalizerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("HtmlTable: thead headers key the data rows") {
    val rows = HtmlTable.parse(
      """<table><thead><tr><th>Name</th><th>Qty</th></tr></thead>
        |<tr><td>widget</td><td>2</td></tr>
        |<tr><td>gadget</td><td>5</td></tr></table>""".stripMargin)
    assert(rows === Seq(
      Map("Name" -> "widget", "Qty" -> "2"),
      Map("Name" -> "gadget", "Qty" -> "5")))
  }

  test("HtmlTable: arity-mismatched rows dropped; headerless table yields nothing") {
    val rows = HtmlTable.parse(
      "<table><tr><th>A</th><th>B</th></tr><tr><td>1</td></tr><tr><td>2</td><td>3</td></tr></table>")
    assert(rows === Seq(Map("A" -> "2", "B" -> "3")))
    assert(HtmlTable.parse("<table><tr><td>1</td><td>2</td></tr></table>") === Seq.empty)
  }

  test("HtmlTable: whitespace and nested text trimmed per cell") {
    val rows = HtmlTable.parse(
      "<table><tr><th> K </th></tr><tr><td>\n  spaced value \n</td></tr></table>")
    assert(rows === Seq(Map("K" -> "spaced value")))
  }

  test("HtmlTable: character refs decoded, '>' inside attribute values ignored") {
    val rows = HtmlTable.parse(
      "<table><tr><th>A&amp;B</th></tr><tr><td title=\"a>b\">1 &lt; 2 &#33;&#x21;</td></tr></table>")
    assert(rows === Seq(Map("A&B" -> "1 < 2 !!")))
  }

  test("parseKv/extractKvPairs: quote RUNS stripped like Python str.strip") {
    assert(graft.functions.Normalizer.parseKv("k: \"\"x\"\"") === "{\"k\": \"x\"}")
    // the '' value branch wins for "''y''" in BOTH engines (empty), so the
    // run-strip case needs the bare-value branch:
    assert(graft.functions.Normalizer.extractKvPairs("k: ''y''") === "{\"k\": \"\"}")
    assert(graft.functions.Normalizer.extractKvPairs("k = y''") === "{\"k\": \"y\"}")
  }

  test("flattenSingleKeys: single-key structs hoist, multi-key structs recurse") {
    import spark.implicits._
    val df = Seq(("john", "en", 5L)).toDF("nm", "lg", "n")
    val nested = struct(
      struct(col("nm").as("name")).as("user"),
      struct(col("lg").as("a"),
        struct(col("n").as("deep")).as("inner")).as("meta"))
    val schema = StructType.fromDDL(
      "user struct<name: string>, meta struct<a: string, inner: struct<deep: bigint>>")
    val js = df.select(to_json(Sections.flattenSingleKeys(nested, schema)).as("j"))
      .as[String].head()
    // user -> user_name (hoisted); meta multi-key -> recursed: inner -> inner_deep
    assert(js === """{"user_name":"john","meta":{"a":"en","inner_deep":5}}""")
  }
}
