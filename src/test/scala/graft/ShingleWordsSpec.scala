package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.ShingleWords

/** The native shingle kernel must match the split/transform/concat_ws
  * fold it replaced (whose semantics the DuckDB oracle mirrors) on
  * every input shape — including empty strings, leading/trailing and
  * doubled spaces, 1- and 2-word texts, and multi-byte UTF-8. */
class ShingleWordsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def foldShingles(textCol: org.apache.spark.sql.Column) = {
    val ws = split(textCol, " ")
    transform(
      sequence(lit(1), greatest(size(ws) - 2, lit(1))),
      i => concat_ws(" ", element_at(ws, i),
        try_element_at(ws, i + 1), try_element_at(ws, i + 2)))
  }

  test("kernel equals the fold on edge shapes") {
    import spark.implicits._
    val texts = Seq("", " ", "  ", "one", "one two", "one two three",
      "a b c d e", " lead", "trail ", "dou  ble", "ünï códe wörds hère",
      "a", "a ", " a", "x y z w")
    val rows = texts.toDF("t")
      .select(col("t"), ShingleWords.shingles(col("t")).as("a"),
        foldShingles(col("t")).as("b")).collect()
    for (r <- rows)
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"mismatch for '${r.getString(0)}'")
  }

  test("kernel equals the fold on random word soup") {
    val df = spark.range(300)
      .select(concat_ws(" ", (0 until 25).map(i =>
        substring(md5(concat(col("id"), lit(i))), 1, 6)): _*).as("t"))
      .select(ShingleWords.shingles(col("t")).as("a"), foldShingles(col("t")).as("b"))
    assert(df.filter(not(col("a") === col("b"))).count() == 0)
  }
}
