package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.Mining

/** B93 `op_tfidf_topk` — per-doc keyword extraction. Pins:
  *
  *  1. plants: every 9th doc's unique `uq<id>` token (tf 4, df 1)
  *     ranks FIRST for its document;
  *  2. hand corpus vs independent recomputation (exact smoothed-idf
  *     arithmetic, ties broken by term);
  *  3. the scale plan: the per-doc top-k plans as WindowGroupLimit
  *     and the scalar N enters as a broadcast, never a shuffle;
  *  4. k terms per doc exactly (docs with ≥ k distinct terms). */
class TfidfTopkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  test("planted unique tokens rank first for their docs") {
    val out = Mining.tfidfTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3), r.getInt(4)))
    val planted = out.filter(_._1 % 9 == 0).groupBy(_._1)
    assert(planted.nonEmpty)
    planted.foreach { case (id, rows) =>
      val r1 = rows.find(_._2 == 1).get
      assert(r1._3 == s"uq$id" && r1._4 == 4 && r1._5 == 1,
        s"doc $id rank-1 should be its planted unique token: $r1")
    }
    // every doc emits exactly k rows (all corpus docs have >= 3 distinct terms)
    out.groupBy(_._1).foreach { case (id, rows) =>
      assert(rows.length == Mining.TfidfTopK, s"doc $id emitted ${rows.length}")
      assert(rows.map(_._2).sorted.sameElements(1 to Mining.TfidfTopK))
    }
  }

  test("hand corpus vs independent recomputation") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple apple banana common"),
      (2L, "banana cherry common"),
      (3L, "common cherry cherry cherry"))
    val got = Mining.tfidfTopkOf(docs.toDF("doc_id", "text"), 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getInt(3), r.getInt(4), r.getDouble(5))).sortBy(x => (x._1, x._2))
    val n = 3
    def idf(df: Int): Double = math.log((n + 1.0) / (df + 1.0)) + 1.0
    def s(tf: Int, df: Int): Double =
      BigDecimal(tf * idf(df)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 1: apple tf2 df1 -> top; banana tf1 df2; common tf1 df3 (idf 1)
    assert(got.filter(_._1 == 1L).map(x => (x._2, x._3, x._6)).toSeq ==
      Seq((1, "apple", s(2, 1)), (2, "banana", s(1, 2))))
    // doc 3: cherry tf3 df2 -> top; common tf1 df3
    assert(got.filter(_._1 == 3L).map(x => (x._2, x._3, x._6)).toSeq ==
      Seq((1, "cherry", s(3, 2)), (2, "common", s(1, 3))))
    // doc 2: banana tf1 df2 vs cherry tf1 df2 tie -> term order
    assert(got.filter(_._1 == 2L).map(x => (x._2, x._3)).toSeq ==
      Seq((1, "banana"), (2, "cherry")))
  }

  test("top-k plans as WindowGroupLimit; N enters broadcast") {
    val plan = Mining.tfidfTopk(spark, dir).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(2000))
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      "scalar N must broadcast")
  }
}
