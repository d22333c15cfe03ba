package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.CorpusStats

/** The r18 WinnowSelect kernel vs the pre-r18 nested-fold formulation
  * (the RepetitionStats differential-parity precedent): the codegen'd
  * one-pass kernel must be BIT-IDENTICAL to the interpreted
  * transform/array_min fold on the graded corpus and on hand cases
  * covering ties (the rightmost rule), minimum-length documents, and
  * repeated fingerprints (the in-row dedup). */
class WinnowSelectSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val k = CorpusStats.WinnowGram
  private val w = CorpusStats.WinnowWindow

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("doc_id", "pos", "fp").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq

  test("kernel == fold on the graded corpus (sf0.001)") {
    val c = sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val a = rows(CorpusStats.winnowWith(c, k, w))
    val b = rows(CorpusStats.winnowFoldWith(c, k, w))
    assert(a.nonEmpty && a == b)
  }

  test("kernel == fold on hand cases: ties, min length, dedup, empty domain") {
    import spark.implicits._
    val c = Seq(
      // all-same char: every gram hashes equal — ties everywhere, the
      // rightmost-position rule and the dedup both maximally stressed
      1L -> "a" * (k + 3 * w),
      // exactly the minimum winnowable length: one window, one pick
      2L -> "b" * (k + w - 1),
      // one char below the domain: must emit nothing from BOTH forms
      3L -> "c" * (k + w - 2),
      // periodic text: repeated fingerprints at different positions
      4L -> ("xy" * (k + 2 * w)),
      // ordinary mixed text
      5L -> "the quick brown fox jumps over the lazy dog again and again")
      .toDF("doc_id", "text")
    val a = rows(CorpusStats.winnowWith(c, k, w))
    val b = rows(CorpusStats.winnowFoldWith(c, k, w))
    assert(a == b)
    assert(!a.exists(_._1 == 3L), "below-domain doc must emit nothing")
    assert(a.count(_._1 == 2L) == 1, "minimum-length doc has exactly one window")
  }

  test("non-default geometry parity (api-sized k/w)") {
    import spark.implicits._
    val c = Seq(1L -> "abcdefghijabcdefghij the same prefix repeats here",
      2L -> "zzzzzzzzzzzzzzzzzzzzzzzz").toDF("doc_id", "text")
    for ((kk, ww) <- Seq((4, 3), (5, 9))) {
      assert(rows(CorpusStats.winnowWith(c, kk, ww)) ==
        rows(CorpusStats.winnowFoldWith(c, kk, ww)), s"k=$kk w=$ww")
    }
  }
}
