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

  test("overflow guard measures BYTES: multi-byte doc under the char " +
      "bound but over the byte bound fails loudly") {
    import spark.implicits._
    // 600k 2-byte chars: 600_000 chars < 2^20 but 1_200_000 bytes >=
    // 2^20 — the pre-fix char guard let this through and the packed
    // position term went negative (silent fp/pos corruption)
    val c = Seq(1L -> ("é" * 600000)).toDF("doc_id", "text")
    val e = intercept[Exception] {
      CorpusStats.winnowWith(c, k, w).count()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("winnow: doc length")),
      s"expected the loud winnow guard, got: $e")
  }

  test("non-ASCII positions are byte offsets and stay in-range") {
    import spark.implicits._
    // 2-byte chars throughout: byte length is 2x char length; every
    // packed position must decode to a non-negative in-range offset
    val txt = "éü" * (k + 4 * w)
    val c = Seq(1L -> txt).toDF("doc_id", "text")
    val got = rows(CorpusStats.winnowWith(c, k, w))
    val nBytes = txt.getBytes("UTF-8").length
    assert(got.nonEmpty)
    assert(got.forall { case (_, pos, _) => pos >= 0 && pos <= nBytes - k },
      "byte positions must lie within the byte domain")
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
