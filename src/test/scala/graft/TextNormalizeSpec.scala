package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.operators.TrainingData

/** B88 `op_text_normalize` — NFC canonicalization + whitespace
  * collapse. Pins:
  *
  *  1. UAX #15 known answers: decomposed sequences compose (e+◌́ → é,
  *     shrinking the char count), already-NFC text is a fixed point,
  *     and singletons/compatibility forms are NOT touched (NFC, not
  *     NFKC — ﬁ ligatures survive);
  *  2. whitespace: runs of spaces/tabs/newlines collapse to one space
  *     and outer whitespace trims;
  *  3. the dedup motivation: two spellings of the same visible text
  *     (composed vs decomposed) hash DIFFERENTLY raw and IDENTICALLY
  *     after normalization;
  *  4. the graded corpus: every planted (id % 11 = 5) row changes,
  *     every other row passes through unchanged. */
class TextNormalizeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def normOf(rows: (Long, String)*) = {
    import spark.implicits._
    TrainingData.textNormalizeOf(rows.toDF("doc_id", "text")).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getBoolean(3), r.getString(4)))).toMap
  }

  private def md5Of(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("UAX #15 known answers: composition, fixed point, NFC-not-NFKC") {
    val out = normOf(
      1L -> "résumé",   // decomposed: 8 cps -> 6 cps
      2L -> "résumé",               // composed: fixed point
      3L -> "ﬁle")             // fi ligature: NFC keeps it
    assert(out(1L) == ((8, 6, true, md5Of("résumé"))))
    assert(out(2L) == ((6, 6, false, md5Of("résumé"))))
    assert(out(3L) == ((3, 3, false, md5Of("ﬁle"))),
      "NFC must not decompose compatibility ligatures (that is NFKC)")
  }

  test("whitespace runs collapse, outer whitespace trims") {
    val out = normOf(10L -> "  a \t\t b\n\nc  ")
    val (nb, na, changed, md) = out(10L)
    assert((nb, na, changed) == ((13, 5, true)))
    assert(md == md5Of("a b c"))
  }

  test("composed and decomposed spellings converge to one hash") {
    val out = normOf(20L -> "café latte", 21L -> "café latte")
    assert(md5Of("café latte") != md5Of("café latte"),
      "raw spellings must differ or the test proves nothing")
    assert(out(20L)._4 == out(21L)._4,
      "normalized spellings must hash identically — the dedup motivation")
    assert(out(20L)._3 && !out(21L)._3)
  }

  test("api.Graft.normalizeText: keeps caller columns, adds norm + changed") {
    import spark.implicits._
    val df = Seq((1L, "café  crème", "fr")).toDF("doc_id", "text", "lang")
    val out = api.Graft.normalizeText(df).collect().head
    assert(out.getString(out.fieldIndex("norm")) == "café crème")
    assert(out.getBoolean(out.fieldIndex("changed")))
    assert(out.getString(out.fieldIndex("lang")) == "fr", "caller columns survive")
  }

  test("graded corpus: planted rows change, others pass through") {
    val rows = TrainingData.textNormalize(spark, "/root/testdata/sf0.001").collect()
    rows.foreach { r =>
      val planted = r.getLong(0) % 11 == 5
      assert(r.getBoolean(3) == planted,
        s"doc ${r.getLong(0)}: changed=${r.getBoolean(3)} but planted=$planted")
      if (planted)
        assert(r.getInt(2) < r.getInt(1),
          "planted rows must shrink (composition + whitespace collapse)")
    }
  }
}
