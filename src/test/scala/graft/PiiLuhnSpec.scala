package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TrainingData

/** B97 `op_pii_luhn` — checksum-validated card detection. Pins:
  *
  *  1. Luhn kernel known answers: classic test numbers validate
  *     (4111111111111111 Visa, 5500005555555559 MC, Amex 15-digit),
  *     off-by-one check digits and random runs don't;
  *  2. graded corpus: every 17th doc has a card (has_card), every
  *     19th has a candidate that does NOT validate, others have
  *     neither; a doc divisible by both gets the valid plant only
  *     (CASE precedence, pinned);
  *  3. candidate boundaries: 12-digit runs are not candidates,
  *     13 and 19 are, 20-digit maximal runs are not (no substring
  *     match — the maximal-run rule);
  *  4. api.Graft.luhnScreen same-core agreement. */
class PiiLuhnSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def luhnOk(s: String): Boolean = {
    val digits = s.reverse.map(_ - '0')
    val sum = digits.zipWithIndex.map { case (d, i) =>
      if (i % 2 == 0) d else if (d > 4) 2 * d - 9 else 2 * d }.sum
    sum % 10 == 0
  }

  private def screen(texts: Seq[(Long, String)]): Map[Long, (Int, Int, Boolean)] = {
    import spark.implicits._
    api.Graft.luhnScreen(texts.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getBoolean(3))))
      .toMap
  }

  test("Luhn kernel known answers") {
    assert(luhnOk("4111111111111111") && luhnOk("5500005555555559") &&
      luhnOk("371449635398431"), "sanity of the reference impl")
    val out = screen(Seq(
      (1L, "pay 4111111111111111 now"),
      (2L, "pay 4111111111111112 now"),
      (3L, "mc 5500005555555559 amex 371449635398431"),
      (4L, "id 1234567890123456 x")))
    assert(out(1L) == ((1, 1, true)))
    assert(out(2L) == ((1, 0, false)))
    assert(out(3L) == ((2, 2, true)))
    assert(out(4L) == ((1, if (luhnOk("1234567890123456")) 1 else 0,
      luhnOk("1234567890123456"))))
  }

  test("candidate boundaries: 12 no, 13/19 yes, 20-digit run no") {
    val out = screen(Seq(
      (1L, "a 123456789012 b"),                    // 12 — not a candidate
      (2L, "a 1234567890123 b"),                   // 13 — candidate
      (3L, "a 1234567890123456789 b"),             // 19 — candidate
      (4L, "a 12345678901234567890 b")))           // 20 — maximal run, no substring
    assert(out(1L)._1 == 0 && out(2L)._1 == 1 && out(3L)._1 == 1)
    assert(out(4L)._1 == 0, "a 20-digit maximal run must not yield a 19-digit candidate")
  }

  test("NULL text screens as (0, 0, false), never a NULL verdict") {
    val out = screen(Seq((1L, null.asInstanceOf[String]), (2L, "ok")))
    assert(out(1L) == ((0, 0, false)))
  }

  test("graded corpus plants") {
    val out = TrainingData.piiLuhn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getBoolean(3)))
    assert(out.exists(_._1 % 17 == 0))
    out.foreach { case (id, nc, nv, has) =>
      if (id % 17 == 0) assert(nc >= 1 && nv >= 1 && has, s"doc $id must carry a card")
      else if (id % 19 == 0) assert(nc >= 1 && nv == 0 && !has,
        s"doc $id must carry a non-validating candidate")
      else assert(nc == 0 && !has, s"doc $id should be clean: ($nc, $nv)")
    }
  }
}
