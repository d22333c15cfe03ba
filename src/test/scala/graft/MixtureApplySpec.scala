package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.DataFrame

import graft.operators.TrainingData

/** B84 `op_mixture_apply` — epoch composition under the α-temperature
  * mixture. Pins:
  *
  *  1. exact arithmetic on a hand corpus: the per-language repeat
  *     factors, floor bases, quantized fractional thresholds, and the
  *     rolling-hash coin all recompute independently in scala;
  *  2. token-budget neutrality on the graded corpus: the composed
  *     epoch's token mass stays within 5 % of the corpus (the point
  *     of r_l = T·w_l / tok_l);
  *  3. temperature direction: the rarest language's mean copy count
  *     exceeds the most-represented language's (sqrt flattening);
  *  4. determinism: reruns identical, and every count is floor(r) or
  *     floor(r)+1. */
class MixtureApplySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def corpusOf(rows: (Long, String, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "lang", "text")
  }

  /** The coin, independently restated: B31 polynomial hash of the
    * id's md5 HEX (32 mixed chars — a short raw id string keeps the
    * polynomial under the modulus and the residues non-uniform). */
  private def coinOf(id: Long): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (hex.foldLeft(0L)((a, c) => (a * 31 + c.toInt) % 1000000007L)
      % TrainingData.MixCoinMod).toInt
  }

  test("hand corpus: factors, bases, thresholds, coins all recompute") {
    // lang a: 4 docs x 4 tok = 16; lang b: 1 doc x 4 tok = 4
    // fold in sorted-lang order: S = 4.0 + 2.0 = 6.0, T = 20
    // r_a = 20·(4/6)/16 = 5/6; r_b = 20·(2/6)/4 = 5/3
    val out = TrainingData.mixtureApplyOf(corpusOf(
        (0L, "a", "w w w w"), (1L, "a", "w w w w"), (2L, "a", "w w w w"),
        (3L, "a", "w w w w"), (4L, "b", "x x x x")))
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))))
      .toMap
    val rA = 20.0 * math.sqrt(16.0) / 6.0 / 16.0
    val rB = 20.0 * math.sqrt(4.0) / 6.0 / 4.0
    val fqA = math.floor((rA - math.floor(rA)) * 10000).toInt // 8333
    val fqB = math.floor((rB - math.floor(rB)) * 10000).toInt // 6666
    assert(fqA == 8333 && fqB == 6666)
    out.foreach { case (id, (lang, nTok, base, coin, nCopies)) =>
      assert(nTok == 4)
      assert(coin == coinOf(id), s"doc $id coin")
      val (b, fq) = if (lang == "a") (0, fqA) else (1, fqB)
      assert(base == b, s"doc $id base")
      assert(nCopies == base + (if (coin < fq) 1 else 0), s"doc $id copies")
    }
  }

  test("graded corpus: epoch token budget conserved within 5%") {
    val rows = TrainingData.mixtureApply(spark, "/root/testdata/sf0.001").collect()
    val tot = rows.map(_.getInt(2).toLong).sum
    val epoch = rows.map(r => r.getInt(2).toLong * r.getInt(5)).sum
    assert(math.abs(epoch - tot) <= 0.05 * tot,
      s"epoch $epoch vs corpus $tot exceeds 5%")
  }

  test("temperature direction: rare languages repeat, dominant ones thin") {
    val rows = TrainingData.mixtureApply(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(1), r.getInt(2).toLong, r.getInt(5)))
    val byLang = rows.groupBy(_._1).view.mapValues { g =>
      (g.map(_._2).sum, g.map(_._3.toDouble).sum / g.size)
    }.toMap
    assert(byLang.size >= 2, "corpus must have several languages")
    val rare = byLang.minBy(_._2._1)
    val big = byLang.maxBy(_._2._1)
    assert(rare._2._2 > big._2._2,
      s"rare ${rare._1} mean ${rare._2._2} must exceed ${big._1} ${big._2._2}")
  }

  test("determinism: reruns identical, counts within one of the base") {
    val a = TrainingData.mixtureApply(spark, "/root/testdata/sf0.001").collect()
    val b = TrainingData.mixtureApply(spark, "/root/testdata/sf0.001").collect()
    assert(a.sameElements(b), "epoch composition must be rerun-stable")
    a.foreach { r =>
      val d = r.getInt(5) - r.getInt(3)
      assert(d == 0 || d == 1, s"doc ${r.getLong(0)} copies off base by $d")
    }
  }

  test("zero-token-mass language fails loudly, not NaN (r19 ADVICE)") {
    // a language whose every doc is whitespace has tok_l = 0 → r was
    // tot·√0/s/0 = NaN and floor(NaN) minted meaningless n_copies
    // silently; the guard raises instead (the winnow-guard convention)
    val c = corpusOf((1L, "en", "real words here"), (2L, "xx", "   "))
    val e = intercept[Exception] {
      TrainingData.mixtureApplyOf(c).collect()
    }
    def causes(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.toString +: causes(x.getCause))
    assert(causes(e).exists(_.contains("zero token mass")),
      s"expected the zero-token-mass raise, got: $e")
  }
}
