package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.{Mining, TrainingData}
import graft.plans.CharEntropy

/** Property tests for the r20-continuation kernels — the theorems the
  * hand corpora can only sample:
  *
  *  1. Luhn (ISO/IEC 7812) detects EVERY single-digit substitution —
  *     a constructed-valid number fails after any one-digit change;
  *  2. FastSS radius-1 completeness — for ANY random key and any one
  *     random edit (sub/insert/delete), the deletion-neighborhood
  *     blocked join finds the pair;
  *  3. entropy bounds — 0 ≤ H ≤ log2(distinct), 0 iff single-symbol,
  *     permutation-invariant. */
class NewKernelPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def cases[A](g: Gen[A], n: Int = 60): Seq[A] =
    Gen.listOfN(n, g).sample.get

  // reference Luhn (independent of the Spark fold)
  private def luhnSum(digits: Seq[Int]): Int =
    digits.reverse.zipWithIndex.map { case (d, i) =>
      if (i % 2 == 0) d else if (d > 4) 2 * d - 9 else 2 * d }.sum

  private def mkValid(body: Seq[Int]): String = {
    // compute the check digit that lands the total on 0 mod 10
    val candidate = (0 to 9).find(c => luhnSum(body :+ c) % 10 == 0).get
    (body :+ candidate).mkString
  }

  test("Luhn detects every single-digit substitution (the 7812 theorem)") {
    import spark.implicits._
    val gen = for {
      len <- Gen.chooseNum(12, 18)
      body <- Gen.listOfN(len, Gen.chooseNum(0, 9))
      pos <- Gen.chooseNum(0, len) // any position incl. the check digit
      delta <- Gen.chooseNum(1, 9)
    } yield {
      val valid = mkValid(body)
      val d = valid(pos) - '0'
      val mutated = valid.updated(pos, (('0' + (d + delta) % 10)).toChar)
      (valid, mutated)
    }
    val pairs = cases(gen)
    val rows = pairs.zipWithIndex.flatMap { case ((v, m), i) =>
      Seq((i * 2L, s"a $v b"), (i * 2L + 1, s"a $m b")) }
    val got = api.Graft.luhnScreen(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    pairs.indices.foreach { i =>
      assert(got(i * 2L), s"constructed number ${pairs(i)._1} must validate")
      assert(!got(i * 2L + 1),
        s"single-digit mutation ${pairs(i)._2} of ${pairs(i)._1} must fail")
    }
  }

  test("FastSS radius-1 completeness on random keys and random edits") {
    import spark.implicits._
    val alpha = Gen.alphaLowerChar
    val gen = for {
      len <- Gen.chooseNum(4, 20)
      base <- Gen.listOfN(len, alpha).map(_.mkString)
      kind <- Gen.chooseNum(0, 2)
      pos <- Gen.chooseNum(0, len - 1)
      c <- alpha
    } yield {
      val edited = kind match {
        case 0 => base.updated(pos, if (c == base(pos)) (if (c == 'z') 'a' else (c + 1).toChar) else c) // substitution
        case 1 => base.take(pos) + c + base.drop(pos)       // insertion
        case 2 => base.take(pos) + base.drop(pos + 1)       // deletion
      }
      (base, edited)
    }
    val pairs = cases(gen).filter(p => p._1 != p._2)
    val rows = pairs.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq((i * 2L, a), (i * 2L + 1, b)) }
    val got = api.Graft.fuzzyJoin(rows.toDF("doc_id", "key"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs.indices.foreach { i =>
      assert(got.contains((i * 2L, i * 2L + 1)),
        s"pair ${pairs(i)} at dist 1 must be found")
    }
  }

  test("entropy bounds: 0 <= H <= log2(distinct); 0 iff one symbol; permutation-invariant") {
    val gen = for {
      len <- Gen.chooseNum(1, 200)
      s <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c', 'd', 'x')).map(_.mkString)
    } yield s
    cases(gen).foreach { s =>
      val a = CharEntropy.compute(UTF8String.fromString(s))
      val (nd, h) = (a.getDouble(1).toInt, a.getDouble(3))
      assert(h >= -1e-12, s"H >= 0: '$s' -> $h")
      assert(h <= math.log(nd.toDouble) / math.log(2.0) + 1e-9,
        s"H <= log2(distinct): '$s' -> $h vs $nd")
      if (nd == 1) assert(math.abs(h) < 1e-12)
      val shuffled = new String(s.toCharArray.sorted)
      val b = CharEntropy.compute(UTF8String.fromString(shuffled))
      assert(math.abs(b.getDouble(3) - h) < 1e-9, "permutation-invariant")
    }
  }
}
