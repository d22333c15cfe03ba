package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native Hamming kernel must be bit-identical to the
  * aggregate/substr fold it replaced in op_dedup_simhash — including
  * the fold's edge semantics for strings shorter than 32 chars
  * (substr past the end yields "", and "" = "" counts equal). */
class HammingDistanceSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def fold(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(sequence(lit(1), lit(32)), lit(0),
      (acc, j) => acc + when(a.substr(j, lit(1)) =!= b.substr(j, lit(1)), 1).otherwise(0))

  test("kernel equals the fold on signatures, short strings and mixed lengths") {
    val rnd = new scala.util.Random(7)
    def sig(n: Int) = (0 until n).map(_ => if (rnd.nextBoolean()) '1' else '0').mkString
    val cases = (1 to 200).map(_ => (sig(32), sig(32))) ++
      Seq(("", ""), ("1", ""), ("", "0"), (sig(10), sig(32)), (sig(32), sig(10)),
        (sig(40), sig(40)), ("abc", "abd"))
    val df = cases.toDF("a", "b")
      .select(graft.plans.HammingDistance.hamming(col("a"), col("b"), 32).as("k"),
        fold(col("a"), col("b")).as("f"))
    df.collect().foreach(r => assert(r.getInt(0) == r.getInt(1),
      s"kernel ${r.getInt(0)} != fold ${r.getInt(1)}"))
  }

  test("non-ASCII input keeps character-position semantics (= the fold)") {
    // the registered SQL help promises "character positions"; multi-byte
    // UTF-8 must index like the substr fold, not like raw bytes
    val cases = Seq(
      ("héllo", "hello"), ("héllo", "héllo"), ("日本語です", "日本誤です"),
      ("ü" * 40, "ü" * 40), ("üüü", "uuu"), ("aé中", "aé中"),
      ("𝄞clef", "gclef"), ("é", ""), ("中中", "中"))
    val df = cases.toDF("a", "b")
      .select(graft.plans.HammingDistance.hamming(col("a"), col("b"), 32).as("k"),
        fold(col("a"), col("b")).as("f"))
    df.collect().foreach(r => assert(r.getInt(0) == r.getInt(1),
      s"kernel ${r.getInt(0)} != fold ${r.getInt(1)}"))
  }
}
