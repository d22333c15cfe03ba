package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.MinHashSignature

/** The codegen'd MinHash kernel must be bit-identical to the
  * 8× aggregate/least hex-rotation fold it replaced (the DuckDB oracle
  * still states the fold's semantics). */
class MinHashSignatureSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def foldSig(hs: org.apache.spark.sql.Column) =
    array((0 until 8).map { seed =>
      val off = seed * 4
      aggregate(hs, lit("zz"),
        (acc, h) => least(acc,
          if (off == 0) h
          else concat(h.substr(lit(off + 1), lit(32 - off)), h.substr(lit(1), lit(off)))))
    }: _*)

  test("codegen kernel equals the aggregate/least fold on random shingle sets") {
    import spark.implicits._
    val df = spark.range(200).toDF("id")
      .withColumn("ws", split(concat_ws(" ",
        (0 until 30).map(i => md5(concat(col("id"), lit(i)))): _*), " "))
      .withColumn("hs", transform(col("ws"), w => md5(w)))
      .withColumn("a", MinHashSignature.minhashSig(col("hs")))
      .withColumn("b", foldSig(col("hs")))
    val bad = df.filter(not(col("a") === col("b"))).count()
    assert(bad == 0)
  }

  test("kernels execute inside whole-stage codegen (starred project)") {
    val df = spark.range(4)
      .select(array(md5(col("id").cast("string"))).as("hs"))
      .select(MinHashSignature.minhashSig(col("hs")).as("m"),
        graft.plans.SimHashSignature.simhashSig(col("hs")).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    val kernelLines = plan.linesIterator
      .filter(l => l.contains("graft_minhash_sig") || l.contains("graft_simhash_sig")).toSeq
    assert(kernelLines.nonEmpty)
    // '*(n)' marks operators compiled into a whole-stage-codegen stage
    assert(kernelLines.forall(_.contains("*(")), s"kernel outside codegen:\n$plan")
  }

  test("empty input yields the fold's 'zz' identity; interpreted eval agrees") {
    import spark.implicits._
    val empty = Seq(Seq.empty[String]).toDF("hs")
      .select(MinHashSignature.minhashSig(col("hs")).as("sig"))
      .head().getSeq[String](0)
    assert(empty == Seq.fill(8)("zz"))

    // interpreted (non-codegen) path: eval the expression directly
    val digests = Seq("0123456789abcdef0123456789abcdef", "fedcba9876543210fedcba9876543210")
    val lit = Literal.create(
      new GenericArrayData(digests.map(UTF8String.fromString).toArray),
      ArrayType(StringType))
    val out = MinHashSignature(lit, 8, 4).eval(null)
      .asInstanceOf[GenericArrayData].array.map(_.toString).toSeq
    val viaDf = Seq(digests).toDF("hs")
      .select(MinHashSignature.minhashSig(col("hs")).as("sig"))
      .head().getSeq[String](0)
    assert(out == viaDf)
  }
}
