package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.TrainingData
import graft.plans.VectorKernels

/** The native cosine / LSH-bucket kernels must be value-identical to
  * the zip_with+aggregate folds they replaced (same ascending-index FP
  * accumulation — the DuckDB oracle states the fold's arithmetic). */
class VectorKernelsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def foldCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  test("cosine kernel bit-equals the fold on real embeddings (float arrays)") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val pairs = emb.select(col("vec_id"), col("embedding").as("a"))
      .crossJoin(emb.select(col("vec_id").as("v2"), col("embedding").as("b")))
      .filter(col("vec_id") < 5 && col("v2") < 30)
      .select(VectorKernels.cosine(col("a"), col("b")).as("k"),
        foldCosine(col("a"), col("b")).as("f"))
    // bit-identical, not approximately equal
    assert(pairs.filter(not(col("k") === col("f"))).count() == 0)
  }

  test("cosine kernel on double arrays and null/mismatch semantics") {
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0))).toDF("a", "b")
      .select(VectorKernels.cosine(col("a"), col("b")).as("k"),
        foldCosine(col("a"), col("b")).as("f"))
    val r = df.head()
    assert(r.getDouble(0) == r.getDouble(1))

    // length mismatch -> null (zip_with pads with null, poisoning the fold)
    val mm = Seq((Seq(1.0, 2.0), Seq(3.0))).toDF("a", "b")
      .select(VectorKernels.cosine(col("a"), col("b")).as("k")).head()
    assert(mm.isNullAt(0))
  }

  test("lsh bucket kernel equals the fold-based sign bucket") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))
    val planes = (0 until 8).map(TrainingData.hyperplane(_))
    def foldBucket(e: org.apache.spark.sql.Column) =
      concat_ws("", planes.map { h =>
        val dot = aggregate(zip_with(e, array(h.map(lit): _*), (x, w) => x * w),
          lit(0.0), (a, v) => a + v)
        when(dot >= 0, "1").otherwise("0")
      }: _*)
    val bad = emb.select(
      graft.plans.VectorKernels.lshBucket(col("e"), planes).as("k"),
      foldBucket(col("e")).as("f"))
      .filter(not(col("k") === col("f"))).count()
    assert(bad == 0)
  }
}
