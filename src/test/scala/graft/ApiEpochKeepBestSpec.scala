package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Graft
import graft.operators.LlmPipeline

/** The r19 public APIs `Graft.epochCompose` and `Graft.nearDupKeepBest`
  * share their cores with the graded B84/B85 ops — this spec pins that
  * parity (API over renamed caller columns ≡ graded output on the same
  * corpus), the keep-best policy's agreement with the graded closure,
  * and the id validation that fails loudly. */
class ApiEpochKeepBestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private def docs = sources.Tables.documents(spark, dir)

  test("epochCompose over renamed columns reproduces op_mixture_apply") {
    val renamed = docs.select(col("doc_id").as("id"),
      col("lang").as("grp"), col("text").as("body"))
    val api = Graft.epochCompose(renamed, idCol = "id", groupCol = "grp",
        textCol = "body")
      .orderBy("doc_id").collect()
    val graded = graft.operators.TrainingData.mixtureApply(spark, dir).collect()
    assert(api.length == graded.length && api.nonEmpty)
    api.zip(graded).foreach { case (a, g) => assert(a == g) }
  }

  test("nearDupKeepBest on the graded corpus reproduces op_dedup_keep_best") {
    val corpus = LlmPipeline.minhashCorpus(spark, dir)
      .select(col("doc_id").as("my_id"), col("text").as("body"))
    val api = Graft.nearDupKeepBest(corpus, col("my_id"), col("body"))
      .orderBy("id").collect()
    val graded = LlmPipeline.dedupKeepBest(spark, dir).collect()
    assert(api.length == graded.length && api.nonEmpty)
    api.zip(graded).foreach { case (a, g) => assert(a == g) }
  }

  test("nearDupKeepBest fails fast on non-castable ids") {
    import spark.implicits._
    val bad = Seq((3.2, "a doc"), (3.7, "b doc")).toDF("my_id", "body")
    val e = intercept[Exception] {
      Graft.nearDupKeepBest(bad, col("my_id"), col("body")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("neardupkeepbest") ||
      e.getMessage.toLowerCase.contains("lossless"))
  }
}
