package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.api.Graft
import graft.operators.Curation
import graft.sources.Tables

/** Pins each corpus-curation public API (B68–B71) to its graded twin:
  * the API must produce EXACTLY the graded op's rows when called with
  * the graded parameters on the graded corpus construction — so the
  * oracle gate protecting the op protects the API's semantics too —
  * and must reject parameterizations that would silently corrupt
  * results. */
class ApiCurationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("bloomContaminate == op_sketch_bloom on the graded construction") {
    val base = Tables.documents(spark, dir)
      .select((col("doc_id") * 2).as("doc_id"), col("text"))
    val heldout = base.filter(col("doc_id") % 50 === 0)
    val train = base.filter(col("doc_id") % 50 =!= 0)
      .union(heldout.select((col("doc_id") + 1).as("doc_id"),
        concat(lit("leaked copy "), col("text")).as("text")))
    val api = Graft.bloomContaminate(train, heldout)
    assert(sortedRows(api) == sortedRows(Curation.sketchBloom(spark, dir)))
  }

  test("bloomStreamGate == op_stream_bloom on the graded construction") {
    val base = Tables.documents(spark, dir)
      .select((col("doc_id") * 2).as("doc_id"), col("text"))
    val heldout = base.filter(col("doc_id") % 50 === 0)
    val train = base.filter(col("doc_id") % 50 =!= 0)
      .union(heldout.select((col("doc_id") + 1).as("doc_id"),
        concat(lit("leaked copy "), col("text")).as("text")))
    val api = Graft.bloomStreamGate(train, heldout)
    assert(sortedRows(api) == sortedRows(Curation.streamBloom(spark, dir)))
  }

  test("dsirWeights == op_dsir_weights at the graded target and fraction") {
    val api = Graft.dsirWeights(Tables.documents(spark, dir),
      col("source") === Curation.DsirTargetSource)
    assert(sortedRows(api) == sortedRows(Curation.dsirWeights(spark, dir)))
    // a keep fraction outside (0, 1] would select nothing or throw off
    // the threshold scan — rejected loudly
    intercept[IllegalArgumentException] {
      Graft.dsirWeights(Tables.documents(spark, dir), lit(true),
        keepFraction = 0.0)
    }
  }

  test("dsirModel + dsirScoreStream == op_stream_dsir at graded parameters") {
    val d = Tables.documents(spark, dir)
    val model = Graft.dsirModel(d, col("source") === Curation.DsirTargetSource)
    val api = Graft.dsirScoreStream(d, model)
    assert(sortedRows(api) == sortedRows(Curation.streamDsir(spark, dir)))
    intercept[IllegalArgumentException] {
      Graft.dsirScoreStream(d, (Array(0.0), 0L))  // wrong model width
    }
  }

  test("dedupLines == op_dedup_lines on the graded construction") {
    val base = Tables.documents(spark, dir)
    val corpus = base.select((col("doc_id") * 2).as("doc_id"), col("text"))
      .union(base.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") * 2 + 1).as("doc_id"),
          concat(lit(Curation.BoilerLine + " "), col("text")).as("text")))
    val api = Graft.dedupLines(corpus)
    assert(sortedRows(api) == sortedRows(Curation.dedupLines(spark, dir)))
    // minDocs = 1 would flag EVERY eligible line as its own duplicate
    // and scrub the whole corpus — rejected loudly
    intercept[IllegalArgumentException] {
      Graft.dedupLines(corpus, minDocs = 1)
    }
  }

  test("corpusReport == op_stats_zipf at the graded depth") {
    val api = Graft.corpusReport(Tables.documents(spark, dir))
    assert(sortedRows(api) == sortedRows(Curation.statsZipf(spark, dir)))
    // a one-rank regression has no slope
    intercept[IllegalArgumentException] {
      Graft.corpusReport(Tables.documents(spark, dir), ranks = 1)
    }
  }
}
