package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.api.Graft
import graft.operators.{Mining, TrainingData}

/** The r16 corpus-prep public APIs (`Graft.chunkDocuments` /
  * `repeatedSpans` / `perplexityBuckets`) share ONE core each with the
  * graded ops — this spec pins that parity (API at the graded
  * parameters ≡ graded output), the production hashed-gram key's
  * agreement with the string key, the fraction-derived threshold's
  * agreement with the oracle's `ceil(n/3.0)` arithmetic, and the
  * argument validation that fails loudly instead of silently dropping
  * data. */
class ApiCorpusPrepSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"
  private def docs = sources.Tables.documents(spark, dir)

  test("chunkDocuments at the graded window/stride reproduces op_chunk_sliding") {
    val api = Graft.chunkDocuments(docs, window = TrainingData.ChunkWindow,
        stride = TrainingData.ChunkStride)
      .orderBy("doc_id", "chunk_id").collect()
    val graded = TrainingData.chunkSliding(spark, dir).collect()
    assert(api.length == graded.length)
    api.zip(graded).foreach { case (a, g) => assert(a == g) }
  }

  test("chunkDocuments rejects stride > window and stride < 1") {
    val e = intercept[IllegalArgumentException] {
      Graft.chunkDocuments(docs, window = 8, stride = 9)
    }
    assert(e.getMessage.contains("silently lost"))
    intercept[IllegalArgumentException] {
      Graft.chunkDocuments(docs, window = 8, stride = 0)
    }
  }

  test("repeatedSpans' hashed production key reproduces the string-key counts") {
    // same corpus the graded op plants (originals + wrapper variants);
    // a hash collision merges gram groups and perturbs counts (either
    // direction) — equality here certifies the hashed path
    // collision-free on this corpus AND count-identical in the clean
    // case
    val base = docs.select((col("doc_id") * 2).as("doc_id"), col("text"))
      .union(docs.filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") * 2 + 1).as("doc_id"),
          concat(lit("injected preamble sentence "), col("text")).as("text")))
    val hashed = Graft.repeatedSpans(base, gramTokens = TrainingData.SubstrGram)
      .orderBy("doc_id").collect()
    val graded = TrainingData.dedupSubstring(spark, dir).collect()
    assert(hashed.length == graded.length)
    hashed.zip(graded).foreach { case (h, g) => assert(h == g) }
  }

  test("perplexityBuckets at 1/3, 2/3 reproduces op_perplexity_filter") {
    // pins that ceil(n * (1.0/3)) / ceil(n * (2.0/3)) land on the same
    // integers as the oracle's ceil(n/3.0) / ceil(n*2/3.0) — both
    // double formulations sit strictly inside the same unit interval
    // (the stored fractions are below the true ones by < 1/4 ulp)
    val api = Graft.perplexityBuckets(docs).orderBy("doc_id").collect()
    val graded = Mining.perplexityFilter(spark, dir).collect()
    assert(api.length == graded.length)
    api.zip(graded).foreach { case (a, g) => assert(a == g) }
  }

  test("perplexityBuckets rejects out-of-range fractions") {
    intercept[IllegalArgumentException] {
      Graft.perplexityBuckets(docs, tailFraction = 0.5, headFraction = 0.4)
    }
    intercept[IllegalArgumentException] {
      Graft.perplexityBuckets(docs, tailFraction = 0.2, headFraction = 1.0)
    }
    intercept[IllegalArgumentException] {
      Graft.repeatedSpans(docs, gramTokens = 1)
    }
  }
}
