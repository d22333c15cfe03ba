package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SINGLE owner of the degenerate hot-bucket corpus: a 400-identical-
  * document cluster (identical text ⇒ identical shingles ⇒ every doc
  * lands in the same bucket of every MinHash band and the same SimHash
  * key — far past every cap), a UNIQUE tail (doc_ids
  * [UniqueFrom, NDocs): per-id word sets, disjoint shingles — these
  * docs survive the e2e triage so the composed pipeline's vector/nn
  * stage is NOT vacuous on this corpus; r16, closing a review
  * finding), and N identical embeddings (one sign bucket holds the
  * whole corpus, and under the r16 codebook every centroid ties so the
  * cosine-tie → lower-c_id rule is exercised corpus-wide). Shared by
  * HotBucketSpec (bounded-output pins) and tools.CapBoundaryCheck
  * (cross-engine truncating-regime certification) so the two can
  * never drift onto different regimes. */
object DegenerateCorpus {
  val NDocs = 500
  val UniqueFrom = 400

  def write(spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    (0 until NDocs)
      .map { i =>
        val text =
          if (i < UniqueFrom) "the same exact words repeated in every single document here"
          else (0 until 8).map(w => s"tailword${w}_$i").mkString(" ")
        (i.toLong, text)
      }
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("x"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    (0 until NDocs)
      .map(i => (i.toLong, Array.tabulate(64)(k => (k + 1) / 64.0f)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }
}
