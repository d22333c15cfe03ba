package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SINGLE owner of the degenerate hot-bucket corpus: N identical
  * documents (identical text ⇒ identical shingles ⇒ every doc lands in
  * the same bucket of every MinHash band and the same SimHash key) and
  * N identical embeddings (one sign bucket holds the whole corpus).
  * Shared by HotBucketSpec (bounded-output pins) and
  * tools.CapBoundaryCheck (cross-engine truncating-regime
  * certification) so the two can never drift onto different regimes. */
object DegenerateCorpus {
  val NDocs = 500

  def write(spark: SparkSession, dir: String): Unit = {
    import spark.implicits._
    (0 until NDocs)
      .map(i => (i.toLong, "the same exact words repeated in every single document here"))
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
