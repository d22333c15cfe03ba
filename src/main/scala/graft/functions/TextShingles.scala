package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Word 3-gram shingling shared by the near-dup operators (MinHash,
  * SimHash, Jaccard). Materialized as columns on purpose: a Column
  * subtree referenced inside a higher-order-function lambda is inlined
  * and re-evaluated per array element (no CSE inside lambdas), so each
  * derived column must be computed once per row via withColumn.
  */
object TextShingles {

  /** Widens `df` to one partition per core ONLY when the scan has
    * fewer — at tiny SF a documents table is a single parquet file
    * (1–2 input splits), which would pin the CPU-bound signature pass
    * to 1 of 32 cores. At production scale the scan already has more
    * partitions than cores and this is a no-op: no shuffle of the
    * corpus text is ever added on the 100 TB path.
    *
    * The spread HASH-partitions on `key` (doc_id — unique, so evenly
    * spread) rather than round-robin: Spark's round-robin repartition
    * binary-sorts every input partition first
    * (`spark.sql.execution.sortBeforeRepartition`, for retry
    * determinism) — a per-row cost on the corpus text that hash
    * partitioning doesn't pay, and hash placement is deterministic by
    * construction. */
  def spreadForCpu(df: DataFrame, key: Column = col("doc_id")): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) df.repartition(cores, key) else df
  }

  /** Adds `shingles` (word 3-grams; whole-text fallback for <3-word
    * texts) to `df`, reading from `textCol` — via the native
    * `graft.plans.ShingleWords` kernel (one pass, no per-element
    * lambda allocation; parity with the old split/transform/concat_ws
    * fold is pinned by ShingleWordsSpec). */
  def withShingles(df: DataFrame, textCol: Column): DataFrame =
    df.withColumn("shingles", graft.plans.ShingleWords.shingles(textCol))
}
