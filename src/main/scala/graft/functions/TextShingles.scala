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
    * corpus text is ever added on the 100 TB path. */
  def spreadForCpu(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < cores) df.repartition(cores) else df
  }

  /** Adds `ws` (words) and `shingles` (word 3-grams; whole-word
    * fallback for <3-word texts) to `df`, reading from `textCol`. */
  def withShingles(df: DataFrame, textCol: Column): DataFrame =
    df.withColumn("ws", split(textCol, " "))
      .withColumn("shingles", transform(
        sequence(lit(1), greatest(size(col("ws")) - 2, lit(1))),
        i => concat_ws(" ", element_at(col("ws"), i),
          try_element_at(col("ws"), i + 1), try_element_at(col("ws"), i + 2))))
}
