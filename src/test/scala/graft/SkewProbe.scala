package graft

import org.apache.spark.sql.functions._

import graft.operators.Mining

/** Evidence run for `op_ngram_lm`'s documented Zipf-skew story
  * (Mining.scala scale note + PLANS.md): does AQE's skew-join split
  * actually engage on the (w1, w2) model join when the corpus grows?
  *
  * Construction: 10 verbatim copies of the sf0.1 documents (distinct
  * doc_ids, SAME text) — unlike ScaleSmoke's suffix transform, identical
  * text means every hot bigram gets 10× hotter, which is how real corpus
  * growth behaves for a Zipf distribution.
  *
  * Two passes over the same query:
  *  1. default AQE thresholds (256 MB skewedPartitionThresholdInBytes) —
  *     records that test-scale partitions sit far below the trip point;
  *  2. thresholds lowered to test-scale bytes — records that AQE's
  *     OptimizeSkewedJoin DOES split this exact join shape once a
  *     partition crosses the threshold, i.e. the 100 TB mitigation is
  *     the mechanism already wired into the plan, not a hope.
  *
  * Run: `Test/runMain graft.SkewProbe`; results table lives in PLANS.md.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    spark.sparkContext.setLogLevel("WARN")
    val base = graft.sources.Tables.documents(spark, "/root/testdata/sf0.1")
      .select(col("doc_id"), col("text"))
    val rep = (0 until 10).map { k =>
      base.select((col("doc_id") + k * 1000000L).as("doc_id"), col("text"))
    }.reduce(_ unionByName _).cache()
    println(s"[skew] corpus: ${rep.count()} docs (10 verbatim copies of sf0.1)")

    def probe(label: String): Unit = {
      val t0 = System.nanoTime()
      val lm = Mining.ngramLmScores(rep)
      // execute THIS DataFrame (count() would run a separate query
      // execution and leave lm's adaptive plan at isFinalPlan=false)
      val n = lm.collect().length
      val secs = (System.nanoTime() - t0) / 1e9
      val plan = lm.queryExecution.executedPlan.toString
      assert(plan.startsWith("AdaptiveSparkPlan isFinalPlan=true"), "not the final AQE plan")
      val smj = plan.linesIterator.filter(_.contains("SortMergeJoin")).toSeq
      val skewLines = plan.linesIterator
        .filter(l => l.toLowerCase.contains("skew")).toSeq
      println(f"[skew] $label: rows=$n  ${secs}%6.2f s  " +
        s"SMJ=${smj.size}  skew-marked=${skewLines.size}")
      (smj ++ skewLines).take(8).foreach(l => println("[skew]   " + l.trim.take(150)))
    }

    probe("default-thresholds")

    // test-scale trip point: partitions here are a few MB, so lower the
    // byte threshold (prod default 256 MB) to what 100 TB partitions
    // would exceed anyway; factor stays at the default 5x-median rule
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512k")
    try {
      probe("lowered-thresholds")
      // the (w1,w2) SMJ's output partitioning feeds the (w1) join, so by
      // default OptimizeSkewedJoin refuses a split that would force an
      // extra shuffle — `force` tells it to split anyway, which is what
      // a 100 TB job would enable for this shape
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      probe("forced+factor2")
      // ground truth on the key distribution the probes are judged by:
      // per-partition bigram-instance counts of the (w1, w2) shuffle
      val counts = rep
        .select(col("doc_id"), filter(split(col("text"), " "), t => t =!= "").as("ts"))
        .filter(size(col("ts")) >= 2)
        .select(explode(expr(
          "arrays_zip(slice(ts, 1, size(ts) - 1), slice(ts, 2, size(ts) - 1))")).as("bg"))
        .select(hash(col("bg")).as("h"))
        .select((pmod(col("h"), lit(32))).as("part"))
        .groupBy("part").count().orderBy(desc("count"))
        .collect().map(_.getLong(1))
      println(s"[skew] (w1,w2) 32-partition histogram: max=${counts.head} " +
        s"median=${counts(counts.length / 2)} min=${counts.last} " +
        f"max/median=${counts.head.toDouble / counts(counts.length / 2)}%.2f")

      // --- the wired-in escape: hot-prefix salting fires and is
      // result-invariant. Plant a hot bigram (every doc gains 3
      // ("zqhot","zqhot") instances -> the zqhot prefix count is
      // ~3x the corpus size, far past the probe threshold).
      val planted = rep.withColumn("text",
        concat(col("text"), lit(" zqhot zqhot zqhot zqhot"))).cache()
      planted.count()
      val t0 = System.nanoTime()
      val salted = Mining.ngramLmScores(planted, hotPrefixInstances = 100000L)
      val saltedRows = salted.collect()
      val tSalted = (System.nanoTime() - t0) / 1e9
      // the executedPlan dump includes the pre-AQE "Initial Plan",
      // where __salt always appears structurally — only the FINAL
      // section proves the branch survived empty-relation pruning
      val saltedPlan = salted.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(saltedPlan.contains("__salt"),
        "planted hot bigram did not trip the salted path in the FINAL plan")
      val t1 = System.nanoTime()
      val plainRows = Mining.ngramLmScores(planted, hotPrefixInstances = Long.MaxValue)
        .collect()
      val tPlain = (System.nanoTime() - t1) / 1e9
      // the scoring core is unsorted since the B63 refactor, and the
      // two plans differ — align by doc_id before the pairwise compare
      def byId(rows: Array[org.apache.spark.sql.Row]) = rows.sortBy(_.getLong(0))
      assert(saltedRows.length == plainRows.length &&
        byId(saltedRows).zip(byId(plainRows)).forall { case (a, b) => a == b },
        "salted and plain plans disagree — salting must be result-invariant")
      println(f"[skew] hot-prefix escape: salted path FIRED on planted bigram " +
        f"(${saltedRows.length} rows, salted ${tSalted}%.2f s vs plain ${tPlain}%.2f s, " +
        "results identical)")
      planted.unpersist()
    } finally {
      spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
      spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
      spark.conf.unset("spark.sql.adaptive.forceOptimizeSkewedJoin")
      spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
      rep.unpersist()
    }
  }
}
