package graft.tools

import org.apache.spark.sql.functions._

/** Empirical close-out of the r15 quadratic-term finding: on the same
  * synthesized corpus, probe the SAME history/batch split with (a) the
  * graded op's fixed 8-literal stand-in codebook and (b) a
  * corpus-scaled codebook (every `Stride`-th vector as an IVF coarse
  * centroid, K ≈ |corpus|/Stride — the api.Graft.annProbe production
  * path), and print candidate volume + wall for each. The quadratic
  * term is per-probe work = |history|/K; scaling K with the corpus is
  * the fix the annIncremental scaladoc routes to, and this probe
  * measures that it actually lands (results table in PLANS.md r15).
  *
  * Run: `sbt "Test/runMain graft.tools.AnnScaleProbe [copies] [stride]"`
  * (defaults 20, 157 — K ≈ 255 on the 20-copy corpus). */
object AnnScaleProbe {
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(20)
    val stride = args.drop(1).headOption.map(_.toInt).getOrElse(157)
    val spark = graft.SparkTestSession.spark
    spark.sparkContext.setLogLevel("WARN")
    val dir = graft.ScaleSmoke.ensureCorpus(spark, copies)
    require(graft.ScaleSmoke.corpusHasEmbeddings(copies),
      s"copies=$copies has no embeddings (mod-23 construction caps at 21)")
    val emb = graft.sources.Tables.embeddings(spark, dir)
    val history = emb.filter(col("vec_id") % 4 === 0)
      .select((col("vec_id") * 2).as("vec_id"), col("embedding"))
    val batch = emb.filter(col("vec_id") % 4 =!= 0)
      .select((col("vec_id") * 2).as("vec_id"), col("embedding"))
      .union(emb.filter(col("vec_id") % 8 === 0)
        .select((col("vec_id") * 2 + 1).as("vec_id"), col("embedding")))
    val fixed8 = emb.filter(col("vec_id").between(100, 107))
      .select(col("vec_id").as("c_id"), col("embedding").as("centroid"))
    val scaled = emb.filter(col("vec_id") % stride === 0)
      .select(col("vec_id").as("c_id"), col("embedding").as("centroid"))

    for ((label, cb) <- Seq("fixed-8  " -> fixed8, f"scaled-K" -> scaled)) {
      val k = cb.count()
      // candidate volume = the cell join's row count pre-window
      (1 to 2).foreach { rep => // rep 1 warms codegen; rep 2 is the number
        val t0 = System.nanoTime()
        val rows = graft.api.Graft.annProbe(history, batch, cb).count()
        val secs = (System.nanoTime() - t0) / 1e9
        if (rep == 2)
          println(f"[annscale] ${copies}x $label K=$k%4d top3rows=$rows%8d wall=$secs%7.2f s")
      }
    }
  }
}
