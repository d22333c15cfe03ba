package graft.tools

import org.apache.spark.sql.functions._

/** Empirical close-out of the r15 quadratic-term finding: on the same
  * synthesized corpus and the graded op's OWN history/batch split
  * (TrainingData.annSplit — single owner, no drift), probe with (a)
  * the op's fixed 8-literal stand-in codebook and (b) a corpus-scaled
  * codebook (every `Stride`-th vector as an IVF coarse centroid,
  * K ≈ |corpus|/Stride — the api.Graft.annProbe production path).
  * Prints, per codebook: K, the true CANDIDATE volume (the cell
  * join's size — measured as the probe's row count with topK = ∞,
  * i.e. pre-truncation), and the wall of the real top-3 probe. The
  * quadratic term is per-probe work = |history|/K; scaling K with the
  * corpus is the fix the annIncremental scaladoc routes to, and this
  * probe measures that it actually lands (results table in PLANS.md
  * r15).
  *
  * Run: `sbt "Test/runMain graft.tools.AnnScaleProbe [copies] [stride]"`
  * (defaults 20, 157 — K ≈ 255 on the 20-copy corpus). */
object AnnScaleProbe {
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(20)
    val stride = args.drop(1).headOption.map(_.toInt).getOrElse(157)
    require(graft.ScaleSmoke.corpusHasEmbeddings(copies),
      s"copies=$copies has no embeddings (mod-23 construction caps at 21)")
    val spark = graft.SparkTestSession.spark
    spark.sparkContext.setLogLevel("WARN")
    val dir = graft.ScaleSmoke.ensureCorpus(spark, copies)
    val emb = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))
    val (history, batch, fixed8) = graft.operators.TrainingData.annSplit(emb)
    val scaled = emb.filter(col("vec_id") % stride === 0)
      .select(col("vec_id").as("c_id"), col("e").as("ce"))

    for ((label, cb) <- Seq("fixed-8 " -> fixed8, "scaled-K" -> scaled)) {
      val k = cb.count()
      // true candidate volume: the cell join pre-truncation (topK = ∞)
      val cand = graft.operators.TrainingData
        .annProbeWith(history, batch, cb, topK = Int.MaxValue).count()
      (1 to 2).foreach { rep => // rep 1 warms codegen; rep 2 is the number
        val t0 = System.nanoTime()
        val rows = graft.operators.TrainingData
          .annProbeWith(history, batch, cb, topK = 3).count()
        val secs = (System.nanoTime() - t0) / 1e9
        if (rep == 2)
          println(f"[annscale] ${copies}x $label K=$k%4d candidates=$cand%10d " +
            f"top3rows=$rows%8d wall=$secs%7.2f s")
      }
    }
  }
}
