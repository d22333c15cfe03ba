package graft.tools

import org.apache.spark.sql.functions._

/** Empirical certification of the B58 codebook scaling (r15 finding,
  * r16 fix): on the same synthesized corpus and the graded op's OWN
  * history/batch split (TrainingData.annSplit — single owner, no
  * drift), probe with (a) the r15 fixed 8-literal stand-in codebook
  * (vec_id 100–107, kept here as the historical comparison) and (b)
  * the GRADED corpus-scaled codebook (annSplit's own — every
  * `AnnCodebookStride`-th vector, K ≈ |corpus|/157). Prints, per
  * codebook: K, the true CANDIDATE volume (the cell join's size —
  * measured as the probe's row count with topK = ∞, i.e.
  * pre-truncation), and the wall of the real top-3 probe. The r15
  * quadratic term was per-probe work = |history|/K at fixed K;
  * scaling K with the corpus is the fix the graded op now carries
  * (r16 re-key), and this probe measures that it lands (results
  * tables in PLANS.md r15/r16).
  *
  * Run: `sbt "Test/runMain graft.tools.AnnScaleProbe [copies] [strides]"`
  * (default 20 — K ≈ 255 on the 20-copy corpus). The optional second
  * arg is a comma list of EXTRA strides to probe (e.g. `40,628`) for
  * sensitivity studies around the graded 157: each adds a
  * `stride-<n>` row with its own K/candidates/wall. */
object AnnScaleProbe {
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(20)
    val extraStrides: Seq[Int] =
      if (args.length > 1) args(1).split(",").filter(_.nonEmpty).map(_.toInt).toSeq
      else Nil
    require(graft.ScaleSmoke.corpusHasEmbeddings(copies),
      s"copies=$copies has no embeddings (mod-23 construction caps at 21)")
    val spark = graft.SparkTestSession.spark
    spark.sparkContext.setLogLevel("WARN")
    val dir = graft.ScaleSmoke.ensureCorpus(spark, copies)
    val emb = graft.sources.Tables.embeddings(spark, dir)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("e"))
    val (history, batch, graded) = graft.operators.TrainingData.annSplit(emb)
    val fixed8 = emb.filter(col("vec_id").between(100, 107))
      .select(col("vec_id").as("c_id"), col("e").as("ce"))

    val extra = extraStrides.map { n =>
      f"stride-$n%-6d" -> emb.filter(col("vec_id") % n === 0)
        .select(col("vec_id").as("c_id"), col("e").as("ce"))
    }
    for ((label, cb) <- Seq("fixed-8(r15)" -> fixed8, "graded-scaled" -> graded) ++ extra) {
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
          println(f"[annscale] ${copies}x $label%-13s K=$k%4d candidates=$cand%10d " +
            f"top3rows=$rows%8d wall=$secs%7.2f s")
      }
    }
  }
}
