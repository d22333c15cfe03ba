package graft.tools

import org.apache.spark.sql.functions._

/** Scale measurement of `api.Graft.nearDupEmbeddings` (banded
  * sign-LSH, the r15-designed / r16-shipped 100 TB embedding near-dup
  * path) against the graded single-table `op_dedup_embedding`, on the
  * op's OWN corpus construction (originals 2·id + perturbed copies
  * 2·id+1) over the synthesized scale corpus: wall, total confirmed
  * pairs, and PLANTED-pair recall (the ground truth the construction
  * provides). Expected per the r15 math at the 0.995 threshold
  * (per-plane p ≈ 0.968): single 8-plane table ≈ p^8 ≈ 0.77; banded
  * 8 × 16 ≈ 1 − (1 − p^16)^8 ≈ 0.999.
  *
  * Run: `sbt "Test/runMain graft.tools.BandedLshProbe [copies]"`. */
object BandedLshProbe {
  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(20)
    require(graft.ScaleSmoke.corpusHasEmbeddings(copies),
      s"copies=$copies has no embeddings (mod-23 construction caps at 21)")
    val spark = graft.SparkTestSession.spark
    spark.sparkContext.setLogLevel("WARN")
    val dir = graft.ScaleSmoke.ensureCorpus(spark, copies)

    val base = graft.sources.Tables.embeddings(spark, dir)
      .select((col("vec_id") * 2).as("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("e"))
    val variants = base.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1).as("vec_id"),
        transform(col("e"), (x, i) => when(i === 0, x + 0.01).otherwise(x)).as("e"))
    val corpus = base.union(variants)
    val nPlanted = variants.count()

    def measure(label: String, f: => Array[(Long, Long)]): Unit = {
      f // warm
      val t0 = System.nanoTime()
      val pairs = f
      val secs = (System.nanoTime() - t0) / 1e9
      val planted = pairs.count { case (a, b) => b == a + 1 && a % 10 == 0 }
      println(f"[bandedlsh] ${copies}x $label%-22s wall=$secs%7.2f s pairs=${pairs.length}%8d " +
        f"plantedRecall=${planted * 100.0 / nPlanted}%6.2f%% ($planted/$nPlanted)")
    }
    measure("single-table(graded)",
      graft.operators.TrainingData.dedupEmbedding(spark, dir)
        .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))))
    measure("banded-8x16(api)",
      graft.api.Graft.nearDupEmbeddings(corpus, embCol = "e")
        .select("vec_a", "vec_b").collect().map(r => (r.getLong(0), r.getLong(1))))
  }
}
