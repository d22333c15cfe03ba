package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{LlmPipeline, TrainingData}

/** Bucket-occupancy margin certification beyond verify SF (VERDICT r13
  * task 2): the capped ≡ uncapped equivalence of the LSH candidate
  * stages rests on no real bucket NEARING its cap — a premise
  * HotBucketSpec pins at sf0.01 and sf0.1, but bucket occupancy grows
  * with corpus size, so this probe measures the UNCAPPED occupancy
  * distribution one more order of magnitude up, on the same
  * synthesized corpus the 10× scale smoke certifies
  * (ScaleSmoke.ensureCorpus — structure-linear growth: within-copy dup
  * relations preserved, cross-copy shingle/sign sets disjoint).
  *
  * Since r15 every capped structure carries its cap in its oracle SQL
  * (declared semantics, B56 pattern — minhash corpus bands were the
  * last to convert; PLANS.md r15 records the policy), so a cap breach
  * can no longer desync the engines anywhere: it marks where the cap
  * starts truncating real members (a recall boundary, reported
  * informationally). History of the two probe classes:
  *   - FIXED-cardinality keys go linear once saturated: embedding's
  *     2^8 sign space breached at 10× sf0.1 (max 911 > 512) and
  *     simhash's 6 × 2^16 combo space was 9 from its cap at 100× (max
  *     55 of 64, 185 buckets in the top half) — both caught by this
  *     probe in r14, both oracles capped that round; a fixed key is
  *     documented as the wrong index once corpus ≫ key space.
  *   - Content-derived keys (minhash corpus bands, B56 history index)
  *     grow with the corpus, so occupancy is collision/cluster-driven
  *     and slow — measured 4 → 11 → 17 → 23 across sf0.01 / sf0.1 /
  *     10× / 100×, cap 64. But corpus-band occupancy tracks true
  *     dup-CLUSTER size, a data property a synthetic probe cannot
  *     bound for real boilerplate-heavy corpora, which is why r15
  *     moved the corpus bands to a capped oracle rather than keeping
  *     the hard gate.
  *
  * Prints max occupancy, its margin to the cap, and how many buckets
  * sit in the top half of the cap range; exits nonzero only if an
  * uncapped-oracle premise breaches (none remain as of r15 — the
  * mechanism stays wired for any future uncapped structure). Results
  * tables live in PLANS.md (r14, r15).
  *
  * Run: `sbt "Test/runMain graft.tools.BucketOccupancy [copies]"` */
object BucketOccupancy {

  private def occupancy(df: DataFrame, cap: Int, keys: String*): (Long, Long) = {
    val counts = df.groupBy(keys.map(col): _*).count()
    val row = counts.agg(
      max("count").as("mx"),
      sum(when(col("count") >= cap / 2, 1L).otherwise(0L)).as("hot")).head()
    (row.getLong(0), row.getLong(1))
  }

  /** op_fuzzy_join's graded-corpus deletion-variant frame (base keys
    * + substitution/deletion plant clones), distinct (doc, vk). */
  private def fuzzyVariants(sp: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    val b = graft.sources.Tables.documents(sp, dir)
      .select(col("doc_id"), col("text"))
    val corpus = b.select((col("doc_id") * 3).as("doc_id"),
        substring(col("text"), 1, 24).as("key"))
      .union(b.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") * 3 + 1).as("doc_id"),
          concat(substring(col("text"), 1, 4), lit("#"),
            substring(col("text"), 6, 19)).as("key")))
      .union(b.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") * 3 + 2).as("doc_id"),
          concat(substring(col("text"), 1, 6),
            substring(col("text"), 8, 17)).as("key")))
    corpus.filter(length(col("key")) >= 1)
      .select(col("doc_id"), explode(concat(array(col("key")),
        transform(sequence(lit(0), length(col("key")) - 1),
          i => concat(col("key").substr(lit(1), i),
            col("key").substr(i + lit(2), length(col("key"))))))).as("v"))
      .select(col("doc_id"), md5(col("v")).as("vk")).distinct()
  }

  def main(args: Array[String]): Unit = {
    val copies = args.headOption.map(_.toInt).getOrElse(10)
    val spark = graft.SparkTestSession.spark
    spark.sparkContext.setLogLevel("WARN")
    val scaled = graft.ScaleSmoke.ensureCorpus(spark, copies)
    val dirs = Seq(
      "sf0.01 (verify)" -> "/root/testdata/sf0.01",
      "sf0.1  (10x verify)" -> graft.ScaleSmoke.Base,
      f"scale$copies%-3d (${copies}x sf0.1)" -> scaled)

    var breach = false
    for ((label, dir) <- dirs) {
      // B56's stored side: quarter-corpus history, banded, pre-cap
      val history = LlmPipeline.minhashHistoryDocs(spark, dir)
      // (name, frame, cap, oracleCapped, keys); embeddings are absent
      // from synthesized corpora above 21 copies (ScaleSmoke's mod-23
      // flip construction), so that probe joins only when the file exists
      val probes = Seq(
        ("minhash corpus bands", LlmPipeline.minhashBanded(
          LlmPipeline.minhashCorpus(spark, dir)),
          LlmPipeline.MaxBucketDocs, true, Seq("band_id", "band_key")),
        ("B56 history index   ", LlmPipeline.minhashBanded(history),
          LlmPipeline.MaxBucketDocs, true, Seq("band_id", "band_key")),
        ("simhash keys        ", TrainingData.simhashKeyed(spark, dir),
          LlmPipeline.MaxBucketDocs, true, Seq("key")),
        // r20b: fuzzy join's deletion-variant buckets (graded corpus
        // incl. the sub/del plant clones, which share variants with
        // their originals) — content-derived keys, capped oracle
        ("fuzzy variant bkts  ", fuzzyVariants(spark, dir),
          graft.operators.Mining.FuzzyBucketCap, true, Seq("vk"))) ++
        (if (new java.io.File(s"$dir/embeddings.parquet").exists())
          Seq(("embedding buckets   ", TrainingData.embeddingBucketed(spark, dir),
            TrainingData.MaxBucketVecs, true, Seq("bk")))
        else Nil)
      for ((name, df, cap, oracleCapped, keys) <- probes) {
        val (mx, hot) = occupancy(df, cap, keys: _*)
        val over = mx > cap
        if (over && !oracleCapped) breach = true
        val status =
          if (!over) "OK"
          else if (oracleCapped) "TRUNCATING (capped oracle — recall boundary, not divergence)"
          else "BREACH"
        println(f"[occupancy] $label  $name max=$mx%4d cap=$cap%4d " +
          f"margin=${cap - mx}%4d buckets>=cap/2=$hot%4d $status")
      }
    }
    if (breach) sys.error("an uncapped-oracle bucket premise breached its cap — the " +
      "capped op no longer equals its uncapped oracle at this scale; cap the oracle " +
      "(B56 pattern) or re-shard the index key")
  }
}
