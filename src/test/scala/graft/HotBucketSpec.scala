package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{LlmPipeline, TrainingData}

/** The hot-bucket cap (LlmPipeline.MaxBucketDocs): a degenerate corpus
  * — N identical documents, so every LSH band bucket holds every doc —
  * must produce BOUNDED candidate output (≤ C(cap, 2) pairs), not the
  * O(N²) blow-up an uncapped collect_set + pair expansion would give.
  * On healthy corpora the cap is invisible; the oracle rows of
  * op_dedup_minhash / op_dedup_simhash / op_dedup_embedding pin that
  * side (CORRECTNESS gate at sf0.01).
  */
class HotBucketSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("hotbucket").toString
    // shared construction (DegenerateCorpus): identical text/vectors,
    // so every bucket of every structure holds the whole cluster
    DegenerateCorpus.write(spark, d)
    d
  }

  private def maxPairs(cap: Int) = cap.toLong * (cap - 1) / 2

  // the op unions a variant cluster (text + " extraneous") onto the
  // base cluster, so the degenerate corpus has TWO all-identical
  // clusters (the unique-text tail docs and their variants are
  // singleton buckets — zero pairs, bounds unaffected). Every band
  // bucket is capped to C(cap, 2) pairs, and a band holds at most 2
  // pair-bearing buckets here, so the distinct union over all
  // bands is ≤ bands × 2 × C(cap, 2). The per-band keep-sets can
  // DIFFER (the odd/even planted ids interleave with base ids, so a
  // band where the clusters share a bucket keeps a different
  // 64-smallest-id set than a band where they don't), which is why
  // the bound is per band, not per cluster. Uncapped, the base
  // cluster alone would emit C(500,2) = 124,750.

  test("minhash: N identical docs yield bounded candidate pairs (≤ 4 bands × 2 × C(cap,2))") {
    val n = LlmPipeline.dedupMinhash(spark, dir).count()
    assert(n > 0 && n <= 4 * 2 * maxPairs(LlmPipeline.MaxBucketDocs),
      s"candidate pairs $n exceed the bucket-cap bound")
  }

  test("simhash: N identical docs yield bounded confirmed pairs (≤ 6 combos × 2 × C(cap,2))") {
    val n = TrainingData.dedupSimhash(spark, dir).count()
    assert(n > 0 && n <= 6 * 2 * maxPairs(LlmPipeline.MaxBucketDocs),
      s"candidate pairs $n exceed the bucket-cap bound")
  }

  test("embedding: N identical vectors yield at most 2*C(cap,2) pairs") {
    // one sign bucket per cluster (the bucket key is the embedding's
    // sign pattern, not a band) — the 2-cluster bound stays exact
    val n = TrainingData.dedupEmbedding(spark, dir).count()
    assert(n > 0 && n <= 2 * maxPairs(TrainingData.MaxBucketVecs),
      s"candidate pairs $n exceed the bucket-cap bound")
  }

  test("banded embedding: the cross-table DISTINCT keeps the degenerate bound at 2*C(cap,2)") {
    // identical vectors get identical signatures, so every table's
    // bucket holds the same cap-lowest keep-set and the distinct union
    // over tables collapses back to the single-table bound — banding
    // buys recall on healthy data, never extra degenerate pair volume
    val n = TrainingData.dedupEmbeddingBanded(spark, dir).count()
    assert(n > 0 && n <= 2 * maxPairs(TrainingData.MaxBucketVecs),
      s"banded pairs $n exceed the 2-cluster bucket-cap bound")
  }

  private def maxOccupancy(df: org.apache.spark.sql.DataFrame, keys: String*): Long =
    df.groupBy(keys.map(col): _*).count()
      .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0)

  private def assertUnderCaps(vdir: String, at: String): Unit = {
    // minhash corpus bands: oracle CAPPED since r15 (the last uncapped
    // structure — corpus-band occupancy tracks true dup-cluster size,
    // a data property no synthetic probe bounds for real corpora, so
    // the cap is declared semantics via MinhashBcapSql); the assert
    // pins that truncation has not yet begun at this SF
    val mh = maxOccupancy(
      LlmPipeline.minhashBanded(LlmPipeline.minhashCorpus(spark, vdir)),
      "band_id", "band_key")
    assert(mh <= LlmPipeline.MaxBucketDocs,
      s"minhash bucket of $mh docs reaches the cap at $at — " +
        "the capped op starts truncating (still oracle-equal; see minhashPairsFor)")
    // B56's stored side: the quarter-corpus history band index — THE
    // bucket set the MaxBucketDocs rank cap truncates on the probe path
    val hist = maxOccupancy(
      LlmPipeline.minhashBanded(LlmPipeline.minhashHistoryDocs(spark, vdir)),
      "band_id", "band_key")
    assert(hist <= LlmPipeline.MaxBucketDocs,
      s"B56 history-index bucket of $hist docs exceeds the cap at $at")
    // simhash: oracle CAPPED since r14 — the 6 × 2^16 combo key space
    // is fixed, so occupancy is linear in corpus once saturated
    // (BucketOccupancy: max 55 of 64 at 100× sf0.1); the assert pins
    // that truncation has not yet begun at this SF
    val sh = maxOccupancy(TrainingData.simhashKeyed(spark, vdir), "key")
    assert(sh <= LlmPipeline.MaxBucketDocs,
      s"simhash bucket of $sh docs reaches the cap at $at — " +
        "the capped op starts truncating (still oracle-equal; see dedupSimhash)")
    // embedding: oracle CAPPED since r14 (fixed 2^NumPlanes key ⇒
    // occupancy linear in corpus — BucketOccupancy measured 911 > 512
    // at 10× sf0.1), so a breach here is a recall boundary, not an
    // engine divergence; the assert pins that truncation has not yet
    // begun at this SF
    val eb = maxOccupancy(TrainingData.embeddingBucketed(spark, vdir), "bk")
    assert(eb <= TrainingData.MaxBucketVecs,
      s"embedding bucket of $eb vectors reaches the cap at $at — " +
        "the capped op starts truncating (still oracle-equal; see dedupEmbedding)")
  }

  test("verification SF: every real bucket is under its cap — the caps drop NOTHING there") {
    // All four capped structures carry the cap in their oracle SQL
    // (declared semantics since r15 — minhash corpus bands were the
    // last to convert), so a breach can no longer desync the engines;
    // these asserts pin that the caps TRUNCATE NOTHING at the gate SF,
    // i.e. the graded results are also what an uncapped definition
    // would produce there.
    assertUnderCaps("/root/testdata/sf0.01", "verification SF")
  }

  test("10× drop: occupancy margin holds at sf0.1 (VERDICT r13 task 2)") {
    // Bucket occupancy grows with corpus size; the equivalence premise
    // must hold beyond the SF the correctness gate runs at. sf0.1 is
    // the REAL 10×-of-verify drop (same generator, 10× rows); the
    // synthesized 100×-equivalent margin table is produced by
    // `Test/runMain graft.tools.BucketOccupancy` and recorded in
    // PLANS.md (r14).
    assertUnderCaps("/root/testdata/sf0.1", "the 10x drop (sf0.1)")
  }
}
