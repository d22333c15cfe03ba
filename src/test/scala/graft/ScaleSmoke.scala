package graft

import org.apache.spark.sql.functions._

import graft.operators.{Incremental, LlmPipeline, Mining, Streaming, TrainingData}

/** 10× scale smoke for the near-dup family (VERDICT r2 item 7):
  * synthesize an sf1-equivalent corpus (10 copies of sf0.1 ≈ 50k docs /
  * 100k vectors) and measure op_dedup_minhash / simhash / embedding at
  * both scales, proving the output-linear shuffle story empirically at
  * one order of magnitude up.
  *
  * Copy construction keeps the DUP STRUCTURE linear — each copy must
  * not be a near-duplicate of the base, or candidate pairs would grow
  * quadratically in copies and measure the wrong thing:
  *  - documents: copy k suffixes EVERY word with `_<k>`
  *    (`regexp_replace(text, "\\S+", "$0_<k>")`) — each copy's shingle
  *    set is structurally identical to the base's (so within-copy
  *    similarity relations, incl. the ops' planted `% 5` variants, are
  *    preserved exactly) but disjoint across copies (an inter-word
  *    token insert instead would create one-word shingles like
  *    `ck w ck` shared by unrelated docs — measured 842× pair
  *    inflation);
  *  - embeddings: copy k flips the sign of dim i iff
  *    `(i+1)*(k+2) % 23 < 9` — cosine within a copy is invariant
  *    (s_i² = 1), cross-copy cosines are far from 1, and flip
  *    patterns are distinct while k+2 stays distinct mod 23, i.e.
  *    k ≤ 21 — above that only the text ops run.
  *
  * Run: `Test/runMain graft.ScaleSmoke [copies] [skip,list]` (default
  * 10; the 10× and 100× tables live in PLANS.md). The optional second
  * arg names ops to skip (substring match; `sink` skips the file-sink
  * leg) so a 100× run can exclude the already-certified long poles
  * (pagerank 211 s at 100×, the 500k-file sink) and still finish
  * inside a capped window.
  */
object ScaleSmoke {
  private[graft] val Base = "/root/testdata/sf0.1"

  /** Whether a `Copies`× corpus carries embeddings: the mod-23 flip
    * construction is provably distinct only to 21 copies. SINGLE owner
    * of the threshold — corpus construction and op selection must
    * agree or the smoke schedules embedding ops against a corpus with
    * no embeddings.parquet. */
  private[graft] def corpusHasEmbeddings(Copies: Int): Boolean = Copies <= 21

  /** Listing fingerprint (name:len:mtime per file) of one base table's
    * parquet dir — the corpus-staleness key below. Local-FS java.io is
    * fine here: the base drop and /tmp corpora are always local.
    * KNOWN LIMIT (ADVICE r15): a base-drop restore that preserves
    * metadata byte-for-byte (cp -p / rsync -a / object-store restore)
    * aliases to the same fingerprint even if bytes changed under the
    * same (name, length, mtime) triple. The driver regenerates
    * /root/testdata with plain writes (fresh mtimes), so that restore
    * mode does not occur here; if this tool moves to an environment
    * with metadata-preserving restores, add a content hash of the
    * parquet footers to `one`. */
  private def listingFp(path: String): String = {
    val d = new java.io.File(path)
    def one(f: java.io.File) = s"${f.getName}:${f.length}:${f.lastModified}"
    if (!d.exists()) "absent"
    // the base drop ships single parquet FILES; /tmp corpora are
    // Spark-written DIRECTORIES of part files — fingerprint both shapes
    else if (d.isFile) one(d)
    else d.listFiles().filter(_.isFile).map(one).sorted.mkString(",")
  }

  /** Identity of the base drop the synthesized corpus derives from —
    * only the tables this corpus actually reads: above 21 copies the
    * corpus carries no embeddings, and an embeddings-only base re-drop
    * must not force a rebuild of the expensive text-only corpora. */
  private def baseFp(withEmb: Boolean): String =
    (Seq("documents.parquet", "lineitem.parquet") ++
      (if (withEmb) Seq("embeddings.parquet") else Nil))
      .map(t => s"$t=${listingFp(s"$Base/$t")}").mkString(";")

  /** Build (or reuse) the `Copies`× synthesized corpus at
    * `/tmp/scale<Copies>` — shared with BucketOccupancy so the cap
    * certification measures the SAME corpus the smoke certifies.
    *
    * Reuse is keyed on the BASE DROP'S listing fingerprint, stamped in
    * a marker file inside the corpus dir (ADVICE r14): after the
    * driver regenerates /root/testdata, an existing /tmp corpus built
    * from the previous drop must be rebuilt, or the occupancy
    * certification and the smoke silently measure stale data. The
    * marker is written only if the base listing is unchanged AFTER the
    * build (same no-TOCTOU rule as Tables' probe memo): a re-drop
    * landing mid-build leaves no marker, so the next run rebuilds.
    *
    * Rebuilds take a cross-process `FileLock` on `/tmp/scale<N>.lock`
    * (ADVICE r15): two JVMs started together (e.g. a smoke and
    * BucketOccupancy) must not interleave overwrite writes into the
    * same corpus dir and then both stamp a marker over
    * mixed-generation data. The freshness check re-runs under the
    * lock, so the second process reuses what the first built. */
  private[graft] def ensureCorpus(spark: org.apache.spark.sql.SparkSession, Copies: Int): String = {
    val Dir10 = s"/tmp/scale$Copies"
    val withEmb = corpusHasEmbeddings(Copies)
    val marker = new java.io.File(s"$Dir10/.base_fingerprint")
    def isFresh(fp: String): Boolean =
      new java.io.File(s"$Dir10/documents.parquet").exists() &&
        // read-or-absent, atomically: a concurrent builder deletes the
        // marker under the lock, and an exists()-then-read pair here
        // (outside the lock) would throw NoSuchFileException in that
        // window instead of routing this process to the lock
        (try new String(java.nio.file.Files.readAllBytes(marker.toPath),
          java.nio.charset.StandardCharsets.UTF_8) == fp
        catch { case _: java.io.IOException => false })
    if (!isFresh(baseFp(withEmb))) withCorpusLock(Copies) {
      // re-probe under the lock: if another process just built this
      // corpus, reuse it; re-derive the fingerprint too — the base may
      // have been re-dropped while we waited for the lock
      val fp = baseFp(withEmb)
      if (!isFresh(fp)) {
      // invalidate FIRST: a crash mid-rebuild must leave no marker, or
      // a later base restore to the marker's drop would reuse a
      // mixed-generation corpus as certified evidence
      marker.delete()
      val docs = graft.sources.Tables.documents(spark, Base)
      val n = docs.count()
      (0 until Copies).map { k =>
        if (k == 0) docs
        else docs.select(
          (col("doc_id") + k * 1000000L).as("doc_id"),
          col("lang"), col("source"), col("n_chars"),
          regexp_replace(col("text"), "\\S+", s"$$0_$k").as("text"))
      }.reduce(_ unionByName _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$Dir10/documents.parquet")

      // lineitem: only the graph keys pagerank reads; copy k offsets both
      // keys so the supplier<->part graph is `Copies` disjoint copies of
      // the base graph — nodes AND edges scale linearly, structure intact
      (0 until Copies).map { k =>
        graft.sources.Tables.lineitem(spark, Base)
          .select((col("l_partkey") + k * 1000000L).as("l_partkey"),
            (col("l_suppkey") + k * 1000000L).as("l_suppkey"))
      }.reduce(_ unionByName _)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$Dir10/lineitem.parquet")

      if (withEmb) {
        val emb = graft.sources.Tables.embeddings(spark, Base)
        (0 until Copies).map { k =>
          if (k == 0) emb
          else emb.select(
            (col("vec_id") + k * 1000000L).as("vec_id"),
            transform(col("embedding"),
              (x, i) => when((i + 1) * (k + 2) % 23 < 9, -x).otherwise(x))
              .as("embedding"),
            col("label"))
        }.reduce(_ unionByName _)
          .repartition(32)
          .write.mode("overwrite").parquet(s"$Dir10/embeddings.parquet")
      }
      if (baseFp(withEmb) == fp)
        java.nio.file.Files.write(marker.toPath,
          fp.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      else {
        marker.delete()
        println(s"[scale] base drop changed mid-build — no marker written; " +
          "re-run to rebuild from the settled drop")
      }
      println(s"[scale] built $Dir10: docs=${n * Copies}")
    } }
    Dir10
  }

  /** Cross-process mutual exclusion for a corpus rebuild (ADVICE r15):
    * blocks on an exclusive `FileLock` over `/tmp/scale<N>.lock`. The
    * lock file is separate from the corpus dir (Spark's overwrite
    * deletes the dir) and is left in place — deleting it would race a
    * third process locking the same path. The JVM-wide monitor in
    * front covers SAME-process concurrency: `FileLock` is held
    * per-JVM and a second in-process acquisition would throw
    * OverlappingFileLockException rather than block, so two threads
    * of one JVM must serialize on the monitor before touching the
    * channel (coarse — corpus builds are rare and heavyweight). */
  private val corpusLockMonitor = new Object
  private def withCorpusLock[A](Copies: Int)(body: => A): A =
    corpusLockMonitor.synchronized {
      val ch = java.nio.channels.FileChannel.open(
        java.nio.file.Paths.get(s"/tmp/scale$Copies.lock"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE)
      try { val lock = ch.lock(); try body finally lock.release() }
      finally ch.close()
    }

  def main(args: Array[String]): Unit = {
    // optional arg: copy count (default 10). Above 21 copies the
    // embedding flip patterns are no longer provably distinct (mod-23
    // construction), so only the text ops run — the word-suffix
    // transform is disjoint for ANY copy count.
    val Copies = args.headOption.map(_.toInt).getOrElse(10)
    // second arg: `a,b` skips matching ops; `only:a,b` keeps ONLY
    // matching ops (substring match either way) — the cheap form for
    // re-certifying one rewritten op at scale without the full sweep
    val rawFilter = if (args.length > 1) args(1) else ""
    val onlyMode = rawFilter.startsWith("only:")
    val pats: Seq[String] = (if (onlyMode) rawFilter.drop(5) else rawFilter)
      .split(",").toSeq.filter(_.nonEmpty)
    val skips: Seq[String] = if (onlyMode) Nil else pats
    val withEmb = corpusHasEmbeddings(Copies)
    val spark = SparkTestSession.spark
    spark.sparkContext.setLogLevel("WARN")
    val Dir10 = ensureCorpus(spark, Copies)

    val ops = Seq(
      "op_dedup_minhash" -> (LlmPipeline.dedupMinhash _),
      "op_dedup_simhash" -> (TrainingData.dedupSimhash _)) ++
      (if (withEmb) Seq("op_dedup_embedding" -> (TrainingData.dedupEmbedding _)) else Nil) ++
      // rows here are clustered docs, not pairs; supersteps must stay
      // flat as copies grow (cluster DIAMETER, not corpus size, drives them)
      Seq("op_dedup_cc" -> (LlmPipeline.dedupCc _)) ++
      // iterative mining ops (VERDICT r6 item 6): cost = fixed
      // per-iteration overhead + data-linear join/agg work, so the wall
      // ratio should sit well UNDER Copies at this absolute scale
      Seq("op_graph_pagerank" -> (Mining.graphPagerank _)) ++
      (if (withEmb) Seq("op_kmeans_train" -> (Mining.kmeansTrain _)) else Nil) ++
      // r16 ext2: the corpus-prep trio — chunking is map-side only
      // (wall ~ token volume); substring dedup is ONE gram-keyed
      // shuffle (suffixed-word copies keep grams disjoint across
      // copies, so duplicated spans stay within-copy and the shared
      // set grows linearly); the perplexity filter inherits B46's
      // model-sized aggregates plus a histogram whose cardinality is
      // bounded by the 4-dp score RANGE and must stay ~flat in copies
      Seq("op_chunk_sliding" -> (TrainingData.chunkSliding _),
        "op_dedup_substring" -> (TrainingData.dedupSubstring _),
        "op_perplexity_filter" -> (Mining.perplexityFilter _)) ++
      // r16 ext3: the corpus-statistics quartet — gopher and winnow
      // are pure map-side (wall ~ token/char volume); bpe_pairs'
      // vocab shuffle grows linearly (suffixed-word copies make each
      // copy's vocabulary disjoint) while its pair agg stays
      // alphabet-bounded; sketch_cms' SKETCH is 256 cells at any
      // scale — its growth term is the exact-count grading side (the
      // B51-style contract), vocab-sized like bpe's
      Seq("op_filter_gopher" -> (operators.CorpusStats.filterGopher _),
        "op_fingerprint_winnow" -> (operators.CorpusStats.fingerprintWinnow _),
        "op_bpe_pairs" -> (operators.CorpusStats.bpePairs _),
        "op_sketch_cms" -> (operators.CorpusStats.sketchCms _)) ++
      // r16 ext4: the corpus-curation quartet — bloom's filter is a
      // fixed 64Ki broadcast at any scale (its eval set grows with the
      // corpus here, raising bit load, but the probe work is
      // gram-linear); dsir's model is a fixed 128-bucket aggregate +
      // broadcast λ and the histogram is score-range-bounded like
      // B63's; dedup_lines is ONE line-keyed shuffle + doc rollup
      // (suffixed-word copies keep lines disjoint across copies, so
      // dup sets grow linearly); stats_zipf is vocabulary-sized after
      // one unigram aggregate with a fixed 50-row regression
      Seq("op_sketch_bloom" -> (operators.Curation.sketchBloom _),
        "op_dsir_weights" -> (operators.Curation.dsirWeights _),
        "op_dedup_lines" -> (operators.Curation.dedupLines _),
        "op_stats_zipf" -> (operators.Curation.statsZipf _),
        // r18: Heaps fit — vocab-sized min-doc agg + bucket-frame rest
        "op_stats_heaps" -> (operators.Curation.statsHeaps _),
        // r18: CDC chunking — pure map-side kernel, byte-linear
        "op_chunk_cdc" -> (operators.TrainingData.chunkCdc _),
        // r19: block census over CDC chunks — the chunk pass is the
        // map-side kernel; census + semi-join are chunk_md5-keyed
        // shuffles (suffixed-word copies keep blocks disjoint across
        // copies, so dup sets grow linearly, never corpus²)
        "op_dedup_blocks" -> (operators.TrainingData.dedupBlocks _),
        // r19: the rewrite leg — same chunk pass + key-sized owner
        // census; the salted join-back spreads any hot block key and
        // the rebuild rollup is doc-keyed (per-doc bounded lists)
        "op_dedup_blocks_rewrite" -> (operators.TrainingData.dedupBlocksRewrite _),
        // r19: epoch composition — language-cardinality aggregate +
        // broadcast rates + map-side copies; wall ~ one corpus pass
        "op_mixture_apply" -> (operators.TrainingData.mixtureApply _),
        // r20: the materialized epoch — manifest plan + bounded
        // explode + two keyed rollups; 16 x |langs| output rows at any
        // corpus size
        "op_epoch_export" -> (operators.TrainingData.epochExport _),
        // r20: NFC + whitespace canonicalization — pure map-side, one
        // kernel call per row; wall must track the scan
        "op_text_normalize" -> (operators.TrainingData.textNormalize _),
        // r20: per-domain cap — output is cap x |domains| bounded
        // however large the corpus; WindowGroupLimit keeps map output
        // at cap per key per task
        "op_domain_cap" -> (operators.TrainingData.domainCap _),
        // r19: keep-best — the B17b closure plus a map-side logit and
        // a component-bounded argmax window; growth tracks B17b's
        "op_dedup_keep_best" -> (LlmPipeline.dedupKeepBest _),
        // r19: the streaming CDC gate's batch grade — chunking
        // map-side + ONE key-keyed join against the history index
        "op_stream_chunk_cdc" -> (operators.Streaming.streamChunkCdc _),
        // r20: the rewrite-aware ingest gate — B81s's probe plus a
        // per-doc rollup bounded by one doc's own chunks
        "op_stream_blocks_rewrite" -> (operators.Streaming.streamBlocksRewrite _),
        // PMI: one bigram shuffle, pair-table-sized everything after
        "op_stats_pmi" -> (operators.CorpusStats.statsPmi _),
        // r20b: char entropy — pure map-side kernel, wall ~ char volume
        "op_text_entropy" -> (operators.CorpusStats.textEntropy _),
        // r20b: deletion-neighborhood join — suffixed-word copies keep
        // 24-char keys disjoint across copies, so variant buckets and
        // confirmed pairs grow linearly, never corpus²
        "op_fuzzy_join" -> (Mining.fuzzyJoin _),
        // r20b: per-doc keywords — vocab-keyed tf×df join (vocab grows
        // linearly under suffixing); output fixed at k rows per doc
        "op_tfidf_topk" -> (Mining.tfidfTopk _),
        // r20b: novelty — gram-keyed shuffles, grams disjoint across
        // copies so the owner table grows linearly
        "op_ngram_novelty" -> (operators.Curation.ngramNovelty _),
        // r20b: E-S weighted sample — map-side key + TakeOrdered; the
        // OUTPUT is k rows at any corpus size (the one-pass contract)
        "op_sample_weighted" -> (operators.TrainingData.sampleWeighted _),
        // r20b: Luhn screen — map-side bounded folds, wall ~ volume
        "op_pii_luhn" -> (operators.TrainingData.piiLuhn _),
        // r20b: k-anonymity — one Expand+agg, output ≤ 4 level rows
        "op_k_anonymity" -> (operators.TrainingData.kAnonymity _),
        // r20b: the stream-gate batch grade — one source-keyed window,
        // output linear (every arrival emits a verdict row)
        "op_stream_domain_cap" -> (operators.Streaming.streamDomainCap _)) ++
      // r16 ext5: the minhash audit — candidate pairs are the capped
      // banded buckets (suffixed-word copies keep shingles disjoint
      // across copies, so candidates and the intersection join grow
      // linearly with the planted density, never corpus²)
      Seq("op_minhash_est" -> (LlmPipeline.minhashEst _)) ++
      // r16 ext6: the BPE merge loop — one cached vocabulary aggregate
      // (suffixed-word copies grow the vocab linearly) + three
      // vocab-sized iterations; driver traffic fixed at 3 pairs + 3
      // scalars whatever the corpus
      Seq("op_bpe_train" -> (operators.CorpusStats.bpeTrain _),
        "op_bpe_segment" -> (operators.CorpusStats.bpeSegment _),
        // r18: tokenizer→packing composition — wall should track its
        // slowest stage (the B75 vocab join), the pack prefix sum is
        // (source, chunk)-parallel
        "op_pack_sequences_bpe" -> (operators.CorpusStats.packSequencesBpe _),
        // the stateless mask probe: pure map-side, wall ~ gram volume
        "op_stream_bloom" -> (operators.Curation.streamBloom _),
        // train + stateless score: wall ~ two corpus passes
        "op_stream_dsir" -> (operators.Curation.streamDsir _)) ++
      // k-center greedy: K map-side passes + K bounded argmaxes
      (if (withEmb) Seq("op_select_kcenter" -> (Mining.selectKcenter _)) else Nil) ++
      // digest-keyed shuffle join: batch AND history both scale with the
      // corpus, so wall growth tracks the join's linear work
      Seq("op_dedup_incremental" -> (LlmPipeline.dedupIncremental _)) ++
      // r8 incremental family: index-probe shapes — history index and
      // batch both scale linearly; BAND candidates stay linear in true
      // matches (content-derived keys), never batch x history.
      // op_ann_incremental's codebook is corpus-scaled since r16
      // (every-157th vector, K ~ corpus/157), so cell occupancy — and
      // with it candidates per batch vector — is ~flat across copies
      // and its wall ratio must sit near the copies line like the rest
      // of the family (the r15 fixed-8 stand-in measured 22.9x at 20
      // copies; the re-key is the fix, annIncremental scaladoc)
      Seq("op_index_update" -> (LlmPipeline.indexUpdate _),
        "op_dedup_minhash_incr" -> (LlmPipeline.dedupMinhashIncremental _)) ++
      (if (withEmb) Seq("op_ann_incremental" -> (TrainingData.annIncremental _),
        // r19: the compressed twin — same probe geometry as B58 plus
        // the broadcast PQ encode (4-entry codebook per block), so its
        // wall must track B58's within the encode constant
        "op_ann_pq_incremental" -> (TrainingData.annPqIncremental _),
        // r20: the hierarchical assign twin — same probe geometry as
        // B58 with the N x K assign term replaced by N x (sqrt(K) +
        // S*sqrt(K)), so its wall must track B58's from below as K
        // grows (identical at these gate K values)
        "op_ann_hier" -> (TrainingData.annHier _),
        // r16: the IVF search pair joined the corpus-scaled codebook —
        // their probe side is the fixed 10-query panel, so per-query
        // candidates are flat (~stride) and the wall tracks the ASSIGN
        // pass. NOTE the assign is N×K cosines with K ≈ N/157 —
        // QUADRATIC compute with a 1/157 constant (the documented
        // trade: shuffle/candidates linear, map-side flops quadratic
        // to the broadcast ceiling, hierarchical assign past it —
        // annIncremental scaladoc / AnnHierProbe). At these corpus
        // sizes the constant keeps the ratio under the copies line;
        // crossing it at much larger `copies` would be this term, not
        // a candidate regression
        "op_similarity_ivf" -> (TrainingData.similarityIvf _),
        "op_ann_recall" -> (TrainingData.annRecall _),
        // r20: RRF over the three index rankings — legs are B51's
        // plans, the fusion itself panel-sized (30 rows/query)
        "op_rank_fusion" -> (TrainingData.rankFusion _)) else Nil) ++
      // r10: the per-band streaming probe (same index-probe shape, one
      // row per band collision) and the COMPOSED ingest pipeline —
      // the e2e chains four probes, so its wall ratio should track its
      // slowest stage (the band probe), not their sum
      Seq("op_stream_minhash_probe" -> (Streaming.streamMinhashProbe _),
        // r12: the digest-keyed stream-static triage probe — history
        // index and batch both scale with the corpus (suffixed-word
        // copies keep digests disjoint across copies), so anti-join
        // survivors must scale ~linearly, never batch x history
        "op_stream_static_join" -> (Streaming.streamStaticJoin _)) ++
      (if (withEmb) Seq("op_incremental_e2e" -> (Incremental.incrementalE2e _)) else Nil)

    val kept =
      if (onlyMode) ops.filter { case (name, _) => pats.exists(name.contains) }
      else ops.filterNot { case (name, _) => skips.exists(name.contains) }
    def run(dir: String, label: String): Map[String, (Double, Long)] =
      kept.map { case (name, f) =>
        val t0 = System.nanoTime()
        val rows = f(spark, dir).count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[scale] $label $name%-22s ${secs}%7.2f s  pairs=$rows")
        // several ops cache plan-keyed frames they never unpersist
        // (annRecall's bucketed corpus, e2e's triage frames); at
        // 20-copy scale a pinned corpus would steal execution memory
        // from every LATER op and distort the ratios this smoke
        // exists to measure — each op runs against a clean store
        spark.sharedState.cacheManager.clearCache()
        name -> (secs, rows)
      }.toMap

    run(Base, "warm")     // unmeasured warm-up (codegen + footer caches)
    val at1 = run(Base, s"  1x")
    val at10 = run(Dir10, f"$Copies%3dx")
    kept.foreach { case (name, _) =>
      val (s1, r1) = at1(name)
      val (s10, r10) = at10(name)
      println(f"[scale] RATIO $name%-22s time ${s10 / s1}%5.2fx  pairs ${r10.toDouble / r1}%6.2fx (target ${Copies}x)")
    }

    // r11: the V2 sink's two-phase commit at volume — every doc written
    // as its own file (one rename per file fans in at job commit; the
    // commit messages carry bare NAMES only, so driver memory stays
    // flat in the file count). Run the whole smoke with
    // SPARK_DRIVER_MEM=3g to assert the capped-heap contract: shuffles
    // and caches must spill, never OOM — completion IS the assertion.
    def sinkRun(dir: String, label: String): (Double, Long) = {
      val out = "/tmp/scale_sink"
      val t0 = System.nanoTime()
      graft.api.Graft.writeDocuments(
        graft.sources.Tables.documents(spark, dir)
          .select(concat(col("doc_id").cast("string"), lit(".txt")).as("path"),
            col("text")),
        out, overwrite = true)
      val secs = (System.nanoTime() - t0) / 1e9
      val stream = java.nio.file.Files.list(java.nio.file.Paths.get(out))
      val n = try stream.count() finally stream.close()
      println(f"[scale] $label op_sink_textdir        $secs%7.2f s  files=$n")
      (secs, n)
    }
    val sinkWanted =
      if (onlyMode) pats.exists("op_sink_textdir".contains(_))
      else !skips.exists("op_sink_textdir".contains(_))
    if (sinkWanted) {
      sinkRun(Base, "warm")
      val (k1, n1) = sinkRun(Base, "  1x")
      val (k10, n10) = sinkRun(Dir10, f"$Copies%3dx")
      println(f"[scale] RATIO op_sink_textdir        time ${k10 / k1}%5.2fx  files ${n10.toDouble / n1}%6.2fx (target ${Copies}x)")
      locally { // reclaim the file fan-out (inode pressure, not bytes)
        val walk = java.nio.file.Files.walk(java.nio.file.Paths.get("/tmp/scale_sink"))
        try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => java.nio.file.Files.delete(p))
        finally walk.close()
      }
    }
  }
}
