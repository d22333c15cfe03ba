package graft.tools

/** Cross-engine certification of the hot-bucket caps IN THE TRUNCATING
  * REGIME (r15): every capped structure's oracle carries its cap (B56
  * pattern), but the correctness gate only ever runs where the caps
  * truncate nothing (HotBucketSpec pins that), so the capped-Spark ≡
  * capped-oracle equivalence PAST the boundary had never been executed
  * on both engines. This tool builds the degenerate corpus
  * (HotBucketSpec's construction: N identical docs / identical
  * vectors, so every band bucket, simhash key, and sign bucket holds
  * the whole cluster — far past every cap) and dumps the cap-affected
  * ops' Spark results; tools/cap_boundary_check.py then runs the same
  * oracle SQL in DuckDB over the same corpus and compares
  * string-exact. A mismatch means the declared-cap semantics desync
  * where they actually bite.
  *
  * Since r16 the list also covers the two CODEBOOK ops: the B58 / e2e
  * centroid-selection rule (every `AnnCodebookStride`-th vector,
  * TrainingData.annCodebook) is declared semantics the oracles carry
  * too, and the degenerate corpus is its own extreme regime — every
  * vector identical, so all centroids tie and the whole corpus
  * collapses into the single lowest-c_id cell, exercising the
  * cosine-tie → lower-c_id rule on both engines corpus-wide. The
  * corpus's unique-text tail (DegenerateCorpus.UniqueFrom, r16)
  * exists for op_incremental_e2e's sake: without it every batch doc
  * dies in the dedup stages and the e2e vector stage would certify
  * nothing (0 admitted — the review finding this closes); the tail's
  * docs are admitted and their all-ties nn probe reaches the output.
  *
  * The oracle SQL is dumped HERE, from the compiled SparkEntry of this
  * very run (ADVICE r15: reading it from a prior Verify dump could
  * certify against stale SQL after an oracle edit).
  *
  * Run: `sbt "Test/runMain graft.tools.CapBoundaryCheck"`, then
  * `python3 tools/cap_boundary_check.py`. Result recorded in PLANS.md
  * (r15, r16). */
object CapBoundaryCheck {
  val Dir = "/tmp/capcheck"
  val Out = "/tmp/capcheck_out"
  val Names = Seq("op_dedup_minhash", "op_dedup_cc", "op_dedup_simhash",
    "op_dedup_embedding", "op_dedup_embedding_banded",
    "op_dedup_minhash_incremental",
    "op_ann_incremental", "op_incremental_e2e",
    // r16 ext2: substring dedup (every gram shared by the whole
    // 400-doc cluster), the perplexity filter (one 400-doc tie group
    // swallows BOTH tercile cuts — the tie-inclusive threshold rule at
    // its extreme: middle goes empty, and both engines must agree),
    // and chunking (no boundary semantics, certified for completeness)
    "op_dedup_substring", "op_perplexity_filter", "op_chunk_sliding",
    // r16 ext4: the curation quartet on the degenerate corpus — every
    // identical doc is an exact copy of the held-out cluster members
    // (bloom must flag the whole cluster, exact agreeing); the 400-doc
    // score tie swallows the DSIR quartile cut (tie-inclusive
    // threshold at its extreme — the whole cluster selects or none of
    // it); the cluster's one shared line is corpus-wide boilerplate
    // (every member scrubs to empty); the report's top ranks are a
    // 10-way count tie broken by token text on both engines
    "op_sketch_bloom", "op_dsir_weights", "op_dedup_lines",
    "op_stats_zipf",
    // r16 ext5: the minhash audit consumes bcap DIRECTLY — on the
    // degenerate corpus every bucket truncates at MaxBucketDocs and
    // the audit's pair set IS the capped expansion (C(64,2) per the
    // 400-doc cluster), with n_match = 8 and J = 1 on every
    // identical-text pair; both engines must truncate identically
    "op_minhash_est",
    // r16 ext6: the BPE loop on the degenerate corpus — the 400-doc
    // cluster makes one word set dominate every count, and the
    // unique-text tail contributes tailword characters; argmax ties
    // and the merge fold must resolve identically on both engines
    "op_bpe_train", "op_bpe_segment",
    // r16 ext7: the stateless stream-gate formulation of the bloom
    // membership test — identical verdicts to op_sketch_bloom required
    // even where every doc is a full leak
    "op_stream_bloom",
    // r16 ext8: the stream DSIR gate — the 400-doc tie cluster makes
    // one score dominate; threshold literals and the ordered fold must
    // agree across engines in the all-ties regime
    "op_stream_dsir",
    // r16 ext9: k-center greedy on the degenerate corpus — every vector
    // identical, every distance rounds to 0.0, so after the seed every
    // pick is a pure lowest-id tie-break; both engines must walk the
    // same all-ties chain
    "op_select_kcenter",
    // r16 ext10: PMI on the degenerate corpus — one dominant word set
    // makes every surviving pair near-independent (pmi ~ 0, the
    // negative-zero rule's home turf) while the count floor drops the
    // unique tail; both engines must rank the all-ties table identically
    "op_stats_pmi",
    // r18: the tokenizer→packing composition — the degenerate corpus
    // stresses the train/apply/pack chain where the vocabulary is one
    // dominant word (near-exhaustion regime for the merge loop); both
    // engines must produce identical per-doc unit counts and offsets
    "op_pack_sequences_bpe",
    // r18: Heaps on the degenerate corpus — the vocabulary saturates
    // in bucket 0, so the fit sits exactly on the β = 0 / −0.0
    // boundary (the negative-zero rule's home turf); CDC on identical
    // docs must cut every doc identically on both engines
    "op_stats_heaps", "op_chunk_cdc",
    // r19: block dedup on the degenerate corpus — every chunk key is
    // corpus-wide boilerplate, so the census's one hot key carries the
    // whole corpus (the salted join-back's home turf), every non-owner
    // doc scrubs COMPLETELY in the rewrite (text_clean = '' — the
    // coalesce(string_agg,'')/array_join-empty cross-engine edge), and
    // the flag/kept verdicts sit exactly on the all-duplicated
    // boundary; both engines must agree row-for-row
    "op_dedup_blocks", "op_dedup_blocks_rewrite",
    // r19: keep-best on the degenerate corpus — ONE capped giant
    // cluster where every member's quality logit is IDENTICAL, so the
    // keeper is a pure all-ties (logit, id) tie-break both engines
    // must walk identically; mixture-apply sits exactly on the
    // frac = 0 boundary (single language ⇒ r ≡ 1.0, every coin
    // compares against floor(0·10⁴) = 0 — no draw may fire)
    "op_dedup_keep_best", "op_mixture_apply",
    // r20: fuzzy join on the degenerate corpus — 400 identical keys
    // (plus their identical sub/del plant clusters) flood every
    // deletion-variant bucket far past FuzzyBucketCap, so the capped
    // (md5(id), id) keep rule and the post-cap pair expansion must
    // truncate identically on both engines
    "op_fuzzy_join")

  def main(args: Array[String]): Unit = {
    val spark = graft.SparkTestSession.spark
    spark.sparkContext.setLogLevel("WARN")
    // shared construction with HotBucketSpec (DegenerateCorpus): the
    // tool must certify the SAME regime the spec pins, so the corpus
    // has one owner — identical text/vectors, plus the ops' own
    // planted variants forming a second cluster
    graft.DegenerateCorpus.write(spark, Dir)

    // clear prior dumps: the python side derives its op list from the
    // directories here, so a stale dump from an older op set would be
    // silently (mis)certified or crash the oracle lookup
    val outPath = java.nio.file.Paths.get(Out)
    if (java.nio.file.Files.exists(outPath)) {
      val walk = java.nio.file.Files.walk(outPath)
      try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(p => java.nio.file.Files.delete(p))
      finally walk.close()
    }
    new java.io.File(Out).mkdirs()
    Names.foreach { n =>
      graft.SparkEntry.queries(n)(spark, Dir)
        .coalesce(1).write.mode("overwrite").parquet(s"$Out/$n")
      println(s"[capcheck] dumped $n")
    }
    // the oracle SQL of THIS compiled build, so the python side can
    // never certify against a stale prior Verify dump (ADVICE r15)
    graft.Verify.writeOracleJson(Out,
      graft.SparkEntry.oracleSql.view.filterKeys(Names.contains).toMap)
    println(s"[capcheck] corpus=$Dir results=$Out — now run " +
      "python3 tools/cap_boundary_check.py")
  }
}
