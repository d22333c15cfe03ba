package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Streaming

final case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

final case class Doc(doc_id: Long, text: String)

/** Batch ≡ streaming parity for B22–B24 (SURVEY.md §2): the SAME plan
  * builders run over a MemoryStream with watermarks and over a batch
  * DataFrame of the same rows, and must agree. Plus a genuine
  * late-data test: a row older than the advanced watermark is dropped.
  */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  private val base = Seq(
    Ev(1, t("2024-01-01 10:05:00"), 1, "click", 1.0, "{}"),
    Ev(2, t("2024-01-01 10:20:00"), 1, "click", 2.0, "{}"),
    Ev(3, t("2024-01-01 10:55:00"), 1, "view", 3.0, "{}"),   // 35min gap: new session
    Ev(4, t("2024-01-01 11:10:00"), 2, "click", 4.0, "{}"),
    Ev(5, t("2024-01-01 11:24:59"), 2, "view", 5.0, "{}"),   // <30min: same session
    Ev(6, t("2024-01-01 11:55:00"), 2, "view", 6.0, "{}"),   // 30min+1s gap: new session
    Ev(8, t("2024-01-01 12:25:00"), 2, "view", 6.5, "{}"),   // exactly 30min: merged (boundary-inclusive)
    Ev(7, t("2024-01-01 12:40:00"), 3, "click", 7.0, "{}"))

  private def runStream(events: Seq[Ev], plan: DataFrame => DataFrame,
      mode: String): DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val name = s"sink_${System.nanoTime()}"
    val q = plan(mem.toDF()).writeStream
      .format("memory").queryName(name).outputMode(mode).start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name)
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("B22 tumbling: streaming (complete mode) matches batch plan") {
    val batch = Streaming.tumblingPlan(base.toDF(), streaming = false)
    val stream = runStream(base, df => Streaming.tumblingPlan(df, streaming = true), "complete")
    assert(sortedRows(stream) === sortedRows(batch))
    // and the windows are the expected hours
    assert(batch.select("wstart").distinct().as[String].collect().sorted ===
      Array("2024-01-01 10:00:00", "2024-01-01 11:00:00", "2024-01-01 12:00:00"))
  }

  test("B23 session: streaming (complete mode) matches batch; 30-min gap splits") {
    val batch = Streaming.sessionPlan(base.toDF(), streaming = false)
    val stream = runStream(base, df => Streaming.sessionPlan(df, streaming = true), "complete")
    assert(sortedRows(stream) === sortedRows(batch))
    val u1 = batch.filter(col("user_id") === 1).select("sess_start").as[String].collect().sorted
    assert(u1 === Array("2024-01-01 10:05:00", "2024-01-01 10:55:00"))
    val u2 = batch.filter(col("user_id") === 2)
      .select("sess_start", "n_events").as[(String, Long)].collect().sortBy(_._1)
    assert(u2 === Array(("2024-01-01 11:10:00", 2L), ("2024-01-01 11:55:00", 2L)),
      "a >30-min gap starts a new session; an exactly-30-min gap merges")
  }

  test("B90s domain gate: stream == batch across micro-batches; first-come, not hash-sample") {
    implicit val sqlCtx = spark.sqlContext
    val cap = 3
    // two domains: 'hot' floods 8 arrivals, 'cold' sends 2
    val arrivals = (1L to 8L).map(i => operators.DocArrival(i * 10, "hot")) ++
      Seq(operators.DocArrival(5L, "cold"), operators.DocArrival(15L, "cold"))
    val mem = MemoryStream[operators.DocArrival]
    val name = s"sink_${System.nanoTime()}"
    val q = Streaming.domainGatePlan(mem.toDF(), streaming = true, cap).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      // split mid-hot-domain: the admitted count must CARRY ACROSS the
      // batch boundary (admits 10,20,30 in batch 1 leave zero slots,
      // so batch 2's arrivals are all rejects)
      val (b1, b2) = arrivals.sortBy(_.doc_id).splitAt(5)
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val stream = spark.table(name)
    val batch = Streaming.domainGatePlan(arrivals.toDF(), streaming = false, cap)
    assert(sortedRows(stream) === sortedRows(batch))
    val admittedHot = batch.filter(col("source") === "hot" && col("admitted"))
      .select("doc_id").as[Long].collect().sorted
    assert(admittedHot === Array(10L, 20L, 30L),
      "the stream gate admits FIRST-COME (the id prefix)")
    // contrast with the batch op_domain_cap policy: the offline
    // re-balance keeps the (md5(id), id) hash sample, which on this
    // domain is a DIFFERENT set — the two ops' documented difference
    val hashKept = api.Graft.capDomains(
      arrivals.toDF(), cap = cap).filter(col("source") === "hot")
      .select("doc_id").as[Long].collect().sorted
    assert(!hashKept.sameElements(admittedHot),
      "offline hash sample must differ from the stream gate's prefix")
    // rejects are emitted too (the back-pressure signal), with seqs
    val rejects = batch.filter(col("source") === "hot" && !col("admitted"))
    assert(rejects.count() == 5 &&
      rejects.agg(min("arr_seq")).head().getInt(0) == cap + 1)
  }

  test("B-bonus custom state: flatMapGroupsWithState matches batch across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val name = s"sink_${System.nanoTime()}"
    val q = Streaming.runningStatePlan(mem.toDF(), streaming = true).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      // two micro-batches split mid-stream: seq/sum must CARRY ACROSS
      // (the per-key state), not restart at the batch boundary. The
      // split is time-ordered — the op's documented ordering contract
      // (cross-batch arrival order; see runningStatePlan scaladoc)
      val (b1, b2) = base.sortBy(_.ts.getTime).splitAt(4)
      mem.addData(b1: _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val stream = spark.table(name)
    val batch = Streaming.runningStatePlan(base.toDF(), streaming = false)
    assert(sortedRows(stream) === sortedRows(batch))
    // user 2's running sum accumulates across the batch split
    val u2 = batch.filter(col("user_id") === 2)
      .orderBy("seq").select("run_sum").as[Double].collect()
    assert(u2 === Array(4.0, 9.0, 15.0, 21.5))
  }

  test("B22b sliding: streaming (complete mode) matches batch; 4 windows per event") {
    val batch = Streaming.slidingPlan(base.toDF(), streaming = false)
    val stream = runStream(base, df => Streaming.slidingPlan(df, streaming = true), "complete")
    assert(sortedRows(stream) === sortedRows(batch))
    // every event lands in exactly 4 overlapping 2h/30min windows
    val total = batch.agg(sum("n_events")).head().getLong(0)
    assert(total === base.size * 4L)
  }

  test("B22b sliding append mode: closed windows emit once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val name = s"sink_${System.nanoTime()}"
    val q = Streaming.slidingPlan(mem.toDF(), streaming = true).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      mem.addData(base: _*)
      q.processAllAvailable()
      // append emits nothing until windows CLOSE; push the watermark
      // (max 12:40 + far jump - 1h delay) past every base window's end
      mem.addData(Ev(100, t("2024-01-02 20:00:00"), 9, "view", 0.1, "{}"))
      q.processAllAvailable()
    } finally q.stop()
    val emitted = spark.table(name)
    // the closed windows match the batch plan over the base events
    val batch = Streaming.slidingPlan(base.toDF(), streaming = false)
    assert(sortedRows(emitted) === sortedRows(batch),
      "append-mode emissions after watermark advance must equal the batch windows")
  }

  test("B24c interval join: a click arriving after state eviction does not match") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val name = s"sink_${System.nanoTime()}"
    val q = Streaming.intervalJoinPlan(mem.toDF(), mem.toDF(), streaming = true)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      mem.addData(Ev(1, t("2024-01-01 10:00:00"), 1, "view", 0.0, "{}"))
      q.processAllAvailable()
      // push both watermarks far past the view's join window (1h delay
      // + 2h interval); the GLOBAL watermark is the min over both
      // sides' nodes, so BOTH the view and click branches need a
      // far-future row (different users — they must not match each
      // other). The buffered view becomes unmatchable and is evicted.
      mem.addData(
        Ev(2, t("2024-01-02 10:00:00"), 2, "view", 0.0, "{}"),
        Ev(99, t("2024-01-02 10:00:00"), 3, "click", 0.0, "{}"))
      q.processAllAvailable()
      // a matching click, but its event time is now far behind the
      // watermark: late input is dropped, no pair may appear
      mem.addData(Ev(3, t("2024-01-01 10:30:00"), 1, "click", 5.0, "{}"))
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.table(name).isEmpty,
      "evicted state must not produce join output from late arrivals")
  }

  test("B24c interval join: stream-stream self-join matches the batch join") {
    val events = Seq(
      Ev(1, t("2024-01-01 10:00:00"), 1, "view", 0.0, "{}"),
      Ev(2, t("2024-01-01 10:30:00"), 1, "click", 1.5, "{}"), // within 2h of view 1
      Ev(3, t("2024-01-01 13:00:00"), 1, "click", 2.0, "{}"), // beyond 2h: excluded
      Ev(4, t("2024-01-01 10:45:00"), 2, "click", 3.0, "{}"), // matches view 5
      Ev(5, t("2024-01-01 10:10:00"), 2, "view", 4.0, "{}"),
      Ev(6, t("2024-01-01 09:59:00"), 1, "click", 9.0, "{}")) // BEFORE the view: excluded
    val batch = Streaming.intervalJoinPlan(events.toDF(), events.toDF(), streaming = false)
    val stream = runStream(events,
      df => Streaming.intervalJoinPlan(df, df, streaming = true), "append")
    assert(sortedRows(stream) === sortedRows(batch))
    val pairs = batch.select("view_id", "click_id").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L), (5L, 4L)))
  }

  test("B24 dedup: duplicates dropped; late row beyond watermark dropped") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val name = s"sink_${System.nanoTime()}"
    val q = Streaming.dedupLatePlan(mem.toDF(), streaming = true).writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      mem.addData(base: _*)
      q.processAllAvailable()
      // duplicate of id 1 (same id, later ts) and a brand-new row whose
      // event time is far older than watermark (12:40 - 1h = 11:40)
      mem.addData(
        Ev(1, t("2024-01-01 12:41:00"), 1, "click", 99.0, "{}"),
        Ev(99, t("2024-01-01 09:00:00"), 9, "view", 9.0, "{}"))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.table(name).select("event_id").as[Long].collect().sorted
    assert(ids === Array(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L), "dup id 1 deduped; late id 99 dropped")
    // batch equivalent keeps the earliest arrival per id
    val doubled = (base :+ Ev(1, t("2024-01-01 12:41:00"), 1, "click", 99.0, "{}")).toDF()
    val kept = Streaming.dedupLatePlan(doubled, streaming = false)
      .filter(col("event_id") === 1).select("value").as[Double].collect()
    assert(kept === Array(1.0))
  }

  test("B54 stream-static join: streamed docs anti-join the static index, stream ≡ batch") {
    implicit val sqlCtx = spark.sqlContext
    // static history: docs A and B (normalized digests)
    val history = Seq(Doc(0L, "alpha beta gamma"), Doc(4L, "delta epsilon"))
      .toDF("doc_id", "text")
      .select(md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))).as("key"),
        (col("doc_id") * 2).as("hist_id"))
    val arrivals = Seq(
      Doc(101L, "alpha   beta gamma"),   // whitespace variant of A -> known, rejected
      Doc(102L, "totally novel one"),    // admitted
      Doc(103L, "DELTA epsilon"),        // case variant of B -> known, rejected
      Doc(104L, "another novel doc"))    // admitted
    val mem = MemoryStream[Doc]
    val name = s"sink_${System.nanoTime()}"
    val q = Streaming.staticJoinPlan(mem.toDF(), history)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      mem.addData(arrivals(0), arrivals(1))   // micro-batch 1
      q.processAllAvailable()
      mem.addData(arrivals(2), arrivals(3))   // micro-batch 2
      q.processAllAvailable()
    } finally q.stop()
    val admitted = spark.table(name).select("doc_id").as[Long].collect().sorted
    assert(admitted === Array(102L, 104L), "only novel docs may be admitted")
    // unified API: the same builder over a batch DataFrame agrees
    val batch = Streaming.staticJoinPlan(arrivals.toDF(), history)
      .select("doc_id").as[Long].collect().sorted
    assert(batch === admitted)
  }

  test("B56s streaming minhash-band probe: stream ≡ batch against the static band index") {
    implicit val sqlCtx = spark.sqlContext
    val history = Seq(
      Doc(0L, "the quick brown fox jumps over the lazy dog tonight"),
      Doc(4L, "pack my box with five dozen liquor jugs again today"))
      .toDF("doc_id", "text")
      .select((col("doc_id") * 2).as("doc_id"), col("text"))
    val histIdx = graft.operators.LlmPipeline.minhashHistoryIndex(history)
    val arrivals = Seq(
      // exact re-post of history doc 0: ALL 8 minhashes equal -> all 4
      // bands must collide (deterministic, unlike a near-post whose
      // band survival is a fixed-but-unknown function of the text)
      Doc(101L, "the quick brown fox jumps over the lazy dog tonight"),
      Doc(102L, "completely disjoint vocabulary sentence number one here now"),
      // near-post of history doc 4 (one appended token): whatever
      // bands it shares, stream and batch must agree exactly
      Doc(103L, "pack my box with five dozen liquor jugs again today extraneous"),
      Doc(104L, "utterly different wording sharing zero trigrams with anything"))
    val mem = MemoryStream[Doc]
    val name = s"sink_${System.nanoTime()}"
    val q = Streaming.minhashProbePlan(mem.toDF(), histIdx)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      mem.addData(arrivals(0), arrivals(1))   // micro-batch 1
      q.processAllAvailable()
      mem.addData(arrivals(2), arrivals(3))   // micro-batch 2
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table(name)
      .select("batch_id", "band_id", "hist_id")
      .as[(Long, Int, Long)].collect().sorted.toSeq
    // the exact re-post collides in every band, only against its original
    assert(streamed.filter(_._1 == 101L).map(_._2).sorted == Seq(0, 1, 2, 3))
    assert(streamed.filter(_._1 == 101L).forall(_._3 == 0L))
    // disjoint-vocabulary docs share no shingles, hence no bands
    assert(streamed.forall(r => r._1 == 101L || r._1 == 103L))
    // unified API: the same builder over a batch DataFrame agrees
    val batch = Streaming.minhashProbePlan(arrivals.toDF(), histIdx)
      .as[(Long, Int, Long)].collect().sorted.toSeq
    assert(batch == streamed)
  }

  test("B81s streaming CDC chunk gate: stream ≡ batch, re-synced blocks known") {
    implicit val sqlCtx = spark.sqlContext
    // long texts so docs have interior content-defined cuts to re-sync on
    val body = (0 until 120).map(i => s"stable corpus sentence $i flows on").mkString(" ")
    val other = (0 until 120).map(i => s"different history record $i stands").mkString(" ")
    val histKeys = Streaming.cdcHistoryKeys(
      Seq(Doc(0L, body), Doc(4L, other)).toDF("doc_id", "text"))
    val arrivals = Seq(
      // shifted re-post of history doc 0: every chunk after the first
      // content-defined re-sync cut must probe known = true
      Doc(101L, s"injected preamble sentence $body"),
      Doc(102L, (0 until 120).map(i => s"novel unseen phrase $i goes by").mkString(" ")))
    val mem = MemoryStream[Doc]
    val name = s"sink_${System.nanoTime()}"
    // APPEND mode without a watermark: the chunk explode is stateless
    // map-side and the history probe is a stream-static join — the
    // query would be rejected if either smuggled in streaming state
    val q = Streaming.chunkCdcGatePlan(mem.toDF(), histKeys)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      mem.addData(arrivals(0))                // micro-batch 1
      q.processAllAvailable()
      mem.addData(arrivals(1))                // micro-batch 2
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table(name)
      .select("doc_id", "chunk_id", "start", "chunk_len", "chunk_md5", "known")
      .as[(Long, Int, Int, Int, String, Boolean)].collect().sorted.toSeq
    val re = streamed.filter(_._1 == 101L)
    assert(re.size >= 3, "re-post must chunk into several blocks")
    // the splice window can add extra cuts near the head, so several
    // HEAD chunks may be novel — but once the cut stream re-syncs,
    // every later chunk is byte-identical to history: all unknown
    // chunks must precede every known chunk, and known must dominate
    // guard before min: an empty known set (a chunking regression)
    // would throw UnsupportedOperationException here and obscure the
    // actual failure (r19 ADVICE)
    assert(re.exists(_._6), "re-post produced NO known chunks — chunking regression")
    val firstKnown = re.filter(_._6).map(_._3).min
    assert(re.filter(!_._6).forall(_._3 < firstKnown),
      "unknown chunks must all precede the re-sync point")
    assert(re.count(_._6) * 2 > re.size, "known blocks must dominate the re-post")
    assert(streamed.filter(_._1 == 102L).forall(!_._6),
      "novel text must not probe known")
    // unified API: the same builder over a batch DataFrame agrees
    val batch = Streaming.chunkCdcGatePlan(arrivals.toDF(), histKeys)
      .as[(Long, Int, Int, Int, String, Boolean)].collect().sorted.toSeq
    assert(batch == streamed)
  }

  test("B82s streaming ingest rewrite: foreachBatch stream ≡ batch, re-posts shrink") {
    implicit val sqlCtx = spark.sqlContext
    // the ingest form of block dedup runs under foreachBatch: the
    // per-doc reassembly aggregates rows co-generated from one input
    // row, and a production ingest must also commit novel keys back
    // to the index per batch — micro-batch = batch semantics is the
    // declared (and standard) shape, so the parity bar is foreachBatch
    val body = (0 until 120).map(i => s"stable corpus sentence $i flows on").mkString(" ")
    val histKeys = Streaming.cdcHistoryKeys(
      Seq(Doc(0L, body)).toDF("doc_id", "text")).cache()
    val novelBody = (0 until 120).map(i => s"novel unseen phrase $i goes by").mkString(" ")
    val arrivals = Seq(
      Doc(101L, s"injected preamble sentence $body"), // shifted re-post
      Doc(102L, novelBody))                           // genuinely new
    val mem = MemoryStream[Doc]
    val acc = new java.util.concurrent.ConcurrentLinkedQueue[
      (Long, Int, Int, Int, String, Boolean)]()
    val q = mem.toDF().writeStream
      .foreachBatch { (bdf: org.apache.spark.sql.DataFrame, _: Long) =>
        Streaming.ingestBlocksPlan(bdf, histKeys)
          .as[(Long, Int, Int, Int, String, Boolean)]
          .collect().foreach(acc.add)
      }
      .start()
    try {
      mem.addData(arrivals(0))
      q.processAllAvailable()
      mem.addData(arrivals(1))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = acc.toArray(Array.empty[(Long, Int, Int, Int, String, Boolean)])
      .toSeq.sorted
    // the shifted re-post shrinks: most chunks known, the surviving
    // text is (at most) the preamble splice region — strictly shorter
    val re = streamed.find(_._1 == 101L).get
    assert(re._3 > 0, "re-post must probe known blocks")
    assert(re._3 * 2 > re._2, "known blocks must dominate the re-post")
    assert(re._4 < body.length, "surviving text must be shorter than the body")
    assert(re._5.length == re._4, "text_clean length must equal kept_len")
    // the novel doc passes through whole
    val nv = streamed.find(_._1 == 102L).get
    assert(nv._3 == 0 && nv._4 == novelBody.length && nv._6,
      "novel doc must keep every chunk")
    // stream ≡ batch: the same builder over a batch frame agrees
    val batch = Streaming.ingestBlocksPlan(arrivals.toDF(), histKeys)
      .as[(Long, Int, Int, Int, String, Boolean)].collect().toSeq.sorted
    assert(batch == streamed)
  }

  test("B76s streaming bloom probe: stateless append mode, stream ≡ batch, leaks flag") {
    implicit val sqlCtx = spark.sqlContext
    val evalDocs = Seq(
      Doc(0L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    val evalGrams = graft.functions.TextShingles
      .withShingles(evalDocs, col("text"))
      .select(explode(col("shingles")).as("sh")).distinct()
    val mask = graft.operators.Curation.bloomMaskOf(evalGrams)
    val arrivals = Seq(
      Doc(1L, "the quick brown fox jumps over the lazy dog tonight"), // full leak
      Doc(2L, "completely disjoint vocabulary sentence number one here now"),
      Doc(3L, "pack my box with five dozen liquor jugs again today"))
    val mem = MemoryStream[Doc]
    val name = s"sink_${System.nanoTime()}"
    // APPEND mode without a watermark: only a fully stateless plan can
    // run this way — the query would be rejected if the probe smuggled
    // in an aggregation or join state
    val q = graft.operators.Curation.bloomProbePlan(mem.toDF(), mask)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      mem.addData(arrivals(0))                  // micro-batch 1
      q.processAllAvailable()
      mem.addData(arrivals(1), arrivals(2))     // micro-batch 2
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table(name).collect().map(_.toString).sorted.toSeq
    val batch = graft.operators.Curation.bloomProbePlan(arrivals.toDF(), mask)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch)
    val byId = spark.table(name).collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(byId(1L) && !byId(2L) && !byId(3L),
      "the leaked doc must flag; disjoint docs must pass")
  }

  test("B77s streaming DSIR gate: stateless append mode, stream ≡ batch, short docs out of scope") {
    implicit val sqlCtx = spark.sqlContext
    // an arbitrary caller-trained model: 128 λ values + threshold 0
    val lam = Array.tabulate(graft.operators.Curation.DsirBuckets)(i => (i % 7 - 3) * 0.01)
    val arrivals = Seq(
      Doc(1L, "the quick brown fox jumps"),
      Doc(2L, "single"),                    // < 2 tokens: out of scope
      Doc(3L, "pack my box with five dozen jugs"))
    val mem = MemoryStream[Doc]
    val name = s"sink_${System.nanoTime()}"
    val q = graft.operators.Curation.dsirStreamPlan(mem.toDF(), lam, 0L)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      mem.addData(arrivals(0))
      q.processAllAvailable()
      mem.addData(arrivals(1), arrivals(2))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table(name).collect().map(_.toString).sorted.toSeq
    val batch = graft.operators.Curation.dsirStreamPlan(arrivals.toDF(), lam, 0L)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch)
    assert(!spark.table(name).collect().exists(_.getLong(0) == 2L),
      "a sub-2-token doc has no features and must not emit")
  }

  test("B72s streaming CMS sketch: stream ≡ batch cells across micro-batches; state ≤ 256") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Ev]
    val name = s"sink_${System.nanoTime()}"
    val q = Streaming.cmsSketchPlan(mem.toDF()).writeStream
      .format("memory").queryName(name).outputMode("complete").start()
    try {
      mem.addData(base.take(4): _*)   // micro-batch 1
      q.processAllAvailable()
      // mid-stream the sketch must equal the batch sketch of the prefix
      assert(sortedRows(spark.table(name)) ===
        sortedRows(Streaming.cmsSketchPlan(base.take(4).toDF())))
      mem.addData(base.drop(4): _*)   // micro-batch 2
      q.processAllAvailable()
    } finally q.stop()
    val fin = spark.table(name)
    assert(sortedRows(fin) === sortedRows(Streaming.cmsSketchPlan(base.toDF())))
    // the bounded-state contract the op exists for
    assert(fin.count() <= 256, "sketch state exceeded d x w cells")
  }
}
