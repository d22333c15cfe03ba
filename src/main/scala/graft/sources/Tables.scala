package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet scans over the harness star schema (TESTDATA.md).
  *
  * The reference's only source is "read the whole file into one string"
  * (`/root/reference/script.py:562-563`, `/root/reference/etl_parser.py:1093-1094`);
  * here that generalizes to columnar Parquet scans with Catalyst
  * predicate pushdown + column pruning. At 100 TB these scans are the
  * dominant cost, so every query projects/filters as early as possible
  * and lets the scan prune (verify via `.explain`: `PushedFilters`,
  * `ReadSchema`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")

  /** The session conf `events` needs; apply at SESSION BUILD (all of
    * Bench/Verify/Smoke/test builders do) — a table accessor must not
    * mutate global session state as a side effect. */
  val eventsConf: (String, String) = "spark.sql.legacy.parquet.nanosAsLong" -> "true"

  /** `events.ts` has shipped as two parquet shapes across data drops,
    * so the accessor adapts on the SCANNED type and always yields the
    * engine's session-zoned microsecond TimestampType:
    *
    *  - TIMESTAMP(NANOS): Spark's reader rejects it outright; with
    *    [[eventsConf]] it scans as LongType nanos, floor-converted here
    *    to micros — integer arithmetic, no double round-trip (nanos
    *    epoch values exceed double's 53-bit mantissa), and FLOOR
    *    division (`div` truncates toward zero, which would be off by
    *    1 µs on pre-epoch negative nanos; `pmod` makes the remainder
    *    non-negative first).
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): scans natively as
    *    TimestampNTZType; cast to TimestampType, which under the
    *    recommended UTC session timezone preserves the wall-clock
    *    values byte-for-byte (and matches what the oracle reads). */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        requireNanosRange(raw, d)
        raw.withColumn("ts", timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw // already the engine type (UTC-adjusted micros)
      case other =>
        // fail FAST (ADVICE r12): a silent pass-through of a new shape
        // would surface as cryptic analysis errors (or worse, wrong
        // epochs) deep inside registry sweeps instead of here
        sys.error(s"events.ts scanned as unexpected type ${other.simpleString} " +
          s"from $d/events.parquet — new data-drop shape; teach Tables.events " +
          "to normalize it (see TablesShapeSpec scaladoc)")
    }
  }

  /** Sanity probe for the LongType branch (ADVICE r12): under
    * [[eventsConf]] only TIMESTAMP(NANOS) scans as long, but a future
    * drop shipping PLAIN int64 micros/millis would also scan as long
    * and the nanos→micros floor would shift every timestamp by three
    * or six orders of magnitude. Any plausible event epoch is
    * ≥ ~1.5e18 ns (2017+) while micros stay ≤ ~4.1e15 through 2100,
    * so an order-of-magnitude check separates the encodings. LIMIT
    * scan of the first [[ProbeRows]] non-null values (one row group,
    * any scale), memoized so only the first accessor call per JVM and
    * DATA DROP pays the job. The memo maps each dir to the listing
    * fingerprint of the parquet files (name, length, mtime) that last
    * passed — ADVICE r13: a long-lived service that receives a
    * re-drop into the SAME path switching nanos→plain-micros must
    * re-probe, not ride a stale per-path pass; the listing is a
    * driver-side metadata op, orders cheaper than the probe job it
    * gates, and latest-wins keeps the memo O(dirs) under periodic
    * re-drops. */
  private val ProbeRows = 100
  // dir → fingerprint of the last drop that PASSED the probe: memory
  // stays O(dirs) under periodic re-drops (a fingerprint-keyed set
  // would accrete one dead entry per drop forever)
  private val nanosProbed = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def eventsFingerprint(raw: DataFrame, d: String): String = {
    val p = new org.apache.hadoop.fs.Path(s"$d/events.parquet")
    val fs = p.getFileSystem(raw.sparkSession.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).filter(_.isFile).map(s =>
      s"${s.getPath.getName}:${s.getLen}:${s.getModificationTime}")
    files.sorted.mkString(",")
  }
  private def requireNanosRange(raw: DataFrame, d: String): Unit = {
    val fp = eventsFingerprint(raw, d)
    // compute, not check-then-act: concurrent first callers for one
    // drop run ONE probe job, and a probe FAILURE records nothing —
    // the next call re-probes instead of silently passing bad data
    nanosProbed.compute(d, (_, prev) => {
      if (prev == fp) fp
      else {
        import org.apache.spark.sql.functions.col
        raw.select(col("ts")).filter(col("ts").isNotNull).head(ProbeRows).foreach { r =>
          val v = r.getLong(0)
          require(math.abs(v) >= 1e16.toLong,
            s"events.ts in $d/events.parquet scans as long but |$v| is too " +
              "small for an epoch in NANOS (plain int64 micros/millis drop?) — " +
              "refusing to floor-divide; fix the Tables.events adaptation")
        }
        // ADVICE r14 (TOCTOU): memoize only if the listing is IDENTICAL
        // before and after the probe job — a re-drop landing mid-probe
        // means the probe read data the pre-probe fingerprint does not
        // describe, so record nothing (keep/clear the previous entry)
        // and let the next call re-probe the settled drop. The steady
        // state pays one extra listStatus per PROBE (not per call);
        // the memoized fast path stays a single listing — driver-side
        // metadata, cheap on local FS, and on an object store still
        // orders cheaper than the probe job it gates.
        if (eventsFingerprint(raw, d) == fp) fp else prev
      }
    })
    ()
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
