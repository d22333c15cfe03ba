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
        raw.withColumn("ts", timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")
}
