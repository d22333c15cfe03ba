package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

/** The two scale techniques the near-dup caps don't cover: salting a
  * skewed shuffle join and co-locating a join via bucketing. Both are
  * pinned as result-equality + plan-shape evidence (PLANS.md §r3).
  */
class ScaleHardeningSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("saltedJoin: identical results to the plain join; shuffle keyed on (key, salt)") {
    // 50k-row fact where 90% of rows share ONE key — the pathological
    // reducer-hotspot shape — plus a 100-key dim
    val fact = spark.range(50000)
      .select(col("id"),
        when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 100).as("k"),
        (col("id") * 2).as("v"))
    val dim = spark.range(100).select(col("id").as("k"), concat(lit("d"), col("id")).as("name"))

    val plain = fact.join(dim, "k").select("k", "v", "name")
    val salted = Skew.saltedJoin(fact, dim, "k", salts = 8, saltBy = col("id"))
      .select("k", "v", "name")

    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty,
      "salted join changed the result set")

    val p = salted.queryExecution.executedPlan.toString
    assert(p.contains("__salt"), s"salt column absent from the physical plan:\n$p")
  }

  test("saltedJoin: a user column named __salt survives untouched") {
    // the salt used to be hardcoded __salt — a colliding user column was
    // silently overwritten and then dropped from the output
    val fact = spark.range(1000)
      .select(col("id"), (col("id") % 10).as("k"), lit("mine").as("__salt"))
    val dim = spark.range(10).select(col("id").as("k"), concat(lit("d"), col("id")).as("name"))
    val out = Skew.saltedJoin(fact, dim, "k", salts = 4, saltBy = col("id"))
    assert(out.columns.contains("__salt"), "user __salt column dropped")
    assert(out.select("__salt").distinct().collect().map(_.getString(0)).toSeq == Seq("mine"),
      "user __salt column corrupted")
    assert(out.count() === 1000)
  }

  /** Drop the catalog entry AND its warehouse directory: the in-memory
    * catalog dies with the JVM but spark-warehouse/ persists, and a
    * stale location fails the next saveAsTable. */
  private def resetTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val root = if (wh.startsWith("file:")) new java.io.File(new java.net.URI(wh))
               else new java.io.File(wh)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    val loc = new java.io.File(root, name)
    if (loc.exists()) rm(loc)
  }

  test("bucketed tables co-locate: the join plans NO shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    resetTable("li_bucketed")
    resetTable("ord_bucketed")
    graft.sources.Tables.lineitem(spark, dir)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    graft.sources.Tables.orders(spark, dir)
      .select("o_orderkey", "o_orderstatus")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_bucketed")

    // force the shuffle-join path (tiny test tables would broadcast)
    val joined = spark.table("li_bucketed").hint("merge")
      .join(spark.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(sum("l_quantity").as("q"))

    val p = joined.queryExecution.executedPlan.toString
    val exchanges = p.linesIterator.count(_.contains("Exchange hashpartitioning"))
    // ONE exchange for the final groupBy is legitimate; the JOIN itself
    // must read bucket-aligned scans with no exchange on either side
    assert(exchanges <= 1, s"bucketed join still shuffles:\n$p")
    assert(p.contains("SortMergeJoin"), s"expected the merge join path:\n$p")
    assert(joined.collect().nonEmpty)
  }

  test("AQE splits a skewed shuffle-join partition at runtime (skew=true)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor").map(k =>
      k -> util.Try(conf.get(k)).toOption)
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      import spark.implicits._
      val fact = spark.range(200000)
        .select(col("id"), when(col("id") % 20 =!= 0, lit(7L))
          .otherwise(col("id") % 100).as("k"),
          concat(lit("payload_"), col("id")).as("v"))
      val dim = spark.range(100).select(col("id").as("k"), col("id").as("d"))
      val joined = fact.join(dim, "k").groupBy("d").count()
      joined.collect() // AQE decisions happen at runtime
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE did not split the skewed join partition:\n$p")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }
}
