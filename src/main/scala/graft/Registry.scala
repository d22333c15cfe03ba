package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Central registry of every operator exposed through the driver
  * contract (SparkEntry). Each section object contributes its own
  * OpQuery seq; keys follow SURVEY.md §2 (`op_*`).
  */
object Registry {
  val all: Seq[OpQuery] =
    operators.Relational.queries

  lazy val byName: Map[String, OpQuery] = {
    val m = all.map(q => q.name -> q).toMap
    require(m.size == all.size, "duplicate query names in Registry")
    m
  }

  /** Flagship: revenue by region/year across the full join tree —
    * dims broadcast, single fact shuffle, partial aggs map-side. */
  def flagship(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), year(col("o_orderdate")).as("o_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
        .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "o_year")
}
