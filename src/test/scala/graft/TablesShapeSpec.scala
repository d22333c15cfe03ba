package graft

import org.scalatest.funsuite.AnyFunSuite

/** Data-drop shape contract. The driver REGENERATES /root/testdata
  * between rounds and may change physical parquet types while keeping
  * logical content: the r12 drop switched events.ts from
  * TIMESTAMP(NANOS) (scans as long under the legacy conf) to
  * TIMESTAMP(MICROS, isAdjustedToUTC=false) (scans as TIMESTAMP_NTZ),
  * which surfaced as five cryptic analysis errors deep inside
  * registry sweeps. This spec pins the dtypes the operators actually
  * consume AT THE ACCESSOR LEVEL (graft.sources.Tables — the only
  * sanctioned way to read the corpus), so the NEXT shape change fails
  * here first, with a message naming the moved column.
  *
  * If this fails after a data drop: decide whether the accessor needs
  * a new adaptive branch (like Tables.events, which normalizes every
  * shipped ts shape to session-zoned TimestampType) or whether the new
  * shape is benign and this contract should simply be updated. */
class TablesShapeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private def shape(df: org.apache.spark.sql.DataFrame): Map[String, String] =
    df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap

  private def check(table: String, got: Map[String, String],
      want: Map[String, String]): Unit =
    for ((col, t) <- want)
      assert(got.get(col).contains(t),
        s"$table.$col: accessor yields ${got.getOrElse(col, "<missing>")}, " +
          s"operators consume $t — data drop changed shape? (see scaladoc)")

  test("accessors yield the dtypes the operators consume") {
    val sp = spark
    check("events", shape(graft.sources.Tables.events(sp, dir)), Map(
      "event_id" -> "bigint", "ts" -> "timestamp", "user_id" -> "bigint",
      "event_type" -> "string", "value" -> "double", "props" -> "string"))
    check("documents", shape(graft.sources.Tables.documents(sp, dir)), Map(
      "doc_id" -> "bigint", "text" -> "string", "lang" -> "string",
      "source" -> "string", "n_chars" -> "bigint"))
    check("embeddings", shape(graft.sources.Tables.embeddings(sp, dir)), Map(
      "vec_id" -> "bigint", "embedding" -> "array<float>", "label" -> "int"))
    check("lineitem", shape(graft.sources.Tables.lineitem(sp, dir)), Map(
      "l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_returnflag" -> "string",
      "l_shipdate" -> "timestamp_ntz"))
    check("orders", shape(graft.sources.Tables.orders(sp, dir)), Map(
      "o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_totalprice" -> "double", "o_orderdate" -> "timestamp_ntz",
      "o_orderstatus" -> "string"))
    check("customer", shape(graft.sources.Tables.customer(sp, dir)), Map(
      "c_custkey" -> "bigint", "c_nationkey" -> "int"))
    check("supplier", shape(graft.sources.Tables.supplier(sp, dir)), Map(
      "s_suppkey" -> "bigint", "s_nationkey" -> "int"))
    check("part", shape(graft.sources.Tables.part(sp, dir)), Map(
      "p_partkey" -> "bigint"))
    check("nation", shape(graft.sources.Tables.nation(sp, dir)), Map(
      "n_nationkey" -> "int", "n_regionkey" -> "int",
      "n_name" -> "string"))
    check("region", shape(graft.sources.Tables.region(sp, dir)), Map(
      "r_regionkey" -> "int", "r_name" -> "string"))
  }
}
