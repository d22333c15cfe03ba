package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.HtmlTable

/** Native Catalyst expression wrapping the HTML table parser
  * (`graft.functions.HtmlTable`, port of `script.py:21-76`).
  *
  * Why not a Scala UDF: `udf((s: String) => Seq[Map[String, String]])`
  * routes every row's result through the reflective Catalyst converter
  * — per-row Seq/Map boxing and schema lookups on the hot path of
  * `op_parse_html_table` and the section merge. This expression builds
  * the `ArrayBasedMapData` directly (one allocation per row map) and
  * participates in whole-stage codegen as a single static call. The
  * parser itself is unchanged, so golden/differential tests and oracle
  * rows stay byte-identical.
  */
case class ParseHtmlTable(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ParseHtmlTable.schema
  override def prettyName: String = "graft_parse_html_table"

  override def checkInputDataTypes(): TypeCheckResult =
    DetectFragments.requireTypes(prettyName, child.dataType == StringType, "(string)")

  override protected def nullSafeEval(input: Any): Any =
    ParseHtmlTable.kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.ParseHtmlTable.kernel($s);")

  override protected def withNewChildInternal(newChild: Expression): ParseHtmlTable =
    copy(child = newChild)
}

object ParseHtmlTable {

  /** `array<map<string,string>>` — one map per data row, header → cell. */
  val schema: DataType =
    ArrayType(MapType(StringType, StringType, valueContainsNull = false),
      containsNull = false)

  /** Called from generated code — must stay public and static-shaped. */
  def kernel(html: UTF8String): ArrayData =
    new GenericArrayData(HtmlTable.parse(html.toString).map { row =>
      ArrayBasedMapData(
        row.keysIterator.map(UTF8String.fromString).toArray[Any],
        row.valuesIterator.map(UTF8String.fromString).toArray[Any])
    }.toArray[Any])

  /** DataFrame-API entry point. */
  def parse(html: Column): Column =
    bridge.column(ParseHtmlTable(bridge.expression(html)))
}
