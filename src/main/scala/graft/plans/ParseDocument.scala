package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{Fragments, Normalizer}

/** Native form of the library's `parse_file` per-document pass
  * (`etl_parser.py:1053-1082`): one cascade run producing
  * `struct(fragments, records)` — typed fragment spans plus the
  * normalized-record JSON strings. Replaces the tuple-returning UDF in
  * `graft.api.Graft.parseDocuments`, which re-encoded every fragment
  * array and record list through the reflective tuple encoder per row.
  */
case class ParseDocument(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ParseDocument.schema
  override def prettyName: String = "graft_parse_document"

  override def checkInputDataTypes(): TypeCheckResult =
    DetectFragments.requireTypes(prettyName, child.dataType == StringType, "(string)")

  override protected def nullSafeEval(input: Any): Any =
    ParseDocument.kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.ParseDocument.kernel($s);")

  override protected def withNewChildInternal(newChild: Expression): ParseDocument =
    copy(child = newChild)
}

object ParseDocument {

  val schema: DataType = StructType(Seq(
    StructField("fragments", DetectFragments.schema, nullable = false),
    StructField("records", ArrayType(StringType, containsNull = false),
      nullable = false)))

  /** Called from generated code — must stay public and static-shaped. */
  def kernel(text: UTF8String): InternalRow = {
    val frags = Fragments.detect(text.toString)
    val records = frags.flatMap { f =>
      Normalizer.normalize(f).map(data => UTF8String.fromString(
        s"""{"format": "${f.format_type}", "start": ${f.start_index}, "end": ${f.end_index}, "data": $data}"""))
    }
    InternalRow(DetectFragments.toArrayData(frags),
      new GenericArrayData(records.toArray[Any]))
  }

  /** DataFrame-API entry point. */
  def parse(text: Column): Column =
    bridge.column(ParseDocument(bridge.expression(text)))
}
