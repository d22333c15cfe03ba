package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.DataConverter

/** Native form of the impl-B whole-pipeline convert
  * (`script.py:93-168`: section split → format dispatch → coercion →
  * title-class merge → single-key flatten), emitting the result JSON.
  * Replaces the `udf((s: String) => DataConverter.parseToJson(s))`
  * sites — the String→String UDF tax is small, but going native keeps
  * the ENTIRE query registry free of Scala UDFs (one audit rule, no
  * exceptions) and the call inside whole-stage codegen. */
case class ConvertDocument(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_convert"

  override def checkInputDataTypes(): TypeCheckResult =
    DetectFragments.requireTypes(prettyName, child.dataType == StringType, "(string)")

  override protected def nullSafeEval(input: Any): Any =
    ConvertDocument.kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.ConvertDocument.kernel($s);")

  override protected def withNewChildInternal(newChild: Expression): ConvertDocument =
    copy(child = newChild)
}

object ConvertDocument {

  /** Called from generated code — must stay public and static-shaped. */
  def kernel(text: UTF8String): UTF8String =
    UTF8String.fromString(DataConverter.parseToJson(text.toString))

  /** DataFrame-API entry point. */
  def convert(text: Column): Column =
    bridge.column(ConvertDocument(bridge.expression(text)))
}
