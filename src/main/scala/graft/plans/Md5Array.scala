package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: per-element md5 hex over a string array
  * — the digest prep of the minhash/simhash signature family (r21).
  *
  * Replaces `transform(shingles, sh -> md5(sh))`: a higher-order
  * `transform` is CodegenFallback, so every shingle paid an
  * INTERPRETED expression eval (lambda dispatch + a fresh
  * commons-codec digest object + hex via String) on the hottest
  * map-side path of every near-dup op. This kernel runs inside
  * whole-stage codegen, reuses ONE thread-local MessageDigest across
  * all elements of all rows of a task, and writes the 32 lowercase hex
  * chars straight into a byte array. Values are bit-identical to
  * Spark's `md5` (same digest, same lowercase hex), so every oracle's
  * `list_transform(sh, x -> md5(x))` is unchanged.
  *
  * At 100 TB this is pure map-side CPU on the corpus scan — the same
  * cost class as [[MinHashSignature]]; no shuffle implications.
  */
case class Md5Array(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_md5_array"

  override def checkInputDataTypes(): TypeCheckResult =
    DetectFragments.requireTypes(prettyName,
      child.dataType match {
        case ArrayType(StringType, _) => true
        case _ => false
      }, "(array<string>)")

  override protected def nullSafeEval(input: Any): Any =
    Md5Array.kernel(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.plans.Md5Array.kernel($arr);")

  override protected def withNewChildInternal(newChild: Expression): Md5Array =
    copy(child = newChild)
}

object Md5Array {

  private val HexChars = "0123456789abcdef".getBytes("US-ASCII")

  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Called from generated code. */
  def kernel(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[AnyRef](n)
    val md = digests.get()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        val hex = new Array[Byte](32)
        var j = 0
        while (j < 16) {
          val v = d(j) & 0xff
          hex(2 * j) = HexChars(v >>> 4)
          hex(2 * j + 1) = HexChars(v & 0xf)
          j += 1
        }
        out(i) = UTF8String.fromBytes(hex)
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** DataFrame-API entry point. */
  def md5Array(hashes: Column): Column =
    bridge.column(Md5Array(bridge.expression(hashes)))
}
