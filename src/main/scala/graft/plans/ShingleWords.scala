package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: word 3-gram shingling, the shared
  * prep stage of every near-dup operator (MinHash, SimHash, Jaccard).
  *
  * Semantics are exactly the fold it replaces
  * (`TextShingles.withShingles`): words = split on single spaces
  * keeping empties; shingle `i` joins words `i, i+1, i+2` (those that
  * exist) with a space; `max(n-2, 1)` shingles, so 1- and 2-word texts
  * yield their whole text as the one shingle. The fold allocates per
  * element inside `transform`/`concat_ws` lambdas; this builds each
  * shingle's bytes in one pass (splitting on 0x20 is UTF-8-safe — a
  * space byte never occurs in a continuation byte).
  */
case class ShingleWords(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  // ExpectsInputTypes is private[sql] in Spark 4 — spell the guard
  override def checkInputDataTypes(): TypeCheckResult =
    DetectFragments.requireTypes(prettyName, child.dataType == StringType, "(string)")

  override protected def nullSafeEval(input: Any): Any =
    ShingleWords.kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.plans.ShingleWords.kernel($s);")

  override protected def withNewChildInternal(newChild: Expression): ShingleWords =
    copy(child = newChild)
}

object ShingleWords {

  /** Called from generated code. */
  def kernel(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    // word spans, split on ' ' keeping empties (split(" ", -1) semantics)
    val starts = new ArrayBuffer[Int](16)
    val ends = new ArrayBuffer[Int](16)
    var ws = 0
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { starts += ws; ends += i; ws = i + 1 }
      i += 1
    }
    starts += ws; ends += bytes.length
    val n = starts.length
    val m = math.max(n - 2, 1)
    val out = new Array[Any](m)
    var k = 0
    while (k < m) {
      val last = math.min(k + 2, n - 1)
      var len = 0
      var w = k
      while (w <= last) { len += ends(w) - starts(w); w += 1 }
      len += last - k // separators
      val sh = new Array[Byte](len)
      var pos = 0
      w = k
      while (w <= last) {
        if (w > k) { sh(pos) = ' '; pos += 1 }
        val wl = ends(w) - starts(w)
        System.arraycopy(bytes, starts(w), sh, pos, wl)
        pos += wl
        w += 1
      }
      out(k) = UTF8String.fromBytes(sh)
      k += 1
    }
    new GenericArrayData(out)
  }

  /** DataFrame-API entry point. */
  def shingles(text: Column): Column =
    bridge.column(ShingleWords(bridge.expression(text)))
}
