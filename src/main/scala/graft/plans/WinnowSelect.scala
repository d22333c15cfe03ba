package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the whole winnowing selection of
  * `op_fingerprint_winnow` (B65; Schleimer, Wilkerson & Aiken 2003,
  * "Winnowing: local algorithms for document fingerprinting",
  * SIGMOD'03) in ONE pass over the document bytes. Per position `i` in
  * `[0, len-k]` it packs `enc_i = (hash(text[i, i+k)) << shift) +
  * (radix-1-i)` — hash is [[RollingHash]]'s polynomial
  * `acc = (acc*31 + byte) % 1e9+7`, the position term encodes the
  * RIGHTMOST-tie rule (later positions compare smaller) — then emits
  * the DISTINCT per-window minima `min(enc[j, j+w))` in first-
  * occurrence order.
  *
  * Why a custom Expression instead of the nested
  * `transform(sequence)` + `array_min(slice)` folds: higher-order
  * functions are CodegenFallback, so the old formulation ran ~n
  * interpreted `rollingHash` expression evals plus an O(n·w)
  * interpreted min fold per document — measured as the board's
  * second-most-expensive query (2.7 s at sf0.1) with the arithmetic
  * itself worth milliseconds. This kernel is a tight codegen'd byte
  * loop: zero allocation per position, the distinct set is the only
  * heap structure. Values are BIT-IDENTICAL to the fold (same hash,
  * same packing, same min, same dedup), so the DuckDB oracle SQL is
  * unchanged. Byte-wise like [[RollingHash]] (≡ the oracle's
  * char-wise `ord` on the ASCII corpora both engines verify on).
  *
  * Documents shorter than `k + w − 1` BYTES emit an empty array (the
  * paper's domain — no full window); the caller keeps a BYTE-length
  * (`octet_length`) filter for plan-level row pruning and the `radix`
  * overflow guard in the same unit — positions here are BYTE offsets,
  * so for non-ASCII input the public `winnowFingerprints` `pos` column
  * is a byte offset too (documented at the call site).
  *
  * At 100 TB: pure map-side, linear in corpus bytes, and since r18 the
  * selection dedups INSIDE the row (this kernel) so no corpus-sized
  * exchange exists in the op at all.
  */
case class WinnowSelect(child: Expression, k: Int, w: Int, shift: Int)
    extends UnaryExpression {

  private val M = 1000000007L

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_select"

  override def checkInputDataTypes(): TypeCheckResult =
    DetectFragments.requireTypes(prettyName,
      child.dataType == StringType, "(string)")

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val radix = 1L << shift
    val nPos = bytes.length - k + 1
    if (nPos < w) return new GenericArrayData(new Array[Long](0))
    val enc = new Array[Long](nPos)
    var i = 0
    while (i < nPos) {
      var acc = 0L
      var j = i
      val end = i + k
      while (j < end) { acc = (acc * 31 + (bytes(j) & 0xff)) % M; j += 1 }
      enc(i) = (acc << shift) + (radix - 1 - i)
      i += 1
    }
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new java.util.ArrayList[java.lang.Long]()
    var jw = 0
    val lastW = nPos - w
    while (jw <= lastW) {
      var m = enc(jw)
      var t = jw + 1
      val endW = jw + w
      while (t < endW) { if (enc(t) < m) m = enc(t); t += 1 }
      if (seen.add(m)) out.add(m)
      jw += 1
    }
    val res = new Array[Long](out.size())
    var r = 0
    while (r < res.length) { res(r) = out.get(r); r += 1 }
    new GenericArrayData(res)
  }

  // Generated Java uses RAW collections + explicit boxing: Janino
  // supports neither generics nor reliable autoboxing (trapped by
  // CodegenCompileSpec on this kernel's first version).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val bytes = ctx.freshName("bytes")
      val nPos = ctx.freshName("nPos")
      val enc = ctx.freshName("enc")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val seen = ctx.freshName("seen")
      val out = ctx.freshName("out")
      val m = ctx.freshName("m")
      val t = ctx.freshName("t")
      val res = ctx.freshName("res")
      val r = ctx.freshName("r")
      val radix = 1L << shift
      s"""
         |byte[] $bytes = $str.getBytes();
         |int $nPos = $bytes.length - $k + 1;
         |if ($nPos < $w) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new long[0]);
         |} else {
         |  long[] $enc = new long[$nPos];
         |  for (int $i = 0; $i < $nPos; $i++) {
         |    long $acc = 0L;
         |    for (int $j = $i; $j < $i + $k; $j++) {
         |      $acc = ($acc * 31 + ($bytes[$j] & 0xff)) % ${M}L;
         |    }
         |    $enc[$i] = ($acc << $shift) + (${radix}L - 1 - $i);
         |  }
         |  java.util.HashSet $seen = new java.util.HashSet();
         |  java.util.ArrayList $out = new java.util.ArrayList();
         |  for (int $i = 0; $i <= $nPos - $w; $i++) {
         |    long $m = $enc[$i];
         |    for (int $t = $i + 1; $t < $i + $w; $t++) {
         |      if ($enc[$t] < $m) $m = $enc[$t];
         |    }
         |    if ($seen.add(java.lang.Long.valueOf($m))) $out.add(java.lang.Long.valueOf($m));
         |  }
         |  long[] $res = new long[$out.size()];
         |  for (int $r = 0; $r < $res.length; $r++) $res[$r] = ((java.lang.Long) $out.get($r)).longValue();
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($res);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
    copy(child = newChild)
}

object WinnowSelect {
  /** DataFrame-API entry point: distinct packed winnow selections. */
  def winnowSelect(text: Column, k: Int, w: Int, shift: Int = 20): Column =
    bridge.column(WinnowSelect(bridge.expression(text), k, w, shift))
}
