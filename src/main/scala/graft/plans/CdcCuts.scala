package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: content-defined chunk CUT offsets for
  * `op_chunk_cdc` (B81; the fingerprint-boundary rule of Manber 1994,
  * "Finding similar files in a large file system", USENIX — the
  * ancestor of Rabin/FastCDC chunking). For every k-byte window
  * starting at 0-based byte `i` (so `i ∈ [0, len-k]`), the window's
  * [[RollingHash]] polynomial `(acc·31 + byte) % 1e9+7` is taken mod
  * `divisor`; a hit (`== rem`) cuts AFTER the window — byte boundary
  * `i + k`, end-exclusive. Output: the ascending int array of cut
  * offsets in CHARS — each byte boundary is reported as the count of
  * UTF-8 lead bytes before it — because the consumer
  * (`TrainingData.chunkCdcWith`) slices with the char-based
  * `substring` and closes the bounds array with char-based
  * `length(text)`; emitting bytes there silently corrupted non-ASCII
  * chunk boundaries/md5 keys and could break the tiling invariant
  * (r18 ADVICE). A cut falling inside a multi-byte codepoint attaches
  * the straddling char to the LEFT chunk (its lead byte precedes the
  * boundary), and several byte cuts inside one codepoint collapse to
  * one char offset, so the output stays strictly increasing. On ASCII
  * text chars ≡ bytes and the output is bit-identical to the pre-fix
  * kernel (expected chunk size ≈ `divisor` bytes).
  *
  * Why a kernel: the per-position windowed hash is the same
  * interpreted-HOF trap [[WinnowSelect]] closed — a
  * `transform(sequence)` fold runs CodegenFallback per position. The
  * HASH stays byte-wise like RollingHash (≡ char-wise `ord` on the
  * ASCII corpora both engines verify on) — content-defined cuts only
  * need a deterministic content hash, whatever the unit. Generated
  * Java keeps to the Janino subset (no generics, explicit boxing
  * avoided by a two-pass count-then-fill over a boolean mask).
  */
case class CdcCuts(child: Expression, k: Int, divisor: Int, rem: Int)
    extends UnaryExpression {

  private val M = 1000000007L

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_cdc_cuts"

  override def checkInputDataTypes(): TypeCheckResult =
    DetectFragments.requireTypes(prettyName,
      child.dataType == StringType, "(string)")

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val nPos = bytes.length - k + 1
    if (nPos <= 0) return new GenericArrayData(new Array[Int](0))
    val hit = new Array[Boolean](nPos)
    var nHit = 0
    var i = 0
    while (i < nPos) {
      var acc = 0L
      var j = i
      val end = i + k
      while (j < end) { acc = (acc * 31 + (bytes(j) & 0xff)) % M; j += 1 }
      if (acc % divisor == rem) { hit(i) = true; nHit += 1 }
      i += 1
    }
    // fill pass: walk bytes once, tracking the char count (UTF-8 lead
    // bytes) so each byte boundary i + k is reported in CHARS; cuts
    // collapsing onto one char offset (mid-codepoint) dedup here
    val tmp = new Array[Int](nHit)
    var r = 0
    var chars = 0
    var prev = -1
    var b = 0
    while (b < bytes.length) {
      if ((bytes(b) & 0xc0) != 0x80) chars += 1
      val ii = b + 1 - k
      if (ii >= 0 && ii < nPos && hit(ii) && chars != prev) {
        tmp(r) = chars; r += 1; prev = chars
      }
      b += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(tmp, r))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val bytes = ctx.freshName("bytes")
      val nPos = ctx.freshName("nPos")
      val hit = ctx.freshName("hit")
      val nHit = ctx.freshName("nHit")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val out = ctx.freshName("out")
      val r = ctx.freshName("r")
      val chars = ctx.freshName("chars")
      val prev = ctx.freshName("prev")
      val b = ctx.freshName("b")
      val ii = ctx.freshName("ii")
      s"""
         |byte[] $bytes = $str.getBytes();
         |int $nPos = $bytes.length - $k + 1;
         |if ($nPos <= 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new int[0]);
         |} else {
         |  boolean[] $hit = new boolean[$nPos];
         |  int $nHit = 0;
         |  for (int $i = 0; $i < $nPos; $i++) {
         |    long $acc = 0L;
         |    for (int $j = $i; $j < $i + $k; $j++) {
         |      $acc = ($acc * 31 + ($bytes[$j] & 0xff)) % ${M}L;
         |    }
         |    if ($acc % $divisor == $rem) { $hit[$i] = true; $nHit++; }
         |  }
         |  int[] $out = new int[$nHit];
         |  int $r = 0;
         |  int $chars = 0;
         |  int $prev = -1;
         |  for (int $b = 0; $b < $bytes.length; $b++) {
         |    if (($bytes[$b] & 0xc0) != 0x80) $chars++;
         |    int $ii = $b + 1 - $k;
         |    if ($ii >= 0 && $ii < $nPos && $hit[$ii] && $chars != $prev) {
         |      $out[$r] = $chars; $r++; $prev = $chars;
         |    }
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |    java.util.Arrays.copyOf($out, $r));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CdcCuts =
    copy(child = newChild)
}

object CdcCuts {
  /** DataFrame-API entry point: ascending CHAR cut offsets
    * (end-exclusive; ≡ byte offsets on ASCII text). */
  def cdcCuts(text: Column, k: Int, divisor: Int, rem: Int = 0): Column =
    bridge.column(CdcCuts(bridge.expression(text), k, divisor, rem))
}
