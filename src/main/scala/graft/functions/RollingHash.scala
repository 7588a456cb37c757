package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling polynomial document fingerprint (t04) as a native Catalyst
  * `Expression` with full codegen — the "winnowing-lite" min-window
  * hash used for document fingerprinting in near-dup corpora.
  *
  * Semantics over the UTF-8 bytes b(0..n-1) of the input string:
  *   hash(i)   = fold of window bytes b(i..i+w-1): acc = (acc*B + b) % M
  *   result    = min over all windows i in [0, n-w]
  *   if n < w  = single fold over all n bytes (degenerate short doc)
  *
  * The rolling update reuses the previous window's hash in O(1)
  * (subtract the leading byte's B^(w-1) term, shift, add the new
  * byte), so the whole column is O(n) per row — vs O(n·w) for naive
  * re-hashing — and lives inside whole-stage codegen: `doGenCode`
  * emits the loop inline in the generated Java, no virtual calls, no
  * boxing. This is the preference-order (b) path of the build rules:
  * a custom scalar Expression where `functions._` has no equivalent.
  *
  * Default M = 1e9+7 keeps every intermediate product
  * (≤ 255·(M−1) ≈ 2.6e11, ≤ 31·(M−1) ≈ 3.1e10) far inside Long range.
  */
case class RollingMinHash(
    child: Expression,
    window: Int = 16,
    base: Long = 31L,
    mod: Long = 1000000007L)
  extends UnaryExpression {

  require(window > 0 && base > 1 && mod > 1 && mod < (1L << 31) && base < mod,
    "window > 0; 1 < base < mod < 2^31 — residues stay below mod, so " +
      "every product is < mod² < 2^62 and fits in Long without wrapping")

  // Manual input-type check: ExpectsInputTypes' Seq[AbstractDataType]
  // signature is private[sql] in Spark 4, unreachable from here.
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string child, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_min_hash"

  override protected def nullSafeEval(input: Any): Any =
    RollingMinHash.compute(
      input.asInstanceOf[UTF8String].getBytes, window, base, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val pw = ctx.freshName("pw")
      val min = ctx.freshName("min")
      val i = ctx.freshName("i")
      val w = window
      s"""
         |final byte[] $bytes = $c.getBytes();
         |final int $n = $bytes.length;
         |long $h = 0L;
         |if ($n < $w) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    $h = (($h * ${base}L) + (long)($bytes[$i] & 0xFF)) % ${mod}L;
         |  }
         |  ${ev.value} = $h;
         |} else {
         |  long $pw = 1L;
         |  for (int $i = 0; $i < $w - 1; $i++) { $pw = ($pw * ${base}L) % ${mod}L; }
         |  for (int $i = 0; $i < $w; $i++) {
         |    $h = (($h * ${base}L) + (long)($bytes[$i] & 0xFF)) % ${mod}L;
         |  }
         |  long $min = $h;
         |  for (int $i = $w; $i < $n; $i++) {
         |    $h = ($h - ((long)($bytes[$i - $w] & 0xFF) * $pw) % ${mod}L + ${mod}L) % ${mod}L;
         |    $h = (($h * ${base}L) + (long)($bytes[$i] & 0xFF)) % ${mod}L;
         |    if ($h < $min) $min = $h;
         |  }
         |  ${ev.value} = $min;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingMinHash =
    copy(child = newChild)
}

object RollingMinHash {

  /** Interpreted-mode twin of the generated loop (used by `eval`; the
    * codegen parity spec compares the two).
    */
  def compute(bytes: Array[Byte], w: Int, base: Long, mod: Long): Long = {
    val n = bytes.length
    var h = 0L
    if (n < w) {
      var i = 0
      while (i < n) { h = (h * base + (bytes(i) & 0xff)) % mod; i += 1 }
      h
    } else {
      var pw = 1L
      var i = 0
      while (i < w - 1) { pw = pw * base % mod; i += 1 }
      i = 0
      while (i < w) { h = (h * base + (bytes(i) & 0xff)) % mod; i += 1 }
      var min = h
      i = w
      while (i < n) {
        h = (h - (bytes(i - w) & 0xff).toLong * pw % mod + mod) % mod
        h = (h * base + (bytes(i) & 0xff)) % mod
        if (h < min) min = h
        i += 1
      }
      min
    }
  }
}

object RollingHash {

  /** Column API for the fingerprint expression. */
  def rollingFingerprint(text: Column, window: Int = 16, base: Long = 31L,
      mod: Long = 1000000007L): Column =
    Shim.column(
      RollingMinHash(Shim.expression(text), window, base, mod))
}
