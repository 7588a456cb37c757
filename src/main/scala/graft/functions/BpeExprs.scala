package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE merge-application kernel for t14.
  *
  * The declarative form is 10 sequential `regexp_replace` passes over
  * a double-space-encoded char string — ~3× the document's bytes
  * through the regex engine per merge, the whole t14 scan cost
  * (1.2 s at sf0.1). The kernel applies the same merge chain as one
  * symbol-array walk per document: greedy leftmost fuse per merge in
  * rank order, identical semantics (a fused symbol can't participate
  * again in its own pass — the regex scan resumes after a
  * replacement, the walk only reads ahead of its write cursor), so
  * the DuckDB oracle replaying the regexp chain is unchanged — a
  * parity spec pins kernel ≡ regexp chain on real and hostile text.
  *
  * Character granularity is the Unicode codepoint, exactly what
  * `split(norm, "")` produces (Spark 4.1 splits an astral char into
  * ONE element, not two surrogate halves) — the kernel pairs
  * high/low surrogates into a single seed symbol so astral text
  * (emoji etc.) counts one symbol per character in both forms.
  */
object BpeExprs {

  /** Count of post-merge symbols that are not the U+001F word
    * boundary, over an already-normalized string (lower/trim,
    * whitespace collapsed to U+001F).
    */
  def bpeTokenCount(norm: Column, merges: Seq[(String, String)]): Column =
    Shim.column(BpeTokenCount(Shim.expression(norm), merges))
}

case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_token_count"

  @transient private lazy val lefts: Array[String] =
    merges.map(_._1).toArray
  @transient private lazy val rights: Array[String] =
    merges.map(_._2).toArray

  override protected def nullSafeEval(input: Any): Any =
    BpeTokenCount.compute(input.asInstanceOf[UTF8String], lefts, rights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      // JVM array classes stringify as "[Ljava.lang.String;" — pass
      // the Java SOURCE type explicitly or codegen emits an invalid
      // field declaration and silently falls back to interpretation
      val lRef = ctx.addReferenceObj("bpeLefts", lefts,
        "java.lang.String[]")
      val rRef = ctx.addReferenceObj("bpeRights", rights,
        "java.lang.String[]")
      val kernel = BpeTokenCount.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $kernel.compute($c, $lRef, $rRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

object BpeTokenCount {
  private final val Boundary = "\u001f"

  def compute(norm: UTF8String, lefts: Array[String],
      rights: Array[String]): Long = {
    val s = norm.toString
    if (s.isEmpty) return 0L
    // Seed one symbol per CODEPOINT (surrogate pair = one symbol),
    // matching split(norm, "") which yields one element per codepoint
    val syms = new Array[String](s.length)
    var n = 0
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val w = Character.charCount(cp)
      syms(n) = s.substring(i, i + w)
      n += 1
      i += w
    }
    var m = 0
    while (m < lefts.length) {
      val l = lefts(m); val r = rights(m)
      var w = 0; var j = 0
      while (j < n) {
        // w <= j always (w advances once per step, j by 1 or 2), so
        // the in-place compaction never overwrites an unread symbol
        if (j + 1 < n && syms(j) == l && syms(j + 1) == r) {
          syms(w) = l + r; j += 2
        } else { syms(w) = syms(j); j += 1 }
        w += 1
      }
      n = w
      m += 1
    }
    var c = 0L; var k = 0
    while (k < n) { if (syms(k) != Boundary) c += 1; k += 1 }
    c
  }
}
