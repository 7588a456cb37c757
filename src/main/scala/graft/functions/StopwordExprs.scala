package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native stopword-hit counter for t01/t02 (the language-ID evidence
  * and stop_ratio features).
  *
  * Replaces the last interpreted HOFs in the text-analysis map stage:
  * `size(filter(toks, t => array_contains(array(words…), t)))`
  * evaluated an interpreted lambda per token per language (5
  * languages × every token, outside whole-stage codegen — ~0.5 s of
  * the t01 scan at sf0.1). Here the word list is a prebuilt
  * UTF8String hash set shipped as a codegen reference object, and
  * doGenCode emits one static call, so the whole t01/t02 projection
  * stays inside WholeStageCodegen and each token costs one hash-set
  * probe. Semantics are IDENTICAL to the HOF form (multiset count:
  * every occurrence counts, null tokens don't), so the DuckDB oracles
  * are unchanged.
  */
object StopwordExprs {

  /** Column API: count of tokens (with multiplicity) contained in
    * `words`, as long.
    */
  def stopwordHits(tokens: Column, words: Seq[String]): Column =
    Shim.column(StopwordHits(Shim.expression(tokens), words))
}

/** Count of array elements equal (byte-wise, the same comparison
  * `array_contains` uses on strings) to any of `words`. Null
  * elements are skipped; an empty array yields 0.
  */
case class StopwordHits(child: Expression, words: Seq[String])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    HashExprs.checkArrayOfString(prettyName, child.dataType)
  override def dataType: DataType = LongType
  override def prettyName: String = "stopword_hits"

  @transient private lazy val set: java.util.HashSet[UTF8String] =
    StopwordHits.buildSet(words)

  override protected def nullSafeEval(input: Any): Any =
    StopwordHits.compute(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val setRef = ctx.addReferenceObj("stopSet", set,
        classOf[java.util.HashSet[_]].getName)
      val kernel = StopwordHits.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $kernel.compute($c, $setRef);"
    })

  override protected def withNewChildInternal(newChild: Expression): StopwordHits =
    copy(child = newChild)
}

object StopwordHits {
  def buildSet(words: Seq[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](math.max(4, words.size * 2))
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  def compute(tokens: ArrayData, set: java.util.HashSet[UTF8String]): Long = {
    var count = 0L
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i) && set.contains(tokens.getUTF8String(i)))
        count += 1
      i += 1
    }
    count
  }
}
