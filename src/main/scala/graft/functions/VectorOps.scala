package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dense-vector math over `array<double>` columns.
  *
  * The dot-product kernel is a native Catalyst `BinaryExpression`: the
  * obvious `aggregate(zip_with(a, b, _*_), 0.0, _+_)` formulation
  * allocates an intermediate array and walks it with interpreted
  * lambda nodes per element (higher-order functions never enter
  * codegen) — ~10× slower on the 64-float embeddings. The kernel is a
  * JIT'd fused multiply-accumulate loop in the SAME left-to-right
  * IEEE-double order, so results are bit-identical to the HOF
  * formulation AND to DuckDB's `list_inner_product` over `DOUBLE[]` —
  * the d05/s01 oracles rely on that for threshold comparisons.
  */
object VectorOps {

  /** Cast an `array<float>` embedding to `array<double>` once, up
    * front, so every product/sum below runs in double.
    */
  def asDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    Shim.column(DotProduct(Shim.expression(a), Shim.expression(b)))

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine from a precomputed dot and the two norms; the norms are
    * multiplied first (single division) so both engines evaluate the
    * same expression tree.
    */
  def cosineFrom(dotAb: Column, normA: Column, normB: Column): Column =
    dotAb / (normA * normB)
}

/** Left-fold dot product of two `array<double>` columns. Null when
  * either input is null, when lengths differ, or when any touched
  * element is null — mirroring `aggregate(zip_with(a, b, _*_),
  * 0.0, _+_)` (zip_with null-pads the shorter side, poisoning the
  * fold).
  */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double>, got ${l.sql}, ${r.sql}")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vector_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProduct.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val kernel = DotProduct.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val boxed = ctx.freshName("dotRes")
      s"""
         |Object $boxed = $kernel.compute($a, $b);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((java.lang.Double) $boxed).doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  /** Boxed so codegen/eval share one null contract. */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0d
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}
