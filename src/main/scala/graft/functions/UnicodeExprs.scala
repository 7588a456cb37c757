package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization kernel (t11). Spark ships no normalizer, and
  * a Scala UDF would break whole-stage codegen on the corpus scan;
  * this is the same native-Expression discipline as the hash kernels.
  */
object UnicodeExprs {

  /** Column API: Unicode NFC (canonical composition, UAX #15). */
  def nfc(text: Column): Column =
    Shim.column(NfcNormalize(Shim.expression(text)))
}

/** NFC-normalize a string: canonical decomposition followed by
  * canonical composition (UAX #15), via `java.text.Normalizer` — the
  * same standard utf8proc-based engines (DuckDB `nfc_normalize`)
  * implement, so normalized forms agree byte-for-byte across engines
  * (the t11 oracle depends on this). Fast path: `isNormalized` is an
  * O(n) quick-check scan that avoids allocating for the overwhelmingly
  * common already-NFC case.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.sql}")
    }
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val kernel = NfcNormalize.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $kernel.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }
}
