package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-probe kernel (t16): raw-DEFLATE output size of a
  * string's UTF-8 bytes. The compressed/raw ratio is the classic
  * corpus quality signal (Gopher/Dolma-style filters): machine-
  * generated repetition compresses far below natural prose, and
  * near-random payloads (base64 blobs, minified noise) barely
  * compress at all — one number separates both failure modes from
  * real text. Spark ships no compression function, and a Scala UDF
  * would break whole-stage codegen on the corpus scan; native
  * Expression, same discipline as the hash kernels.
  */
object CompressExprs {

  /** Fixed level: the signal is the RATIO, which is stable across
    * levels; pinning one level keeps the number deterministic and
    * comparable across runs.
    */
  val DeflateLevel: Int = 6

  /** Column API: raw-deflate byte count of the UTF-8 encoding. */
  def deflateSize(text: Column): Column =
    Shim.column(DeflateSize(Shim.expression(text)))
}

/** Size in bytes of the raw DEFLATE stream (RFC 1951, no zlib
  * header) of the input's UTF-8 bytes at level 6. Only the SIZE is
  * computed — output lands in a bounded per-thread scratch buffer
  * that is counted and discarded, so the kernel allocates nothing
  * per row (thread-local Deflater reset between rows; Deflater is
  * JNI-backed zlib, so construction per row would dominate).
  */
case class DeflateSize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.sql}")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "deflate_size"

  override protected def nullSafeEval(input: Any): Any =
    DeflateSize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val kernel = DeflateSize.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $kernel.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): DeflateSize =
    copy(child = newChild)
}

object DeflateSize {

  private val deflaters = ThreadLocal.withInitial[Deflater](() =>
    new Deflater(CompressExprs.DeflateLevel, /* nowrap = */ true))
  private val scratch = ThreadLocal.withInitial[Array[Byte]](() =>
    new Array[Byte](8192))

  def compute(s: UTF8String): Int = {
    val bytes = s.getBytes
    val d = deflaters.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = scratch.get()
    var total = 0
    while (!d.finished()) {
      total += d.deflate(buf)
    }
    total
  }
}
