package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StructField, StructType}

/** Content-defined chunking (CDC) over a binary payload — the
  * rsync/LBFS boundary rule as a native Catalyst kernel: a chunk
  * ends at byte i iff the rolling polynomial hash of the trailing
  * `window` bytes satisfies H(i) mod 2^maskBits == 0 (plus the
  * forced final boundary at n−1). Because a boundary depends only on
  * the CONTENT of the trailing window — never on absolute offsets —
  * inserting or deleting bytes shifts at most the chunks around the
  * edit and every other boundary re-synchronizes; fixed-size blocks
  * lose every boundary after the edit. That re-sync property is what
  * makes chunk-level dedup work on binary corpora (m07).
  *
  * This is deliberately the minimal, STATELESS CDC variant: no
  * min/max chunk bounds, so the boundary set is a pure per-position
  * predicate over the byte stream and the DuckDB oracle can replay
  * it declaratively (a min-bound would make chunking a sequential
  * fold — correct, but unverifiable without a recursive CTE).
  * Expected chunk length is 2^maskBits bytes.
  *
  * Output: array<struct<start: long, len: long>> of byte ranges
  * (0-based, covering the payload exactly; empty array for an empty
  * payload). The rolling update is O(1) per byte — one pass per
  * payload — and `doGenCode` emits a single static call into the
  * compiled kernel (the ShingleHashes discipline).
  */
case class CdcChunks(child: Expression,
    window: Int = CdcChunks.DefaultWindow,
    base: Long = CdcChunks.DefaultBase,
    mod: Long = CdcChunks.DefaultMod,
    maskBits: Int = CdcChunks.DefaultMaskBits)
  extends UnaryExpression {

  require(window > 0 && base > 1 && mod > 1 && mod < (1L << 31) &&
    base < mod && maskBits > 0 && maskBits < 31,
    "window > 0; 1 < base < mod < 2^31; 0 < maskBits < 31")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires binary, got ${other.sql}")
    }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("start", LongType, nullable = false),
    StructField("len", LongType, nullable = false))),
    containsNull = false)

  override def prettyName: String = "cdc_chunks"

  override protected def nullSafeEval(input: Any): Any =
    CdcChunks.compute(input.asInstanceOf[Array[Byte]],
      window, base, mod, maskBits)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val kernel = CdcChunks.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $kernel.compute($c, $window, ${base}L, ${mod}L, " +
        s"$maskBits);"
    })

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {

  /** Registered m07 defaults. The oracle SQL in SparkEntry is BUILT
    * from these same values (the p13Sql discipline), so changing a
    * default here re-derives the oracle instead of silently
    * desynchronizing engine and oracle.
    */
  val DefaultWindow: Int = 8
  val DefaultBase: Long = 31L
  val DefaultMod: Long = 1000000007L
  val DefaultMaskBits: Int = 5

  /** Interpreted twin of the boundary scan (also the codegen target —
    * a single static call, no per-byte virtual dispatch).
    */
  def compute(bytes: Array[Byte], w: Int, base: Long, mod: Long,
      maskBits: Int): GenericArrayData = {
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val div = 1L << maskBits
    // B^(w-1) mod M for the rolling subtract
    var pw = 1L
    var i = 0
    while (i < w - 1) { pw = pw * base % mod; i += 1 }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var h = 0L
    var start = 0
    i = 0
    while (i < n) {
      if (i >= w) h = (h - (bytes(i - w) & 0xff).toLong * pw % mod + mod) % mod
      h = (h * base + (bytes(i) & 0xff)) % mod
      // window complete from i == w-1; the last byte always closes
      if ((i >= w - 1 && h % div == 0L) || i == n - 1) {
        out += InternalRow(start.toLong, (i - start + 1).toLong)
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

object CdcExprs {

  /** Column API: CDC byte ranges of a binary payload. */
  def cdcChunks(payload: Column, window: Int = CdcChunks.DefaultWindow,
      base: Long = CdcChunks.DefaultBase,
      mod: Long = CdcChunks.DefaultMod,
      maskBits: Int = CdcChunks.DefaultMaskBits): Column =
    Shim.column(CdcChunks(Shim.expression(payload), window, base, mod,
      maskBits))
}
