package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native kernel for the shingle-hash map stage shared by the whole
  * n-gram dedup family (d02/d04/d06/d09 and their compositions
  * p03/d07): text → the 64-bit xxhash64 digests of its word n-gram
  * shingles, in ONE codegen'd pass.
  *
  * The HOF formulation — `xxhash64(concat_ws(' ', element_at(tk,
  * i+1), …))` inside a `transform` — materializes every shingle as a
  * UTF8String and walks ~n interpreted expression nodes per shingle;
  * HOFs never enter whole-stage codegen, so this was the hottest
  * interpreted stage left in the engine. The kernel tokenizes once
  * with Spark's OWN string primitives (UTF8String trim/toLowerCase/
  * split — bit-identical to `split(lower(trim(text)), '\\s+')`),
  * assembles each shingle's joined bytes into one reused buffer, and
  * hashes with the same XxHash64 the SQL function uses — every digest
  * equals `xxhash64(concat_ws(' ', shingle_tokens))` exactly
  * (spec-pinned against the HOF path on real + hostile text).
  *
  * `distinct = true` gives set semantics (d04's Jaccard postings,
  * d02's MinHash input); `false` preserves the positional multiset —
  * index IS the token offset (d09's positioned spans).
  *
  * `portable = true` swaps the digest to PortableHash.md5_60 (the
  * DuckDB-replayable 60-bit md5 contract) — d02's basis, because its
  * OUTPUT depends on the hash values; everything that only GROUPS on
  * digests keeps the faster xxhash64 default.
  */
case class ShingleHashes(child: Expression, n: Int, distinct: Boolean,
    portable: Boolean = false)
  extends UnaryExpression {

  require(n > 0, "shingle width must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires string, got ${other.sql}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n, distinct, portable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val kernel = ShingleHashes.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $kernel.compute($c, $n, $distinct, $portable);"
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  private val WS = UTF8String.fromString("\\s+")

  /** Digest of tokens[from..from+n) joined by single spaces — the
    * exact byte stream `concat_ws(' ', …)` builds, hashed with the
    * same seed-42 XxHash64 behind `functions.xxhash64`.
    */
  private def hashWindow(toks: Array[UTF8String], from: Int, n: Int,
      buf: Array[Byte], portable: Boolean): Long = {
    var len = 0
    var i = 0
    while (i < n) {
      if (i > 0) { buf(len) = ' '; len += 1 }
      val b = toks(from + i).getBytes
      System.arraycopy(b, 0, buf, len, b.length)
      len += b.length
      i += 1
    }
    if (portable) PortableHash.md5_60(buf, 0, len)
    else XxHash64Function.hash(
      UTF8String.fromBytes(buf, 0, len), StringType, 42L)
  }

  def compute(text: UTF8String, n: Int, distinct: Boolean,
      portable: Boolean): GenericArrayData = {
    // identical pipeline to split(lower(trim(text)), "\s+"):
    // UTF8String.trim strips 0x20 only (SQL TRIM), toLowerCase is
    // Spark's own case mapping, split is the same regex split the
    // StringSplit expression runs (limit -1).
    val toks = text.trim().toLowerCase().split(WS, -1)
    val count = toks.length - n + 1
    if (count <= 0) return new GenericArrayData(Array.emptyLongArray)
    var maxWindow = 0
    var i = 0
    while (i < toks.length) {
      // token byte lengths are needed to size the join buffer once
      val l = toks(i).numBytes()
      if (l > maxWindow) maxWindow = l
      i += 1
    }
    val buf = new Array[Byte](maxWindow * n + (n - 1))
    if (!distinct) {
      val out = new Array[Long](count)
      var p = 0
      while (p < count) {
        out(p) = hashWindow(toks, p, n, buf, portable)
        p += 1
      }
      new GenericArrayData(out)
    } else {
      val seen = new java.util.HashSet[java.lang.Long](count * 2)
      val out = new Array[Long](count)
      var m = 0
      var p = 0
      while (p < count) {
        val h = hashWindow(toks, p, n, buf, portable)
        if (seen.add(h)) { out(m) = h; m += 1 }
        p += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(out, m))
    }
  }
}

object ShingleExprs {
  /** Column API: distinct shingle digests (set semantics). */
  def shingleHashSet(text: Column, n: Int): Column =
    Shim.column(ShingleHashes(Shim.expression(text), n, distinct = true))

  /** Distinct shingle digests under the PORTABLE md5_60 contract —
    * d02's oracle-replayable basis.
    */
  def shingleHashSetPortable(text: Column, n: Int): Column =
    Shim.column(ShingleHashes(Shim.expression(text), n, distinct = true,
      portable = true))

  /** Column API: positional shingle digests (index = token offset). */
  def shingleHashSeq(text: Column, n: Int): Column =
    Shim.column(ShingleHashes(Shim.expression(text), n, distinct = false))
}
