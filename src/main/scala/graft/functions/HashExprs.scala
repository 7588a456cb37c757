package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native Catalyst expressions for the probabilistic-dedup hash
  * kernels (d02 MinHash, d03 SimHash).
  *
  * Both replace a nested higher-order-function formulation
  * (`transform(sequence(0, 63), i => … over every token …)`) that
  * evaluated ~64 interpreted expression nodes per array element —
  * HOFs never enter whole-stage codegen, and the nested shape
  * re-hashed each string once per bit/permutation. Here each string
  * is hashed ONCE (`XxHash64Function`, the same kernel behind
  * `functions.xxhash64`) and the 64-wide inner loop is plain JIT'd
  * arithmetic, preserving the previous output bit-for-bit:
  * MinHashSigs.compute reproduces `xxhash64(s, i)`'s seed chaining
  * (hash(i, seed = hash(s, 42))); SimHash64 reproduces votes over
  * `xxhash64(t)` bits. doGenCode emits a single static call into the
  * compiled kernel, so the projection stays inside codegen with no
  * per-element virtual dispatch.
  */
object HashExprs {

  /** Column API: 64-bit MinHash signature array (`numHashes`
    * entries) of an `array<string>` shingle set.
    */
  def minhashSigs(shingles: Column, numHashes: Int): Column =
    Shim.column(MinHashSigs(Shim.expression(shingles), numHashes))

  /** MinHash signatures under the PORTABLE contract: entries are
    * (a_i·(x mod M)+b_i) mod M over md5_60 digests — the form the
    * DuckDB oracle replays (see PortableHash). Input must be md5_60
    * digests (array<long>) or raw shingle strings.
    */
  def minhashSigsPortable(shingles: Column, numHashes: Int): Column =
    Shim.column(MinHashSigs(Shim.expression(shingles), numHashes,
      portable = true))

  /** Column API: 64-bit SimHash of an `array<string>` token stream. */
  def simhash64(tokens: Column): Column =
    Shim.column(SimHash64(Shim.expression(tokens)))

  /** SimHash under the PORTABLE contract: per-token bits come from
    * md5 nibbles (bit j = bit (j mod 4) of hex char (j div 4)) so the
    * DuckDB oracle can regenerate every bit (see PortableHash.md5Bit).
    */
  def simhash64Portable(tokens: Column): Column =
    Shim.column(SimHash64(Shim.expression(tokens), portable = true))

  private[functions] def checkArrayOfString(
      name: String, dt: DataType): TypeCheckResult = dt match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name requires array<string>, got ${other.sql}")
  }
}

/** sig[i] = min over shingles s of hash(i, seed = hash(s, 42)) for
  * i in [0, numHashes) — `numHashes` seeded-permutation approximations
  * in one pass. Null shingle elements are skipped; an all-null/empty
  * array yields Long.MaxValue entries (callers filter empty sets).
  *
  * Accepts either `array<string>` shingles (each hashed here) or
  * `array<long>` PRE-HASHED digests from the ShingleHashes kernel —
  * the digest is the same seed-42 xxhash64 either way, so signatures
  * are bit-identical across the two input forms (spec-pinned).
  */
case class MinHashSigs(child: Expression, numHashes: Int,
    portable: Boolean = false)
  extends UnaryExpression {

  require(numHashes > 0, "numHashes must be positive")

  private def fromDigests: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) | ArrayType(LongType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string> or array<long>, got ${other.sql}")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sigs"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSigs.compute(input.asInstanceOf[ArrayData], numHashes,
      fromDigests, portable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val kernel = MinHashSigs.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $kernel.compute($c, $numHashes, $fromDigests, $portable);"
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

object MinHashSigs {
  // permutation constants for the portable mode, derived once per JVM
  // from the same md5 strings the DuckDB oracle regenerates them from
  @transient private lazy val permCache =
    scala.collection.concurrent.TrieMap.empty[Int, (Array[Long], Array[Long])]
  private def perms(k: Int): (Array[Long], Array[Long]) =
    permCache.getOrElseUpdate(k, (
      Array.tabulate(k)(PortableHash.permA),
      Array.tabulate(k)(PortableHash.permB)))

  def compute(shingles: ArrayData, k: Int, fromDigests: Boolean,
      portable: Boolean): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val (pa, pb) = if (portable) perms(k) else (null, null)
    val n = shingles.numElements()
    var idx = 0
    while (idx < n) {
      if (!shingles.isNullAt(idx)) {
        if (portable) {
          val x =
            (if (fromDigests) shingles.getLong(idx)
             else {
               val b = shingles.getUTF8String(idx).getBytes
               PortableHash.md5_60(b, 0, b.length)
             }) % PortableHash.M
          var i = 0
          while (i < k) {
            val h = (pa(i) * x + pb(i)) % PortableHash.M
            if (h < mins(i)) mins(i) = h
            i += 1
          }
        } else {
          val hs =
            if (fromDigests) shingles.getLong(idx)
            else XxHash64Function.hash(
              shingles.getUTF8String(idx), StringType, 42L)
          var i = 0
          while (i < k) {
            val h = XxHash64Function.hash(i, IntegerType, hs)
            if (h < mins(i)) mins(i) = h
            i += 1
          }
        }
      }
      idx += 1
    }
    new GenericArrayData(mins)
  }
}

/** 64-bit SimHash: bit j of the result is set when the sum over
  * tokens t of sign(bit j of hash(t, 42)) is positive. Null tokens
  * are skipped; an empty array yields 0L.
  */
case class SimHash64(child: Expression, portable: Boolean = false)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    HashExprs.checkArrayOfString(prettyName, child.dataType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData], portable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val kernel = SimHash64.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $kernel.compute($c, $portable);"
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  def compute(tokens: ArrayData, portable: Boolean): Long = {
    val votes = new Array[Int](64)
    val n = tokens.numElements()
    var idx = 0
    while (idx < n) {
      if (!tokens.isNullAt(idx)) {
        if (portable) {
          val b = tokens.getUTF8String(idx).getBytes
          val d = PortableHash.md5Bytes(b, 0, b.length)
          var j = 0
          while (j < 64) {
            if (PortableHash.md5Bit(d, j) == 1) votes(j) += 1
            else votes(j) -= 1
            j += 1
          }
        } else {
          val h = XxHash64Function.hash(
            tokens.getUTF8String(idx), StringType, 42L)
          var j = 0
          while (j < 64) {
            if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
            j += 1
          }
        }
      }
      idx += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}
