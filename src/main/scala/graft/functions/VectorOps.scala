package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

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
    * same expression tree. The divisor is nullif'd: a zero vector
    * (failed/padding embedding — common in real corpora) has no
    * defined cosine, and Spark 4's default ANSI mode would otherwise
    * turn the /0 into a job-killing exception; as null it simply
    * fails every `cosine >= tau` threshold downstream.
    */
  def cosineFrom(dotAb: Column, normA: Column, normB: Column): Column =
    dotAb / nullif(normA * normB, lit(0.0d))

  /** `nBits`-bit signed-random-projection signature (s03). `seed`
    * selects the hash table — pass the LSH table index.
    */
  def hyperplaneSig(v: Column, seed: Column, nBits: Int): Column =
    Shim.column(HyperplaneSig(
      Shim.expression(v), Shim.expression(seed.cast("long")), nBits))

  /** Product-quantization asymmetric-distance lookup (s04): sums, per
    * subspace m, the lookup-table slot `m·ks + codes[m]` — the
    * classic ADC inner loop, M additions per corpus row instead of a
    * dim-length multiply-accumulate.
    */
  def pqAdc(codes: Column, lut: Column, ks: Int): Column =
    Shim.column(PqAdc(Shim.expression(codes), Shim.expression(lut), ks))
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

/** Signed-random-projection (hyperplane) LSH signature of an
  * `array<double>` vector: bit b of the result is set when
  * v · h(seed, b) > 0, where hyperplane component h(seed, b)[j] is
  * `xxhash64((b<<32)|j, seed)` scaled to [−1, 1) — deterministic
  * pseudo-random hyperplanes materialized from hashes, so no
  * hyperplane table is stored, broadcast, or collected. Two vectors
  * agree on a bit with probability 1 − θ/π (θ = their angle), the
  * standard SRP-LSH collision bound. Null elements contribute 0.
  */
case class HyperplaneSig(vec: Expression, seed: Expression, nBits: Int)
  extends BinaryExpression {

  // nBits=0 is the DEGENERATE single-bucket signature (sig ≡ 0):
  // every vector co-buckets, so an LSH built on it is lossless — the
  // s03 exact-anchor dial (round 17), same role as nprobe=#clusters
  // for IVF or rerankDepth=∞ for PQ.
  require(nBits >= 0 && nBits <= 64, "0 <= nBits <= 64")

  override def left: Expression = vec
  override def right: Expression = seed
  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, seed.dataType) match {
      case (ArrayType(DoubleType, _), LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<double>, bigint), got ${l.sql}, ${r.sql}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  override protected def nullSafeEval(v: Any, s: Any): Any =
    HyperplaneSig.compute(
      v.asInstanceOf[ArrayData], s.asInstanceOf[Long], nBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, s) => {
      val kernel = HyperplaneSig.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $kernel.compute($v, $s, $nBits);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HyperplaneSig =
    copy(vec = newLeft, seed = newRight)
}

/** Asymmetric-distance computation for product quantization (s04):
  * given a corpus row's PQ codes (`array<bigint>`, one codeword id
  * per subspace) and a query's positional lookup table
  * (`array<double>`, slot `m·ks + j` = dot(query subvector m,
  * codeword j of subspace m)), returns Σ_m lut[m·ks + codes[m]] —
  * the approximate query·vector dot product. Null when either input
  * is null, any code is null, or a code indexes outside the table
  * (a malformed index artifact must fail loudly as null, not fake a
  * score).
  */
case class PqAdc(codes: Expression, lut: Expression, ks: Int)
  extends BinaryExpression {

  require(ks > 0, "ks must be positive")

  override def left: Expression = codes
  override def right: Expression = lut
  override def checkInputDataTypes(): TypeCheckResult =
    (codes.dataType, lut.dataType) match {
      case (ArrayType(LongType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<double>), " +
          s"got ${l.sql}, ${r.sql}")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc"

  override protected def nullSafeEval(c: Any, l: Any): Any =
    PqAdc.compute(c.asInstanceOf[ArrayData], l.asInstanceOf[ArrayData], ks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, l) => {
      val kernel = PqAdc.getClass.getName.stripSuffix("$") + "$.MODULE$"
      val boxed = ctx.freshName("adcRes")
      s"""
         |Object $boxed = $kernel.compute($c, $l, $ks);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ((java.lang.Double) $boxed).doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(codes = newLeft, lut = newRight)
}

object PqAdc {
  /** Boxed so codegen/eval share one null contract. */
  def compute(codes: ArrayData, lut: ArrayData, ks: Int): java.lang.Double = {
    val m = codes.numElements()
    val n = lut.numElements()
    var acc = 0.0d
    var i = 0
    while (i < m) {
      if (codes.isNullAt(i)) return null
      // The code must index its OWN subspace's [0, ks) LUT slice: a
      // malformed code >= ks would land inside a NEIGHBORING
      // subspace's slots and return a plausible-but-wrong score if
      // only the whole-LUT bound were checked. Internal codebooks
      // can't produce one, but the SQL-registered pq_adc accepts
      // arbitrary input — malformed artifacts must fail loudly (null).
      val c = codes.getLong(i)
      if (c < 0L || c >= ks.toLong) return null
      val idx = i * ks + c.toInt
      if (idx >= n || lut.isNullAt(idx)) return null
      acc += lut.getDouble(idx)
      i += 1
    }
    acc
  }
}

object HyperplaneSig {
  def compute(v: ArrayData, seed: Long, nBits: Int): Long = {
    val dim = v.numElements()
    var sig = 0L
    var b = 0
    while (b < nBits) {
      var s = 0.0d
      var j = 0
      while (j < dim) {
        if (!v.isNullAt(j)) {
          val h = XxHash64Function.hash(
            (b.toLong << 32) | j.toLong, LongType, seed)
          s += v.getDouble(j) * (h.toDouble / 9.223372036854775807e18)
        }
        j += 1
      }
      if (s > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}
