package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}

import graft.functions.{BpeTokenCount, CdcChunks, DeflateSize, DotProduct, HyperplaneSig, MinHashSigs, MisraGries, NfcNormalize, PqAdc, RollingMinHash, ShingleHashes, SimHash64, StopwordHits}

/** SQL surface for the engine's native expressions: registering this
  * class via `spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder.withExtensions(new GraftExtensions)`) makes
  * the kernels callable from plain SQL —
  *
  *   SELECT rolling_min_hash(text, 16),
  *          simhash64(split(lower(text), '\\s+')),
  *          minhash_sigs(shingles, 64),
  *          vector_dot(a, b)
  *
  * — so SQL-only users get the same codegen'd kernels as the Scala
  * API. This is the `SparkSessionExtensions` path of the build rules:
  * extension registration, not a fork of the session internals.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def boolArg(e: Expression, what: String): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a boolean literal, got $other")
  }

  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Long, _) => v
    case Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** SQL-idiomatic coercions the kernels' manual type checks don't
    * perform (they bypass ImplicitCastInputTypes): `array(1.0, 2.0)`
    * types as array<decimal> and a bare `0` seed as INT — cast to
    * what the kernel wants instead of failing analysis. Unconditional
    * (the builder can see unresolved children); SimplifyCasts removes
    * the no-op ones.
    */
  private def asDoubleArray(e: Expression): Expression =
    Cast(e, ArrayType(DoubleType))

  private def asLong(e: Expression): Expression = Cast(e, LongType)

  /** A constant word list: any foldable array-of-string expression
    * (`array('the','a',…)`), evaluated once at registration — the
    * kernel wants the words as a prebuilt hash set, not a per-row
    * child expression.
    */
  private def stringSeqArg(e: Expression, what: String): Seq[String] = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$what must be a literal array of strings, got $e")
    e.eval() match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
      case other => throw new IllegalArgumentException(
        s"$what must be a literal array of strings, got $other")
    }
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("rolling_min_hash"),
      new ExpressionInfo(classOf[RollingMinHash].getName, "rolling_min_hash"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => RollingMinHash(c)
        case Seq(c, w) => RollingMinHash(c, intArg(w, "window"))
        case Seq(c, w, b, m) => RollingMinHash(c, intArg(w, "window"),
          longArg(b, "base"), longArg(m, "mod"))
        case _ => throw new IllegalArgumentException(
          "rolling_min_hash(text[, window[, base, mod]])")
      }))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => NfcNormalize(c)
        case _ => throw new IllegalArgumentException("nfc_normalize(text)")
      }))
    ext.injectFunction((
      FunctionIdentifier("deflate_size"),
      new ExpressionInfo(classOf[DeflateSize].getName, "deflate_size"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => DeflateSize(c)
        case _ => throw new IllegalArgumentException("deflate_size(text)")
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => SimHash64(c)
        case _ => throw new IllegalArgumentException("simhash64(tokens)")
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigs].getName, "minhash_sigs"),
      (args: Seq[Expression]) => args match {
        case Seq(c, k) => MinHashSigs(c, intArg(k, "numHashes"))
        case _ => throw new IllegalArgumentException(
          "minhash_sigs(shingles, numHashes)")
      }))
    ext.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (args: Seq[Expression]) => args match {
        case Seq(c, n) =>
          ShingleHashes(c, intArg(n, "n"), distinct = true)
        case Seq(c, n, d) =>
          ShingleHashes(c, intArg(n, "n"), boolArg(d, "distinct"))
        case _ => throw new IllegalArgumentException(
          "shingle_hashes(text, n[, distinct])")
      }))
    ext.injectFunction((
      FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vector_dot"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => DotProduct(asDoubleArray(a), asDoubleArray(b))
        case _ => throw new IllegalArgumentException("vector_dot(a, b)")
      }))
    ext.injectFunction((
      FunctionIdentifier("hyperplane_sig"),
      new ExpressionInfo(classOf[HyperplaneSig].getName, "hyperplane_sig"),
      (args: Seq[Expression]) => args match {
        case Seq(v, s, n) =>
          HyperplaneSig(asDoubleArray(v), asLong(s), intArg(n, "nBits"))
        case _ => throw new IllegalArgumentException(
          "hyperplane_sig(vec, seed, nBits)")
      }))
    ext.injectFunction((
      FunctionIdentifier("pq_adc"),
      new ExpressionInfo(classOf[PqAdc].getName, "pq_adc"),
      (args: Seq[Expression]) => args match {
        case Seq(codes, lut, ks) =>
          PqAdc(Cast(codes, ArrayType(LongType)), asDoubleArray(lut),
            intArg(ks, "ks"))
        case _ => throw new IllegalArgumentException(
          "pq_adc(codes, lut, ks)")
      }))
    ext.injectFunction((
      FunctionIdentifier("stopword_hits"),
      new ExpressionInfo(classOf[StopwordHits].getName, "stopword_hits"),
      (args: Seq[Expression]) => args match {
        case Seq(toks, words) =>
          StopwordHits(toks, stringSeqArg(words, "words"))
        case _ => throw new IllegalArgumentException(
          "stopword_hits(tokens, array('w1', 'w2', …))")
      }))
    ext.injectFunction((
      FunctionIdentifier("cdc_chunks"),
      new ExpressionInfo(classOf[CdcChunks].getName, "cdc_chunks"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => CdcChunks(c)
        case Seq(c, w) => CdcChunks(c, intArg(w, "window"))
        case Seq(c, w, mb) => CdcChunks(c, intArg(w, "window"),
          maskBits = intArg(mb, "maskBits"))
        case _ => throw new IllegalArgumentException(
          "cdc_chunks(payload[, window[, maskBits]])")
      }))
    ext.injectFunction((
      FunctionIdentifier("misra_gries"),
      new ExpressionInfo(classOf[MisraGries].getName, "misra_gries"),
      (args: Seq[Expression]) => args match {
        case Seq(item, k) =>
          MisraGries(item, intArg(k, "k")).toAggregateExpression()
        case _ => throw new IllegalArgumentException(
          "misra_gries(item, k)")
      }))
    ext.injectFunction((
      FunctionIdentifier("bpe_token_count"),
      new ExpressionInfo(classOf[BpeTokenCount].getName, "bpe_token_count"),
      (args: Seq[Expression]) => args match {
        case Seq(norm, lefts, rights) =>
          val l = stringSeqArg(lefts, "lefts")
          val r = stringSeqArg(rights, "rights")
          if (l.size != r.size) throw new IllegalArgumentException(
            "bpe_token_count: lefts and rights must pair up")
          BpeTokenCount(norm, l.zip(r))
        case _ => throw new IllegalArgumentException(
          "bpe_token_count(norm, array('l1', …), array('r1', …))")
      }))
  }
}
