package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<double>` columns, built from
  * codegen'd collection expressions (`zip_with` + `aggregate`) — no
  * UDFs, so the hot path stays inside whole-stage codegen.
  *
  * Precision contract: the fold accumulates left-to-right in IEEE
  * doubles, which matches DuckDB's `list_inner_product` over
  * `DOUBLE[]` bit-for-bit — the d05/s01 oracles rely on that for
  * threshold comparisons (verified empirically before the thresholds
  * were chosen).
  */
object VectorOps {

  /** Cast an `array<float>` embedding to `array<double>` once, up
    * front, so every product/sum below runs in double.
    */
  def asDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine from a precomputed dot and the two norms; the norms are
    * multiplied first (single division) so both engines evaluate the
    * same expression tree.
    */
  def cosineFrom(dotAb: Column, normA: Column, normB: Column): Column =
    dotAb / (normA * normB)
}
