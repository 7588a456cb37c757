package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text-normalization / shingling column builders.
  *
  * Everything here is a pure `Column` expression (codegen'd by
  * Catalyst, no UDFs), shared by the dedup (d01–d04) and text-analysis
  * (t01–t03) operators. Semantics mirror the per-record cleanup the
  * reference applies before its QC/trim steps
  * (/root/reference/tools.py:101-180), generalized to documents.
  */
object TextOps {

  /** Whitespace-collapsed, trimmed, lower-cased text — the dedup
    * normalization key. d01 hashes this, never shuffles the raw text.
    */
  def normText(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Lower-cased whitespace tokens. */
  def tokens(text: Column): Column =
    split(lower(trim(text)), "\\s+")

  /** Distinct word n-gram shingles ("a b c") of the normalized token
    * stream. Empty array when the document has fewer than n tokens
    * (Spark's `sequence` would otherwise count DOWN for a negative
    * span).
    */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    val grams = transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))
    when(size(toks) >= n, array_distinct(grams))
      .otherwise(array().cast("array<string>"))
  }
}
