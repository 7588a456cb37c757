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

  /** Word n-gram MULTISET ("a b c"; duplicates kept, order
    * preserved) — the repetition signals need occurrence counts, not
    * set membership. Empty array when the document has fewer than n
    * tokens (Spark's `sequence` would otherwise count DOWN for a
    * negative span).
    *
    * The token array is LET-BOUND through a single-element
    * `transform(array(tokens), tk => …)`: lambda variables are
    * evaluated once per row, whereas inlining `tokens(text)` directly
    * would re-run the regex split inside every `element_at` of the
    * shingle lambda — O(n_tokens) splits per row instead of one
    * (measured 6× slower end-to-end on d04).
    */
  def wordShingleMultiset(text: Column, n: Int): Column =
    element_at(
      transform(array(tokens(text)), tk =>
        when(size(tk) >= n,
          transform(
            sequence(lit(0), size(tk) - n),
            i => concat_ws(" ",
              (0 until n).map(j => element_at(tk, i + j + 1)): _*)))
          .otherwise(array().cast("array<string>"))),
      1)

  /** Distinct word n-gram shingles — the set-semantics view used by
    * the Jaccard/MinHash dedup family.
    */
  def wordShingles(text: Column, n: Int): Column =
    array_distinct(wordShingleMultiset(text, n))
}
