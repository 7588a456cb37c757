package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Multimodal, TextAnalysis}

/** Corpora misbehave: rows with NULL, empty, or whitespace-only text
  * must flow through every document operator without exceptions —
  * either filtered (set operators, binary probes) or null-propagated
  * (per-row projections). The empty/whitespace rows specifically pin
  * the nullif'd divisors: Spark 4's default ANSI mode turns an
  * unguarded ratio over a 0-char/0-token document into a
  * job-killing SparkArithmeticException.
  */
class NullSafetySpec extends AnyFunSuite {
  import TestSpark._

  private def withNulls = {
    import spark.implicits._
    Seq((1L, Option("real document text here with several tokens")),
      (2L, Option.empty[String]),
      (3L, Option("another real document")),
      (4L, Option("")),
      (5L, Option("   \t  ")))
      .toDF("doc_id", "text")
  }

  test("dedup family survives null text") {
    assert(Dedup.dedupExact(withNulls).count() >= 1)
    Dedup.dedupMinhash(withNulls).collect()     // no planted dups: rows
    Dedup.dedupSimhash(withNulls).collect()     // may be empty, must
    Dedup.ngramJaccard(withNulls).collect()     // not throw
    assert(Dedup.decontaminate(withNulls, benchmarkMaxId = 0L).count() === 0)
    Dedup.bloomDecontaminate(withNulls).collect()  // null/short → no grams
  }

  test("importance sampling skips null/empty text, never throws") {
    import org.apache.spark.sql.functions.lit
    val docs = withNulls.withColumn("source", lit("src0"))
    val out = graft.operators.Corpus.importanceSample(docs).collect()
    // null/empty/whitespace docs produce no tokens → no score row
    assert(out.map(_.getLong(0)).toSet === Set(1L, 3L))
  }

  test("importance sampling counts NULL source as raw, like the oracle") {
    // the oracle's cr branch is `CASE WHEN source = target THEN 0
    // ELSE 1` precisely so a NULL source lands in raw on BOTH
    // engines; this pins the engine half of that contract
    import spark.implicits._
    import org.apache.spark.sql.functions.lit
    val docs = Seq(
      (1L, Option("src0"), "alpha beta gamma"),
      (2L, Option.empty[String], "alpha beta gamma"),
      (3L, Option("srcX"), "alpha beta gamma"))
      .toDF("doc_id", "source", "text")
    val w = graft.operators.Corpus.importanceWeightRows(docs)
    // identical token streams: target mass 3, raw mass 6 — the
    // NULL-source doc's 3 tokens MUST be in the raw denominator
    val wNoNull = graft.operators.Corpus.importanceWeightRows(
      docs.filter($"source".isNotNull).union(docs
        .filter($"source".isNull).withColumn("source", lit("srcX"))))
    assert(w === wNoNull,
      "NULL source must weigh exactly like any non-target source")
    val out = graft.operators.Corpus.importanceSample(docs, topN = 10)
      .collect()
    assert(out.length === 3) // the null-source doc scores, not drops
  }

  test("text analysis null-propagates without throwing") {
    assert(TextAnalysis.langId(
      withNulls.withColumn("lang", org.apache.spark.sql.functions.lit("en")))
      .count() === 5)
    val q = TextAnalysis.qualityScore(withNulls).collect()
    assert(q.length === 5)
    // empty doc: ratios null-propagate, row survives
    val empty = q.find(_.getLong(0) == 4L).get
    assert(empty.isNullAt(empty.fieldIndex("alpha_ratio")))
    assert(TextAnalysis.tokenCount(withNulls).count() === 5)
    assert(TextAnalysis.fingerprint(withNulls).count() === 5)
    TextAnalysis.repetition(withNulls).collect()
    assert(TextAnalysis.redact(withNulls).count() === 5)
  }

  test("multimodal probes skip null payloads, keep empty ones") {
    assert(Multimodal.multimodalMeta(withNulls).count() === 4)
    assert(Multimodal.imageFeatures(withNulls).count() === 4)
    assert(Multimodal.resize(withNulls).count() === 4)
    // zero-byte payload has zero frames; others have ≥1
    assert(Multimodal.frameSample(withNulls).select("doc_id")
      .distinct().count() === 3)
  }

  test("empty-vs-NULL text diverge exactly where the contracts say") {
    // r15 hostile-sweep pin: '' is a DOCUMENT (zero content, still a
    // row with defined emptiness) while NULL is ABSENCE — operators
    // that conflate them silently corrupt dedup groups and token
    // stats. The hostile gate proves engine ≡ oracle on both; this
    // pins that the shared behavior is the DOCUMENTED one, not a
    // shared conflation.
    import spark.implicits._
    val docs = Seq(
      (1L, Option.empty[String]),   // absent
      (2L, Option.empty[String]),   // absent (second copy)
      (3L, Option("")),             // empty document
      (4L, Option("   ")),          // space-only ≡ empty after norm
      // (tabs would NOT: Spark and DuckDB trim() strip SPACES only,
      // so '\t' normalizes to ' ' — a shared, documented contract)
      (5L, Option("real text here")))
      .toDF("doc_id", "text")
    // d01: NULL rows group together but NEVER with '' — xxhash64
    // skips a null child (seed passthrough) while '' hashes its zero
    // bytes; whitespace-only normalizes to '' and joins ITS group
    val groups = Dedup.dedupExact(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(groups(1L) === 2L, "both NULL docs in one group")
    assert(groups(3L) === 2L, "'' and whitespace-only in one group")
    assert(groups(5L) === 1L)
    // t03: NULL null-propagates every count; '' counts zero BPE
    // tokens (and the ws-split artifact token) with a null ratio
    val tc = TextAnalysis.tokenCount(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(tc(1L).isNullAt(tc(1L).fieldIndex("n_bpe_tokens")),
      "NULL text must null-propagate, not count as empty")
    assert(tc(3L).getAs[Long]("n_bpe_tokens") === 0L,
      "'' is a document with zero tokens, not an absent row")
    // d17: NULL never joins; '' pairs with whitespace-only at dist 0
    val pairs = Dedup.editDistanceJoin(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pairs.contains((3L, 4L, 0L)),
      "''/whitespace-only must pair at distance 0")
    assert(!pairs.exists(p => p._1 <= 2L || p._2 <= 2L),
      "NULL text must never enter the fuzzy join")
    // d16: NULL dropped at the scan, '' survives as a document row
    val ld = Dedup.lineDedup(docs).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    assert(!ld.contains(1L) && !ld.contains(2L),
      "NULL text must not reach boilerplate reassembly")
    assert(ld.contains(5L))
  }

  test("zero embedding vectors score null cosine, never throw") {
    import spark.implicits._
    val emb = Seq(
      (1L, 0, Array(1.0f, 2.0f, 3.0f)),
      (2L, 0, Array(0.0f, 0.0f, 0.0f)), // failed/padding embedding
      (3L, 0, Array(3.0f, 2.0f, 1.0f)))
      .toDF("vec_id", "label", "embedding")
    val pairs = Dedup.dedupEmbedding(emb, tau = -1.0).collect()
    // the zero vector matches nothing; the 1-3 pair survives
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((1L, 3L)))
  }
}
