package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Multimodal, TextAnalysis}

/** Corpora misbehave: rows with NULL text must flow through every
  * document operator without exceptions — either filtered (set
  * operators, binary probes) or null-propagated (per-row
  * projections).
  */
class NullSafetySpec extends AnyFunSuite {
  import TestSpark._

  private def withNulls = {
    import spark.implicits._
    Seq((1L, Option("real document text here with several tokens")),
      (2L, Option.empty[String]),
      (3L, Option("another real document")))
      .toDF("doc_id", "text")
  }

  test("dedup family survives null text") {
    assert(Dedup.dedupExact(withNulls).count() >= 1)
    Dedup.dedupMinhash(withNulls).collect()     // no planted dups: rows
    Dedup.dedupSimhash(withNulls).collect()     // may be empty, must
    Dedup.ngramJaccard(withNulls).collect()     // not throw
    assert(Dedup.decontaminate(withNulls, benchmarkMaxId = 0L).count() === 0)
  }

  test("text analysis null-propagates without throwing") {
    assert(TextAnalysis.langId(
      withNulls.withColumn("lang", org.apache.spark.sql.functions.lit("en")))
      .count() === 3)
    assert(TextAnalysis.qualityScore(withNulls).count() === 3)
    assert(TextAnalysis.tokenCount(withNulls).count() === 3)
    assert(TextAnalysis.fingerprint(withNulls).count() === 3)
    TextAnalysis.repetition(withNulls).collect()
    assert(TextAnalysis.redact(withNulls).count() === 3)
  }

  test("multimodal probes skip null payloads") {
    assert(Multimodal.multimodalMeta(withNulls).count() === 2)
    assert(Multimodal.imageFeatures(withNulls).count() === 2)
    assert(Multimodal.resize(withNulls).count() === 2)
    assert(Multimodal.frameSample(withNulls).select("doc_id")
      .distinct().count() === 2)
  }
}
