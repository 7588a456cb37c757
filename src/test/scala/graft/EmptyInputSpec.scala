package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}

/** A corpus shard can legitimately be empty (a partition pruned to
  * nothing, a filter that drops everything). Every operator must
  * return an empty result — never throw — so downstream unions and
  * sinks stay total.
  */
class EmptyInputSpec extends AnyFunSuite {
  import TestSpark._

  private def emptyDocs: DataFrame =
    Tables.documents(spark, sf).filter("doc_id < 0")

  private def emptyEmb: DataFrame =
    Tables.embeddings(spark, sf).filter("vec_id < 0")

  test("document operators yield empty, not errors") {
    assert(Dedup.dedupExact(emptyDocs).count() === 0)
    assert(Dedup.dedupMinhash(emptyDocs).count() === 0)
    assert(Dedup.dedupSimhash(emptyDocs).count() === 0)
    assert(Dedup.ngramJaccard(emptyDocs).count() === 0)
    assert(Dedup.decontaminate(emptyDocs).count() === 0)
    assert(TextAnalysis.langId(emptyDocs).count() === 0)
    assert(TextAnalysis.qualityScore(emptyDocs).count() === 0)
    assert(TextAnalysis.tokenCount(emptyDocs).count() === 0)
    assert(TextAnalysis.fingerprint(emptyDocs).count() === 0)
    assert(TextAnalysis.repetition(emptyDocs).count() === 0)
    assert(TextAnalysis.redact(emptyDocs).count() === 0)
    assert(Multimodal.multimodalMeta(emptyDocs).count() === 0)
    assert(Multimodal.imageFeatures(emptyDocs).count() === 0)
    assert(Multimodal.resize(emptyDocs).count() === 0)
    assert(Multimodal.frameSample(emptyDocs).count() === 0)
  }

  test("similarity operators yield empty, not errors") {
    assert(Dedup.dedupEmbedding(emptyEmb).count() === 0)
    assert(Similarity.annBruteForce(emptyEmb).count() === 0)
    assert(Similarity.annIvf(emptyEmb).count() === 0)
    assert(Similarity.annLsh(emptyEmb).count() === 0)
  }

  test("round-7 operators yield empty, not errors") {
    import graft.operators.{Asof, Corpus, Pipeline}
    val emptyEvents = Tables.events(spark, sf).filter("event_id < 0")
    val emptyOrders = Tables.orders(spark, sf).filter("o_orderkey < 0")
    assert(Dedup.dupSpans(emptyDocs).count() === 0)
    assert(Corpus.seqPack(emptyDocs).count() === 0)
    assert(Corpus.mixtureSample(emptyDocs).count() === 0)
    assert(Corpus.batchAssembly(emptyDocs, emptyEmb).count() === 0)
    assert(Corpus.dedupCorpus(emptyDocs).count() === 0)
    assert(Pipeline.groupedTopk(emptyOrders).count() === 0)
    assert(Asof.eventAsofAnchor(emptyEvents).count() === 0)
  }

  test("late round-7 operators yield empty, not errors") {
    import graft.operators.{Corpus, Pipeline}
    val emptyEvents = Tables.events(spark, sf).filter("event_id < 0")
    assert(TextAnalysis.oovRate(emptyDocs).count() === 0)
    assert(Corpus.split(emptyDocs).count() === 0)
    assert(Multimodal.phashChunks(emptyDocs).count() === 0)
    assert(Multimodal.phashDedup(emptyDocs).count() === 0)
    assert(Similarity.annIvfPq(emptyEmb).count() === 0)
    assert(Pipeline.outliers(emptyEvents).count() === 0)
    assert(Pipeline.onlineOutliers(emptyEvents).count() === 0)
    assert(graft.sources.Formats.orcRoundtrip(emptyDocs).count() === 0)
    assert(graft.sources.Formats.csvRoundtrip(emptyDocs).count() === 0)
    assert(graft.sources.Formats.jsonlRoundtrip(emptyDocs).count() === 0)
  }

  test("round-9 operators yield empty, not errors") {
    import graft.operators.{Corpus, Pipeline}
    val emptyEvents = Tables.events(spark, sf).filter("event_id < 0")
    val emptyOrders = Tables.orders(spark, sf).filter("o_orderkey < 0")
    val emptyCust = Tables.customer(spark, sf).filter("c_custkey < 0")
    assert(Corpus.epochMixture(emptyDocs).count() === 0)
    assert(Dedup.ngramContainment(emptyDocs).count() === 0)
    assert(Corpus.softDedupSample(emptyDocs).count() === 0)
    assert(Pipeline.intervalComplement(emptyEvents).count() === 0)
    assert(Pipeline.intervalOverlapJoin(emptyEvents).count() === 0)
    // an empty catalog has nothing to reconcile or report on
    assert(graft.sources.IngestManifest.reconcile(emptyDocs).count() === 0)
    assert(Pipeline.runReport(emptyCust, emptyOrders).count() === 0)
  }

  test("round-11 operators yield empty, not errors") {
    import graft.operators.Corpus
    val emptyEvents = Tables.events(spark, sf).filter("event_id < 0")
    assert(TextAnalysis.heavyHitterTokens(emptyDocs).count() === 0)
    assert(Dedup.repetitionScrub(emptyDocs).count() === 0)
    assert(Corpus.tokenBudgetMixture(emptyDocs).count() === 0)
    assert(Multimodal.cdcDedup(emptyDocs).count() === 0)
    // k13 on an empty slice: an empty ledger yields an empty readout
    assert(graft.sources.SketchLedger
      .rollingUniques(emptyEvents, cacheKey = "").count() === 0)
    // d14 on empty snapshots returns its single zero-estimate row —
    // asserted with the overlap specs in SketchSpec
  }

  test("round-12 operators yield empty, not errors") {
    import graft.operators.Corpus
    assert(Dedup.bloomDecontaminate(emptyDocs).count() === 0)
    assert(Corpus.importanceSample(emptyDocs).count() === 0)
    assert(Dedup.lineDedup(emptyDocs).count() === 0)
    assert(TextAnalysis.pplBuckets(emptyDocs).count() === 0)
    assert(graft.operators.Pipeline.exactQuantiles(
      Tables.events(spark, sf).filter("event_id < 0")).count() === 0)
    // k14 on an empty corpus: two empty versions, an empty summary
    assert(graft.sources.TimeTravel
      .timeTravelSummary(emptyDocs).count() === 0)
  }

  test("round-13 operators yield empty, not errors") {
    val emptyEvents = Tables.events(spark, sf).filter("event_id < 0")
    // k16: no clusterable row → degenerate bounds, empty tree,
    // empty rectangle (a bare getLong on the all-NULL min/max row
    // would NPE instead)
    assert(graft.sources.ZOrderLayout
      .rectangleWindow(emptyEvents).count() === 0)
    assert(graft.sources.CoverageTrack
      .coverageWindow(emptyEvents).count() === 0)
    assert(graft.sources.FileBloomIndex
      .pointLookup(emptyDocs).count() === 0)
    // k18: the affected partition dirs never materialize on an
    // empty corpus — the rebuild must existence-filter, not throw
    assert(graft.sources.IndexMaintenance
      .maintainedLookup(emptyDocs).count() === 0)
  }
}
