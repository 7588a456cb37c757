package graft
import org.apache.spark.sql.SparkSession

/** Inventory-wide physical-plan audit: prints, for every batch query,
  * any plan feature that deserves a scale justification —
  * SortAggregate (a buffer type fell out of hash aggregation),
  * ObjectHashAggregate, Window (shuffle+sort on the partition key),
  * BroadcastNestedLoopJoin. Run after touching operators:
  *
  *   sbt 'runMain graft.PlanScan' | grep PLANSCAN
  *
  * Current expected output (justifications):
  *  - p01/q28 SortAggregate: min_by/max_by carry string payloads
  *    (can't hash-agg); sort keys are the 8-byte hash / changelog
  *    key, partial aggregation still combines map-side.
  *  - q04/q07/q12/q13/q16/q17/q21/q24 + ANN Window: rank /
  *    gaps-and-islands / local-lambda range frames / BH running-min —
  *    the semantics ARE windows; all partition by high-cardinality
  *    keys or post-aggregation bounded sets (q24's single-partition
  *    windows run on #bins rows, bounded by time-range/binSeconds).
  *  - d02/d04/d09 Window: the df / bucket-size guard counts over the
  *    posting exchange (partitioned by the high-cardinality shingle
  *    hash / bucket key) — chosen over groupBy+join-back precisely
  *    so the exchange stays reusable (see Dedup.scala); d09 adds the
  *    per-(pair, diagonal) islands window, bounded by matched pairs.
  *  - d07 Window: n_members count per resolved cluster — dup-graph
  *    cardinality, post-convergence.
  *  - q25 Window: the as-of carry-forward per key — the operator's
  *    entire semantics, partitioned by user.
  *  - t07/p05 Window: per-stratum running sums / per-bucket ranks;
  *    p05's ONLY order-all window runs on ≤`buckets` metadata rows.
  *  - q26 Window: per-(group, salt) spillable local top-k, then the
  *    exact rank over ≤ salt·k pruned candidates (spec-pinned
  *    lossless) — never one sort of the full aggregate per group.
  *  - p07 Window: q26's shape verbatim (per-(source, salt) local
  *    top-cap, then rank over ≤ buckets·cap survivors).
  *  - t08 Window: rank + running coverage AFTER the limit — runs on
  *    topN rows; the top-N itself is TakeOrderedAndProject.
  *  - t09 Window: corpus bigram/prefix counts as count windows over
  *    the two digest exchanges (d02/d04 df-guard discipline,
  *    high-cardinality keys) — no join build sides.
  *  - s04 Window: two-phase sharded candidate top-k by ADC score
  *    (s01's topK shape) plus the ≤ subspaces·ks-row codebook
  *    densify window.
  *  - d12 Window: inherits d09's guard/islands windows; per-doc
  *    reassembly is an aggregation, not a window.
  *  - s01/s02/d08 BNLJ: broadcast handful of query vectors (or k-row
  *    centroid table) against the corpus scan, by design.
  *  - q20/s02 ObjectHashAggregate: TypedImperativeAggregate buffers
  *    (GK percentile sketch, collect_list centroids) — still hash
  *    keyed, no per-group sort.
  *  - q31/q32 Window: the per-user moments — unordered partition
  *    aggregates (q31) / one prefix sort shared by all three running
  *    moments (q32), both on the high-cardinality user_id exchange;
  *    chosen over groupBy+join-back so the moments ride ONE exchange
  *    (spec counts them).
  *  - m06 Window: the hot-bucket guard count over the (chunk_id,
  *    value) posting exchange — d02's df-guard discipline; the same
  *    exchange feeds both band-join sides (ReusedExchange,
  *    spec-pinned).
  *  - s05 Window/SortAggregate/ObjectHashAggregate/BNLJ: the union of
  *    s02's probe shapes and s04's LUT/top-k shapes — the composition
  *    adds no new plan feature of its own.
  *  - q36 Window: q12's island windows plus the per-island argmax
  *    rank — all on ENRICHED bins (≤ #bins rows, post-aggregation
  *    bounded cardinality, q12's justification).
  *  - q33/q34 Window: slice totals / Gini ranks over the BIN table —
  *    post-aggregation bounded cardinality (#bins = range/binWidth),
  *    the q24 justification; the corpus-sized work is the map-side
  *    conditional-count aggregate below them. q34's
  *    ObjectHashAggregate is the exact-median buffer over those same
  *    #bins rows (q20's justification, bounded input).
  *  - q35 BNLJ: t08's scalar-subquery shape — the broadcast side is
  *    exactly ONE row (the BAMPE auto-detect mode flag).
  *  - q43 ObjectHashAggregate: the Misra–Gries
  *    TypedImperativeAggregate — ≤ k-entry buffers per group, hash
  *    keyed by lang (q20's sketch-buffer justification).
  *  - t15 Window: d09's guard/islands discipline turned within-doc —
  *    per-(doc, gh) repeat guard over the doc_id exchange,
  *    per-(doc, diagonal) islands bounded by matched docs. Its
  *    ObjectHashAggregate is d12's per-doc reassembly collect_list
  *    buffer (bounded by one document's tokens).
  *  - k13/st14 ObjectHashAggregate: DataSketches HLL buffers
  *    (hll_sketch_agg / hll_union_agg) — fixed-size per (day, type),
  *    q20's sketch-buffer justification.
  *  - st13 Window: the max-version board slice over the memory-sink
  *    snapshot table — ≤ batches·k rows per lang, metadata scale.
  *  - p13 BNLJ: the corpus-total scalar crossed onto the
  *    source-cardinality rate table (t08's 1-row-broadcast shape);
  *    the corpus-sized admission join is a broadcast HASH join.
  */
object PlanScan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val skip = Set("st01_stream_window", "st02_stream_session",
      "st03_stream_dedup", "st04_stream_enrich", "st05_stream_asof",
      "k01_partitioned_sink", "k02_bucketed_join", "k03_compaction",
      "d10_dedup_incremental", "k04_fastq_ingest",
      "st06_stream_sink", "st07_stream_funnel", "st08_stream_outlier",
      "k05_orc_roundtrip", "k06_csv_roundtrip", "k07_jsonl_roundtrip")
    SparkEntry.queries.keys.toSeq.sorted.filterNot(skip).foreach { n =>
      val p = SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      val marks = Seq(
        "SortAggregate" -> p.contains("SortAggregate"),
        "ObjectHashAggregate" -> p.contains("ObjectHashAggregate"),
        "Window" -> p.contains("Window"),
        "BNLJ" -> p.contains("BroadcastNestedLoopJoin"))
        .collect { case (m, true) => m }
      if (marks.nonEmpty) println(s"PLANSCAN $n: ${marks.mkString(", ")}")
    }
    spark.stop()
  }
}
