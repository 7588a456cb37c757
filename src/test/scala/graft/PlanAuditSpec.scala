package graft

import org.scalatest.funsuite.AnyFunSuite

/** Global plan-shape audit: every batch query's physical plan is
  * checked for the patterns that kill a 100 TB run. Runs at plan
  * time only (nothing executes), so it covers the whole inventory
  * cheaply on every test run.
  */
class PlanAuditSpec extends AnyFunSuite {
  import TestSpark._

  /** Streaming/sink entries execute work on construction — audited in
    * their own specs instead.
    */
  private val sideEffecting =
    Set("st01_stream_window", "st02_stream_session", "st03_stream_dedup",
      "st04_stream_enrich", "st05_stream_asof",
      "k01_partitioned_sink", "k02_bucketed_join", "k03_compaction",
      "d10_dedup_incremental", "k04_fastq_ingest",
      "st06_stream_sink", "st07_stream_funnel", "k05_orc_roundtrip",
      "st08_stream_outlier", "k06_csv_roundtrip", "k07_jsonl_roundtrip")

  /** s01/s02 score a BROADCAST handful of query vectors against the
    * corpus with a non-equi self-exclusion — the one place a
    * broadcast nested loop is the intended shape (corpus scanned
    * once, map-side). s02/d08's k-means assignment likewise crosses
    * the corpus with the BROADCAST k-row centroid table map-side.
    */
  /** t08's grand-total join is the scalar-subquery shape: the
    * broadcast side is exactly ONE row (sum over the vocab).
    */
  /** s04's ADC scan crosses the codes-only corpus with the BROADCAST
    * per-query lookup tables (a handful of rows, like s01's queries).
    */
  /** s05 composes s02's probe cross (queries × broadcast centroids)
    * with s04's LUT broadcast — the same by-design tiny sides.
    */
  private val bnljByDesign =
    Set("s01_ann_bruteforce", "s02_ann_ivf", "d08_dedup_embedding_auto",
      "t08_vocab", "s04_ann_pq", "s05_ann_ivfpq")

  test("no query plan contains a cartesian product") {
    SparkEntry.queries.keys.filterNot(sideEffecting).foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product")
    }
  }

  test("nested-loop joins only where a broadcast side is by-design tiny") {
    SparkEntry.queries.keys.filterNot(sideEffecting)
      .filterNot(bnljByDesign).foreach { name =>
        val plan = SparkEntry.queries(name)(spark, sf)
          .queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans a nested-loop join")
      }
  }

  test("document/embedding scans prune to the referenced columns") {
    // Operators over wide tables must not read every column: the
    // parquet ReadSchema should include only what the query uses.
    val narrow = Map(
      "d01_dedup_exact" -> Seq("doc_id", "text"),
      "t03_token_count" -> Seq("doc_id", "text"),
      "d05_dedup_embedding" -> Seq("vec_id", "label", "embedding"))
    narrow.foreach { case (name, cols) =>
      val scans = SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan.toString
        .linesIterator.filter(_.contains("ReadSchema")).mkString("\n")
      val widest = Seq("n_chars", "props", "o_comment")
      widest.foreach(c => assert(!scans.contains(c),
        s"$name reads unreferenced column $c"))
      cols.filterNot(_ == "label").foreach(c => assert(scans.contains(c),
        s"$name scan missing $c"))
    }
  }
}
