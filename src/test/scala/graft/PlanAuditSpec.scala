package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.{WindowExec, WindowGroupLimitExec}
import org.scalatest.funsuite.AnyFunSuite

/** Global plan-shape audit: every batch query's physical plan is
  * checked for the patterns that kill a 100 TB run. Runs at plan
  * time only (nothing executes), so it covers the whole inventory
  * cheaply on every test run.
  */
class PlanAuditSpec extends AnyFunSuite {
  import TestSpark._

  /** Entries that execute work on construction (streams, sinks, and
    * the artifact-building operators: d15's bloom count+build, p15's
    * B-row weight collect) — their plans are audited by the read-back
    * sweep below and their own specs instead.
    */
  private val sideEffecting =
    Set("st01_stream_window", "st02_stream_session", "st03_stream_dedup",
      "st04_stream_enrich", "st05_stream_asof",
      "k01_partitioned_sink", "k02_bucketed_join", "k03_compaction",
      "d10_dedup_incremental", "k04_fastq_ingest",
      "st06_stream_sink", "st07_stream_funnel", "k05_orc_roundtrip",
      "st08_stream_outlier", "k06_csv_roundtrip", "k07_jsonl_roundtrip",
      "k11_ingest_manifest", "st11_stream_ingest",
      "k12_partition_upsert", "st12_stream_upsert", "st16_stream_index",
      "st13_stream_heavy",
      "k13_sketch_ledger", "st14_stream_ledger", "st15_stream_select",
      "d15_bloom_decontaminate", "p15_importance_sample",
      "k14_time_travel")

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
  /** p13's corpus-total cross joins ONE broadcast row onto the
    * source-cardinality rate table (metadata-scale left side) — the
    * same scalar shape; the corpus-sized admission join below it is
    * a broadcast HASH join on source. p14 composes p13's mixture
    * stage and inherits exactly that scalar cross (its corpus-sized
    * joins are hash/anti joins, visible in the same plan).
    */
  private val bnljByDesign =
    Set("s01_ann_bruteforce", "s02_ann_ivf", "d08_dedup_embedding_auto",
      "t08_vocab", "s04_ann_pq", "s05_ann_ivfpq", "p13_token_mixture",
      "p14_training_build",
      // s06 is s05's machinery at lossless dials — same tiny probe
      // cross; s07's only nested loop is the #queries × #clusters
      // admission cross (both broadcast-sized); each one's corpus
      // side enters a hash join (SimilaritySpec pins it)
      "s06_ann_exact", "s07_range_search",
      // k31's fetch runs s05/s06's shared ivfPqScan over the LANDED
      // artifacts — the identical broadcast probe/LUT crosses; st27
      // is the same fetch through the STREAMED artifacts
      "k31_ann_index", "st27_stream_ann_ingest")

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

  /** Partition-less windows move ALL data to one task — fatal at
    * 100 TB unless the window's input is by-design bounded. These are
    * the justified cases (each runs post-aggregation / post-limit on
    * metadata-scale rows); anything NEW fails the gate loudly instead
    * of adding another "Moving all data to a single partition" line
    * to the log noise.
    */
  private val partitionlessWindowByDesign = Map(
    // rank + running coverage AFTER the top-N limit: ≤ topN rows
    "t08_vocab" -> "post-limit topN rows",
    // Gini rank over the bin table: ≤ #bins = range/binWidth rows
    "q34_evenness" -> "post-aggregation #bins rows",
    // per-bucket metadata ranks: ≤ `buckets` rows
    "p05_batch_assembly" -> "bucket metadata rows",
    // (q24 left this list in round 14: its λ/rank/BH windows are now
    // partitioned per event_type — q40's recipe)
    // drift ranks over the per-slice bin table (q24's justification)
    "q33_dist_drift" -> "post-aggregation #bins rows",
    // gaps-and-islands over the aggregated bin table: ≤ #bins rows
    // (bounded by time-range/binSeconds, PlanScan's q12 note)
    "q12_peak_detect" -> "post-aggregation #bins rows",
    // ratio-of-total over() on #statuses rows post-aggregation
    "q13_metrics" -> "post-aggregation #statuses rows",
    // cumulative share over the fixed-bin histogram: ≤ #bins rows
    "q07_histogram" -> "post-aggregation #bins rows",
    // (q21 likewise left in round 14: per-type partitioned windows)
    // q12's islands + per-island argmax rank, same bounded bin table
    "q36_peak_summits" -> "post-aggregation #bins rows",
    // q41's consensus side IS q12's global islands — same bin table
    "q41_interval_join" -> "post-aggregation #bins rows (q12 side)",
    // BAMPE detect over the census rollup: ≤ 2^bits flag rows
    "q35_flag_census" -> "post-aggregation 2^bits flag rows")

  private def physical(plan: SparkPlan): SparkPlan = plan match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case p => p
  }

  test("partition-less windows only on by-design bounded inputs") {
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    val stale = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.keys.filterNot(sideEffecting).foreach { name =>
      val plan = physical(SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan)
      val bare = plan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w.nodeName
        case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => w.nodeName
      }
      if (partitionlessWindowByDesign.contains(name)) {
        if (bare.isEmpty) stale += name
      } else if (bare.nonEmpty) offenders += s"$name(${bare.mkString(",")})"
    }
    assert(offenders.isEmpty,
      s"partition-less windows outside the allowlist: " +
        s"${offenders.mkString(", ")} — unbounded input would collapse " +
        "to ONE task; justify and allowlist or partition the window")
    assert(stale.isEmpty,
      s"allowlisted but plan no partition-less window (remove): " +
        s"${stale.mkString(", ")}")
  }

  /** r15 verdict item 1: a window partitioned ONLY by a low-cardinality
    * stratum column (source/split/epoch) funnels each stratum through
    * one task — at 100 TB with ~10 sources the stage runs ~10-wide and
    * one task sorts a multi-TB stratum. The packing operators now use
    * stratifiedPrefixSum's (stratum, range-bucket) encoding; this gate
    * keeps them (and anything new) honest. A stratum-only window IS
    * legitimate on bounded metadata — i.e. when an aggregate sits
    * below it in the same plan subtree (the bucket-offset window runs
    * on ≤ strata×buckets representative rows) — so the gate fails only
    * on stratum-only windows with NO aggregate or limit beneath them.
    */
  test("no per-stratum single-task window on corpus-cardinality input") {
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.{GlobalLimitExec, LocalLimitExec}
    val strataNames = Set("source", "split", "epoch", "lang")
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.keys.filterNot(sideEffecting).foreach { name =>
      val plan = physical(SparkEntry.queries(name)(spark, sf)
        .queryExecution.executedPlan)
      plan.foreach {
        case w: WindowExec if w.partitionSpec.nonEmpty =>
          val partCols = w.partitionSpec.flatMap(_.references.map(_.name))
          val strataOnly = partCols.nonEmpty &&
            partCols.forall(strataNames.contains)
          val boundedBelow = w.child.exists {
            case _: BaseAggregateExec => true
            case _: GlobalLimitExec | _: LocalLimitExec => true
            case _ => false
          }
          // a RANK-PRUNE filter over a prior window also bounds the
          // input: stratifiedPrefixSum's _rn=1 representative slice
          // (≤ strata×buckets rows) and p07/q26's two-phase top-k
          // (≤ buckets·cap rows per stratum after the local ≤cap cut).
          // ADVICE r16 #3: the pruning conjunct must compare an
          // attribute PRODUCED by the window below (row_number/rank
          // output) against a small integer literal — a mere `<=` in
          // the condition string (e.g. an unbounded band filter
          // abs(a-b) <= 8) does NOT bound cardinality and must not
          // exempt a genuine stratum-only window.
          val repSliceBelow = w.child.exists {
            case f: org.apache.spark.sql.execution.FilterExec =>
              import org.apache.spark.sql.catalyst.expressions._
              val winOuts = f.child.collect {
                case w2: WindowExec =>
                  w2.windowExpression.map(_.toAttribute.exprId)
              }.flatten.toSet
              def smallLit(l: Any): Boolean = l match {
                case i: Int => i <= 4096
                case i: Long => i <= 4096L
                case _ => false
              }
              // ADVICE r17 #5: also accept the commuted comparison
              // forms (lit OP attr) and strip Cast around the window
              // attribute — a future plan change flipping the
              // conjunct or casting the rank column is the same
              // semantic prune and must not false-fail the audit.
              def winAttr(e: Expression): Boolean = e match {
                case a: AttributeReference => winOuts.contains(a.exprId)
                case c: Cast => winAttr(c.child)
                case _ => false
              }
              def rankPrune(e: Expression): Boolean = e match {
                case And(l, r) => rankPrune(l) || rankPrune(r)
                case EqualTo(a, Literal(v, _)) =>
                  winAttr(a) && smallLit(v)
                case EqualTo(Literal(v, _), a) =>
                  winAttr(a) && smallLit(v)
                case LessThanOrEqual(a, Literal(v, _)) =>
                  winAttr(a) && smallLit(v)
                case GreaterThanOrEqual(Literal(v, _), a) =>
                  winAttr(a) && smallLit(v)
                case LessThan(a, Literal(v, _)) =>
                  winAttr(a) && smallLit(v)
                case GreaterThan(Literal(v, _), a) =>
                  winAttr(a) && smallLit(v)
                case _ => false
              }
              winOuts.nonEmpty && rankPrune(f.condition)
            case _ => false
          }
          if (strataOnly && !boundedBelow && !repSliceBelow)
            offenders += s"$name(partitionBy=${partCols.mkString(",")})"
        case _ => ()
      }
    }
    assert(offenders.isEmpty,
      s"stratum-only windows on corpus-cardinality input: " +
        s"${offenders.distinct.mkString(", ")} — one task per stratum; " +
        "use Corpus.stratifiedPrefixSum's (stratum, bucket) encoding")
  }

  /** r9 verdict item 7: the side-effecting entries were excluded from
    * the sweeps above on the promise their own specs audit plans.
    * This closes the gap directly: each entry is constructed ONCE
    * (executing its write/stream against its own staging dir — the
    * same thing Verify does) and the RETURNED read-back/summary
    * DataFrame's physical plan passes the same three gates. Every
    * registered query is now inside SOME plan gate.
    */
  test("side-effecting entries: read-back plans pass the same gates") {
    val offenders = scala.collection.mutable.ListBuffer.empty[String]
    sideEffecting.toSeq.sorted.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      val plan = physical(df.queryExecution.executedPlan)
      val s = plan.toString
      if (s.contains("CartesianProduct")) offenders += s"$name(cartesian)"
      if (s.contains("BroadcastNestedLoopJoin")) offenders += s"$name(bnlj)"
      val bare = plan.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => w.nodeName
        case w: WindowGroupLimitExec if w.partitionSpec.isEmpty => w.nodeName
      }
      if (bare.nonEmpty) offenders += s"$name(${bare.mkString(",")})"
    }
    assert(offenders.isEmpty,
      s"side-effecting read-back plans fail the sweep: " +
        offenders.mkString(", "))
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
