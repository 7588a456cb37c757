package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  import TestSpark._

  test("q10_bin_coverage: bins partition all events") {
    val df = SparkEntry.queries("q10_bin_coverage")(spark, sf)
    val total = df.collect().map(_.getAs[Long]("n_events")).sum
    assert(total === Tables.events(spark, sf).count())
  }

  test("q11_interval_count: binned EQUI-join (hash, not nested loop)") {
    val df = SparkEntry.queries("q11_interval_count")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    val total = df.collect().map(_.getAs[Long]("n_items")).sum
    val inRange = Tables.lineitem(spark, sf)
      .filter("l_extendedprice >= 0 AND l_extendedprice < 120000").count()
    assert(total === inRange)
  }

  test("q12_peak_detect: peaks are non-overlapping ordered islands") {
    val df = SparkEntry.queries("q12_peak_detect")(spark, sf)
    val rows = df.collect().map(r => (r.getAs[Long]("peak_start"),
      r.getAs[Long]("peak_end"))).sorted
    assert(rows.forall { case (s, e) => s <= e })
    rows.sliding(2).foreach {
      case Array((_, e1), (s2, _)) => assert(e1 + 1 < s2) // merged if adjacent
      case _ =>
    }
  }

  test("q21_peak_local: peaks exceed their local background, islands merged") {
    import org.apache.spark.sql.functions._
    val df = SparkEntry.queries("q21_peak_local")(spark, sf)
    val rows = df.collect().map(r => (r.getAs[String]("event_type"),
      r.getAs[Long]("peak_start"), r.getAs[Long]("peak_end")))
    // per-type thinning makes sf0.001 legitimately spike-free (each
    // type's own λ tracks its own counts); the driver's sf0.01 gate
    // sees 85 peaks, and the planted two-type stream below pins the
    // semantics — here we only require structural sanity
    assert(rows.forall { case (_, s, e) => s <= e })
    // adjacency (merged-islands) holds WITHIN each type
    rows.groupBy(_._1).values.foreach { tr =>
      tr.map(r => (r._2, r._3)).sorted.sliding(2).foreach {
        case Array((_, e1), (s2, _)) => assert(e1 + 1 < s2)
        case _ =>
      }
    }
    // a LOCALIZED spike inside an elevated-baseline region: the local
    // caller isolates exactly the spike bin — the elevated region
    // raises its own lambda, so it does not flood the caller. Two
    // types share the stream: the flat 'bg' type must contribute NO
    // peak and must not dilute 'x's local lambda (per-type windows).
    import spark.implicits._
    val elevated = (0L until 200L).flatMap { b =>
      val n = if (b == 100L) 60 else if (b >= 80L && b < 120L) 20 else 19
      ((0 until n).map(_ => (b, "x"))) ++ (0 until 19).map(_ => (b, "bg"))
    }.toDF("bin", "event_type")
    val ev = elevated.select(
      timestamp_micros((col("bin") * 3600L * 1000000L)).as("ts"),
      col("event_type"))
    val local = graft.operators.Pipeline.peakDetectLocal(ev)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(local === Set(("x", 100L, 100L)),
      s"local-background caller should isolate the planted spike: $local")
  }

  test("q24_peak_fdr: planted burst called at q<=0.01; null background is not") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 200 hour-bins of 5 background events, two adjacent 60-event
    // burst bins: P(Pois(λ≈7) ≥ 60) is ~1e-38, so BH keeps exactly
    // the burst bins and the island merge joins them into one peak.
    // A second flat type rides along: per-type FDR must call ZERO
    // peaks for it while still calling x's burst.
    val ev = (0L until 200L).flatMap { b =>
      val n = if (b == 100L || b == 101L) 60 else 5
      ((0 until n).map(_ => (b, "x"))) ++ (0 until 5).map(_ => (b, "bg"))
    }.toDF("bin", "event_type")
      .select(timestamp_micros(col("bin") * 3600L * 1000000L).as("ts"),
        col("event_type"))
    val peaks = graft.operators.Pipeline.peakFdr(ev)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(peaks.toSeq === Seq(("x", 100L, 101L, 2L, 120L)))
    // A flat background has p ≈ 0.56 everywhere — the FDR caller must
    // report NO peaks on null data (q12's mean+2σ z-test is the one
    // that can't make that guarantee).
    val flat = (0L until 200L).flatMap(b => (0 until 5).map(_ => b))
      .toDF("bin")
      .select(timestamp_micros(col("bin") * 3600L * 1000000L).as("ts"),
        lit("x").as("event_type"))
    assert(graft.operators.Pipeline.peakFdr(flat).count() === 0)
  }

  test("q24 candidates: dense sig_rank and monotone qval PER type; plan partitioned") {
    val df = SparkEntry.queries("q24_peak_fdr")(spark, sf)
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1),
      r.getDouble(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).values.foreach { tr =>
      val sorted = tr.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1L to sorted.length).toSeq)
      assert(sorted.sliding(2).forall {
        case Array(a, b) => a._3 <= b._3
        case _ => true
      }, "BH q-values must be nondecreasing in significance rank")
    }
    // the round-14 point: NO partition-less window anywhere in q21 or
    // q24 — a multi-year bin table never funnels through one task
    // (PlanAuditSpec enforces this fleet-wide; asserted here at the
    // operator for locality)
    Seq("q21_peak_local", "q24_peak_fdr").foreach { k =>
      val plan = SparkEntry.queries(k)(spark, sf)
        .queryExecution.executedPlan
      val bare = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
      }
      assert(bare.isEmpty, s"$k still plans a partition-less window")
    }
  }

  test("q23_interval_file: file-backed intervals ≡ literal bands, hash join") {
    val fromFile = SparkEntry.queries("q23_interval_file")(spark, sf)
    val plan = fromFile.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      "interval join must stay a binned equi-join when intervals come from a file")
    val a = fromFile.collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getDouble(2)))).toMap
    val b = SparkEntry.queries("q11_interval_count")(spark, sf).collect()
      .map(r => (r.getInt(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(a === b)
  }

  test("intervalJoin: degenerate intervals match nothing and cost nothing") {
    import spark.implicits._
    val facts = Seq(5.0, 15.0, 25.0).toDF("x")
    val intervals = Seq(
      (1, 0.0, 10.0),     // normal
      (2, 20.0, 20.0),    // empty [20, 20)
      (3, 30.0, -1e12)    // malformed hi << lo: must NOT explode bins
    ).toDF("band_id", "lo", "hi")
    val out = graft.operators.Pipeline
      .intervalJoin(facts, intervals, "x", 10.0)
      .select("band_id", "x").collect().map(r => (r.getInt(0), r.getDouble(1)))
    assert(out.toSet === Set((1, 5.0)))
  }

  test("q13_metrics: percentages sum to 100") {
    val df = SparkEntry.queries("q13_metrics")(spark, sf)
    val pct = df.collect().map(_.getAs[Double]("pct_orders")).sum
    assert(math.abs(pct - 100.0) < 0.01)
  }

  test("q14_status_pivot: pivot counts match total orders") {
    val df = SparkEntry.queries("q14_status_pivot")(spark, sf)
    val total = df.collect()
      .map(r => r.getAs[Long]("n_f") + r.getAs[Long]("n_o") +
        r.getAs[Long]("n_p")).sum
    assert(total === Tables.orders(spark, sf).count())
  }

  test("q15_topk: k rows, descending revenue") {
    val df = SparkEntry.queries("q15_topk")(spark, sf)
    val revs = df.collect().map(_.getAs[Double]("revenue"))
    assert(revs.length === 10)
    assert(revs.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("q29: funnel depth honors order, window, and missing steps") {
    import spark.implicits._
    // (user, type, micros): 1 converts fully; 2's click precedes its
    // view (order violation -> depth 2); 4 stops at signup; 5's view
    // lands outside the window; 6's purchase precedes signup; 3
    // never signs up and must not appear at all.
    val ev = Seq(
      (1L, "signup", 0L), (1L, "view", 10L), (1L, "click", 20L),
      (1L, "purchase", 30L),
      (2L, "signup", 0L), (2L, "click", 5L), (2L, "view", 10L),
      (3L, "view", 5L),
      (4L, "signup", 0L),
      (5L, "signup", 0L), (5L, "view", 101L),
      (6L, "purchase", 5L), (6L, "signup", 10L)
    ).toDF("user_id", "event_type", "us")
      .select(col("user_id"), col("event_type"),
        timestamp_micros(col("us")).as("ts"))
    val out = graft.operators.Pipeline.funnel(ev, windowUs = 100L)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out === Map(
      4L -> (("purchase", 1L)), // user 1
      2L -> (("view", 1L)),     // user 2: click@5 < view@10 doesn't count
      1L -> (("signup", 3L))))  // users 4, 5, 6
  }

  test("q29: single-pass plan — one user_id exchange feeds the window chain") {
    // the r9 shape: the event sliver shuffles ONCE; t1..t4 are chained
    // per-user window minima over that exchange, and the per-user
    // reduce rides the same partitioning. The only other exchange
    // carries the <= steps rows of final counts.
    val plan = SparkEntry.queries("q29_funnel")(spark, sf)
      .queryExecution.executedPlan.toString
    val windows = "\\bWindow \\[".r.findAllIn(plan).size
    assert(windows === 4, s"expected 4 chained WindowExecs, plan:\n$plan")
    val exchanges = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.size === 2,
      s"expected one user_id exchange + one tiny counts exchange:\n$plan")
    assert(exchanges.count(_.contains("user_id")) === 1, plan)
    assert(exchanges.count(_.contains("step_reached")) === 1, plan)
  }

  test("q30: retention counts conserve users and offset-0 is the cohort") {
    val df = SparkEntry.queries("q30_retention")(spark, sf).collect()
    assert(df.nonEmpty)
    val users = Tables.events(spark, sf)
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select("user_id").distinct.count()
    // every user appears exactly once at offset 0 (their cohort week)
    val atZero = df.filter(_.getAs[Long]("week_offset") == 0L)
      .map(_.getAs[Long]("n_users")).sum
    assert(atZero === users)
    // offsets are non-negative and retained counts never exceed cohort
    val cohortSize = df.filter(_.getAs[Long]("week_offset") == 0L)
      .map(r => r.getAs[Long]("cohort_wk") -> r.getAs[Long]("n_users"))
      .toMap
    df.foreach { r =>
      val off = r.getAs[Long]("week_offset")
      assert(off >= 0L)
      assert(r.getAs[Long]("n_users") <=
        cohortSize(r.getAs[Long]("cohort_wk")))
    }
  }

  test("q16_sessionize: sessions partition events, gaps respected") {
    val df = SparkEntry.queries("q16_sessionize")(spark, sf)
    val total = df.collect().map(_.getAs[Long]("n_events")).sum
    assert(total === Tables.events(spark, sf).count())
    // session spans are consistent
    assert(df.filter("session_end_us < session_start_us").count() === 0)
  }

  test("q17_running_window: last running total equals customer total") {
    val df = SparkEntry.queries("q17_running_window")(spark, sf)
    assert(df.count() === Tables.orders(spark, sf).count())
  }

  test("q18_rollup: grand total row present and consistent") {
    val df = SparkEntry.queries("q18_rollup")(spark, sf)
    val grand = df.filter("region_name = 'ALL' AND nation_name = 'ALL'")
      .collect()
    assert(grand.length === 1)
    assert(grand(0).getAs[Long]("n_customers") ===
      Tables.customer(spark, sf).count())
  }

  test("q26: two-phase grouped top-k equals the naive per-group window") {
    import org.apache.spark.sql.expressions.Window
    val orders = Tables.orders(spark, sf)
    val out = SparkEntry.queries("q26_grouped_topk")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    // naive reference: full window over every (group, customer) row
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("cents").desc, col("o_custkey").asc)
    val naive = orders
      .groupBy(col("o_orderpriority"), col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100, 0).cast("long"))
        .as("cents"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= 3)
      .select(col("o_orderpriority"), col("o_custkey"),
        (col("cents") / 100.0).as("spend"), col("rnk"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSet
    assert(out === naive, "salt-bucket prune must be lossless")
    assert(out.nonEmpty)
    // every group contributes exactly k (groups here all have >= k members)
    out.groupBy(_._1).foreach { case (g, rows) =>
      assert(rows.size === 3, s"group $g")
      assert(rows.map(_._4) === Set(1L, 2L, 3L))
    }
  }

  test("q26: the exact-rank window runs on pruned candidates only") {
    val df = SparkEntry.queries("q26_grouped_topk")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // two windows: the per-(group, salt) local top-k below, the
    // per-group exact rank above, with the local-rank filter between
    assert(plan.linesIterator.count(_.trim.startsWith("Window")) >= 2
      || plan.split("Window").length > 2,
      "local salt-bucket window must prune before the exact-rank window")
    assert(plan.contains("_salt"),
      "phase 1 must partition by (group, salt)")
    // and no whole-bucket aggregation buffer anywhere
    assert(!plan.contains("collect_list"),
      "local top-k must be a spillable window sort, not an in-memory buffer")
  }

  test("q33: drift numerators match a hand computation; identical slices drift zero") {
    import spark.implicits._
    // A: 3 docs in bin 0, 1 in bin 1 (N_a=4); B: 1 and 3 (N_b=4)
    // drift_num per bin = |c_a*4 - c_b*4| = 8 in both bins
    val docs = Seq(
      (1L, "en", 10L), (2L, "en", 20L), (3L, "en", 30L), (4L, "en", 70L),
      (5L, "de", 15L), (6L, "de", 80L), (7L, "de", 90L), (8L, "de", 100L))
      .toDF("doc_id", "lang", "n_chars")
    val out = graft.operators.Pipeline.distDrift(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out === Map(0L -> ((3L, 1L, 8L)), 1L -> ((1L, 3L, 8L))))
    // a slice compared against an identically-distributed one drifts
    // zero in every bin even when the sizes differ (proportions, not
    // counts — the reason for the cross-multiply)
    val scaled = Seq(
      (1L, "en", 10L), (2L, "en", 70L),
      (5L, "de", 15L), (6L, "de", 16L), (7L, "de", 75L), (8L, "de", 76L))
      .toDF("doc_id", "lang", "n_chars")
    val zero = graft.operators.Pipeline.distDrift(scaled).collect()
    assert(zero.nonEmpty && zero.forall(_.getLong(3) === 0L))
    // one scan; the totals window runs on #bins rows only
    val plan = graft.operators.Pipeline
      .distDrift(Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString
    assert(plan.split("FileScan").length == 2, "one documents scan")
  }

  test("q34: Gini numerator matches hand computation; uniform coverage is zero") {
    import spark.implicits._
    val hourUs = 3600L * 1000000L
    def ev(hour: Long, ids: Range) =
      ids.map(i => (i.toLong, hour * hourUs, 7L))
    // bins of 1, 2, 3 events: sorted x=[1,2,3], n=3 →
    // (2·1−4)·1 + (2·2−4)·2 + (2·3−4)·3 = −2 + 0 + 6 = 4
    val skewed = (ev(0, 1 to 1) ++ ev(1, 2 to 3) ++ ev(2, 4 to 6))
      .toDF("event_id", "ts_us", "user_id")
      .select(col("event_id"), expr("timestamp_micros(ts_us)").as("ts"),
        col("user_id"))
    val r = graft.operators.Pipeline.evenness(skewed).head
    assert(r.getAs[Long]("n_bins") === 3L)
    assert(r.getAs[Long]("total_events") === 6L)
    assert(r.getAs[Long]("gini_num") === 4L)
    assert(r.getAs[Long]("min_bin") === 1L && r.getAs[Long]("max_bin") === 3L)
    assert(r.getAs[Double]("median_bin") === 2.0)
    // perfectly uniform coverage has Gini exactly zero
    val uniform = (ev(0, 1 to 2) ++ ev(1, 3 to 4) ++ ev(2, 5 to 6))
      .toDF("event_id", "ts_us", "user_id")
      .select(col("event_id"), expr("timestamp_micros(ts_us)").as("ts"),
        col("user_id"))
    assert(graft.operators.Pipeline.evenness(uniform)
      .head.getAs[Long]("gini_num") === 0L)
  }

  test("q31: planted spike is the one flagged event; real data matches BigInt replay") {
    import spark.implicits._
    // 20 quiet events + one spike: z = 94286/21603 ≈ 4.4 > 3; the
    // quiet ones sit at z ≈ 0.22. With only a handful of events a
    // single spike inflates sigma past its own deviation (max z ≈
    // sqrt(n)), so the planted user needs n = 21 for the spike to
    // clear 3 — that arithmetic fact is itself worth pinning here.
    val ev = ((1 to 20).map(i => (7L, i.toLong, 10.0)) :+ (7L, 99L, 1000.0))
      .toDF("user_id", "event_id", "value")
    val flagged = graft.operators.Pipeline.outliers(ev).collect()
    assert(flagged.length === 1)
    assert(flagged.head.getLong(1) === 99L &&
      flagged.head.getLong(2) === 100000L &&
      flagged.head.getLong(3) === 21L)
    // real corpus: every flag agrees with an exact BigInt replay
    val events = Tables.events(spark, sf)
      .filter(col("user_id").isNotNull && col("value").isNotNull)
      .select(col("user_id"), col("event_id"), col("value")).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDouble(2) * 100)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
    val byUser = events.groupBy(_._1)
    val want = byUser.flatMap { case (u, es) =>
      val n = BigInt(es.length)
      val s = BigInt(es.map(_._3).sum)
      val q = es.map(e => BigInt(e._3) * BigInt(e._3)).sum
      es.filter { case (_, _, c) =>
        val d = n * c - s
        n >= 2 && d * d * (n - 1) > 9 * n * (n * q - s * s)
      }.map(e => (u, e._2, e._3, es.length.toLong)).toSeq
    }.toSet
    val got = SparkEntry.queries("q31_outlier")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === want)
    assert(got.nonEmpty, "the corpus must exercise the non-empty path")
    // one exchange (user_id), no join back for the moments
    val plan = SparkEntry.queries("q31_outlier")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange hashpartitioning").length == 2,
      "moments must ride ONE user_id exchange as window aggregates")
    assert(!plan.contains("Join"), "no groupBy+join-back")
  }

  test("q38: each event lands in exactly window/slide hopping windows") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val s = 1800L * 1000000L
    val t0 = 500000L * 3600L * 1000000L // an exact slide boundary
    val t1 = t0 + 17L * 1000000L       // mid-slide
    val ev = Seq((t0, "a", 1.25), (t1, "b", 2.0))
      .toDF("ts_us", "event_type", "value")
      .select(timestamp_micros(col("ts_us")).as("ts"),
        col("event_type"), col("value"))
    val got = graft.operators.Pipeline.slidingWindow(ev).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    // [start, start + w): a boundary event belongs to the window that
    // STARTS at it plus the 3 windows still covering it — never the
    // one that ends there
    val wantA = (0L to 3L).map(i => (t0 - i * s, "a", 1L, 125L)).toSet
    val wantB = (0L to 3L).map(i => (t0 - i * s, "b", 1L, 200L)).toSet
    assert(got === (wantA ++ wantB),
      s"boundary + mid-slide events each in exactly 4 windows: $got")
  }

  test("q38: harness totals replicate x4; tumbling degenerate equals q10 counts") {
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf)
    val n = ev.count()
    val q38 = SparkEntry.queries("q38_sliding_window")(spark, sf)
    assert(q38.agg(sum(col("n_events"))).head.getLong(0) === 4L * n)
    // slide == window -> plain tumbling bins, counts equal q10's
    val tumbling = graft.operators.Pipeline
      .slidingWindow(ev, 3600L, 3600L).collect()
      .map(r => (r.getLong(0) / 3600000000L, r.getString(1)) -> r.getLong(2))
      .toMap
    val q10 = graft.operators.Pipeline.binCoverage(ev).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(tumbling === q10)
  }

  test("q37: each gate fails for exactly its planted reason; pass is the conjunction") {
    import spark.implicits._
    val customers = Seq(1L, 2L, 3L, 4L).toDF("c_custkey")
    // cust 1: no orders at all        -> g_has_data = 0
    // cust 2: 2 orders (both F)       -> g_min_volume = 0
    // cust 3: 10 orders, 1 F (10%)    -> g_status = 0 (needs >= 20%)
    // cust 4: 5 orders, 1 F (20%)     -> all gates pass (boundary IN)
    val orders = ((1 to 2).map(i => (2L, s"o2$i", "F")) ++
      (1 to 10).map(i => (3L, s"o3$i", if (i == 1) "F" else "O")) ++
      (1 to 5).map(i => (4L, s"o4$i", if (i == 1) "F" else "O")))
      .toDF("o_custkey", "o_id", "o_orderstatus")
    val got = graft.operators.Pipeline.qcGate(customers, orders).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(3), r.getInt(4), r.getInt(5), r.getInt(6))).toMap
    assert(got(1L) === ((0, 0, 0, 0)), "absent sample fails has_data (and all)")
    assert(got(2L) === ((1, 0, 1, 0)), "thin sample fails only min_volume")
    assert(got(3L) === ((1, 1, 0, 0)), "low-F sample fails only status")
    assert(got(4L) === ((1, 1, 1, 1)), "boundary 20% passes everything")
  }

  test("q37: dimension-side entry — every customer appears exactly once") {
    val customers = Tables.customer(spark, sf)
    val out = SparkEntry.queries("q37_qc_gate")(spark, sf).collect()
    assert(out.length === customers.count())
    out.foreach { r =>
      assert(r.getInt(6) === r.getInt(3) * r.getInt(4) * r.getInt(5),
        "qc_pass must be the gate conjunction")
    }
  }

  test("q36: summit is the argmax bin, leftmost on ties, offset from start") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 50 background bins of 1 event; a 3-bin burst (6, 9, 9) whose
    // summit must be the LEFTMOST 9; an isolated single-bin peak (8)
    // whose summit offset must be 0. Background mean+2σ ≈ 5.25, so
    // exactly those four bins enrich.
    val base = 500000L
    val counts = (0L until 50L).map(b => (base - 60L + b) -> 1) ++
      Seq(base -> 6, (base + 1L) -> 9, (base + 2L) -> 9, (base + 10L) -> 8)
    val ev = counts.flatMap { case (b, n) => (0 until n).map(_ => b) }
      .toDF("bin")
      .select(timestamp_micros(col("bin") * 3600L * 1000000L).as("ts"))
    val got = graft.operators.Pipeline.peakSummits(ev).collect()
      .map(r => (r.getAs[Long]("peak_start"), r.getAs[Long]("peak_end"),
        r.getAs[Long]("n_bins"), r.getAs[Long]("total_events"),
        r.getAs[Long]("summit_bin"), r.getAs[Long]("summit_events"),
        r.getAs[Long]("summit_offset"))).toSet
    assert(got === Set(
      (base, base + 2L, 3L, 24L, base + 1L, 9L, 1L),
      (base + 10L, base + 10L, 1L, 8L, base + 10L, 8L, 0L)),
      s"planted summit geometry: $got")
  }

  test("q36: summit columns extend q12's islands without changing them") {
    val q12 = SparkEntry.queries("q12_peak_detect")(spark, sf).collect()
      .map(r => (r.getAs[Long]("peak_start"), r.getAs[Long]("peak_end"),
        r.getAs[Long]("n_bins"), r.getAs[Long]("total_events"))).toSet
    val q36 = SparkEntry.queries("q36_peak_summits")(spark, sf).collect()
    val islands = q36.map(r => (r.getAs[Long]("peak_start"),
      r.getAs[Long]("peak_end"), r.getAs[Long]("n_bins"),
      r.getAs[Long]("total_events"))).toSet
    assert(islands === q12, "same islands as q12")
    q36.foreach { r =>
      val (s, e) = (r.getAs[Long]("peak_start"), r.getAs[Long]("peak_end"))
      val sb = r.getAs[Long]("summit_bin")
      assert(sb >= s && sb <= e, "summit inside its island")
      assert(r.getAs[Long]("summit_offset") === sb - s)
    }
  }

  test("q41: bucketed overlap join equals the naive pair scan, hash-joined") {
    val events = Tables.events(spark, sf)
    val out = SparkEntry.queries("q41_interval_join")(spark, sf)
    val rows = out.collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("tp_start"),
        r.getAs[Long]("tp_end"), r.getAs[Long]("gp_start"),
        r.getAs[Long]("gp_end"), r.getAs[Long]("overlap_bins")))
    assert(rows.nonEmpty, "harness peaks must overlap the consensus")
    // naive reference: collect both interval sets, cross in Scala
    val binUs = 3600L * 1000000L
    val raw = events
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("event_type"), graft.Tables.epochUs(col("ts")).as("us"))
      .collect()
      .map(r => (r.getString(0), Math.floorDiv(r.getLong(1), binUs)))
    def islands(bins: Map[Long, Long]): Seq[(Long, Long)] = {
      val ns = bins.values.map(_.toDouble)
      val mean = ns.sum / ns.size
      val sd = math.sqrt(ns.map(v => (v - mean) * (v - mean)).sum / ns.size)
      val enriched = bins.filter(_._2 > mean + 2 * sd).keys.toSeq.sorted
      enriched.foldLeft(List.empty[(Long, Long)]) {
        case ((s, e) :: rest, b) if b == e + 1 => (s, b) :: rest
        case (acc, b) => (b, b) :: acc
      }.reverse
    }
    val global = islands(raw.groupBy(_._2).view
      .mapValues(_.length.toLong).toMap)
    val expected = raw.groupBy(_._1).toSeq.flatMap { case (tpe, rs) =>
      val tp = islands(rs.groupBy(_._2).view
        .mapValues(_.length.toLong).toMap)
      for {
        (ts, te) <- tp
        (gs, ge) <- global
        if ts <= ge && gs <= te
      } yield (tpe, ts, te, gs, ge,
        math.min(te, ge) - math.max(ts, gs) + 1)
    }
    assert(rows.toSet === expected.toSet)
    // the bucketed rewrite must plan as an EQUI hash join — the
    // whole point vs the naive non-equi nested loop
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), s"q41 must equi-join:\n$plan")
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"expected a hash/merge join on bucket:\n$plan")
  }

  test("q40: complement equals an in-memory reference and tiles the domain") {
    val events = Tables.events(spark, sf)
    val out = SparkEntry.queries("q40_interval_complement")(spark, sf)
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("gap_start"),
        r.getAs[Long]("gap_end"), r.getAs[Long]("n_bins_gap")))
    // independent reference: plain Scala over the collected events
    val binUs = 3600L * 1000000L
    val raw = events
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("event_type"), graft.Tables.epochUs(col("ts")).as("us"))
      .collect()
      .map(r => (r.getString(0), Math.floorDiv(r.getLong(1), binUs)))
    val expected = raw.groupBy(_._1).toSeq.flatMap { case (tpe, rows) =>
      val counts = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      val ns = counts.values.map(_.toDouble)
      val mean = ns.sum / ns.size
      val sd = math.sqrt(ns.map(v => (v - mean) * (v - mean)).sum / ns.size)
      val thresh = mean + 2 * sd
      val enriched = counts.filter(_._2 > thresh).keys.toSeq.sorted
      // adjacency islands
      val peaks = enriched.foldLeft(List.empty[(Long, Long)]) {
        case ((s, e) :: rest, b) if b == e + 1 => (s, b) :: rest
        case (acc, b) => (b, b) :: acc
      }.reverse
      val domS = counts.keys.min
      val domE = counts.keys.max
      val bounds = ((domS - 1) +:
        peaks.flatMap { case (s, e) => Seq(s, e) }) :+ (domE + 1)
      // gaps are the open ranges between consecutive peak edges
      val gaps = bounds.grouped(2).toSeq.collect {
        case Seq(prevEnd, nextStart) if nextStart - prevEnd > 1 =>
          (tpe, prevEnd + 1, nextStart - 1, nextStart - prevEnd - 1)
      }
      gaps
    }
    assert(out.toSet === expected.toSet,
      s"engine ${out.toSeq.sorted} vs reference ${expected.sorted}")
    assert(out.nonEmpty)
    // tiling: per type, gaps are disjoint and inside the domain
    out.groupBy(_._1).foreach { case (_, gs) =>
      val sorted = gs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 < b._2, s"overlap: $a $b")
        case _ => ()
      }
      gs.foreach(g => assert(g._4 == g._3 - g._2 + 1))
    }
  }
  test("q44: hierarchical ranks equal the plain window on real events") {
    import org.apache.spark.sql.expressions.Window
    val events = Tables.events(spark, sf)
    val got = graft.operators.Pipeline.exactQuantiles(events).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    val w = Window.partitionBy(col("event_type")).orderBy(col("v"))
    val cw = Window.partitionBy(col("event_type"))
    val ref = events
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(col("event_type"),
        round(col("value") * 100, 0).cast("long").as("v"))
      .withColumn("rnk", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(cw))
      .groupBy(col("event_type"))
      .agg(max(col("cnt")).as("n"),
        max(when(col("rnk") === ((col("cnt") + 1) / 2)
          .cast("long"), col("v"))).as("p50"),
        max(when(col("rnk") === ((col("cnt") * 9 + 9) / 10)
          .cast("long"), col("v"))).as("p90"),
        max(when(col("rnk") === ((col("cnt") * 99 + 99) / 100)
          .cast("long"), col("v"))).as("p99"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(got === ref)
    assert(got.nonEmpty)
  }

  test("q44: offsets and ranks share one scan+exchange; bounds is the 2nd scan") {
    val df = graft.operators.Pipeline.exactQuantiles(Tables.events(spark, sf))
    df.collect() // AQE reuse is decided at stage materialization
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("ReusedExchange") ||
      plan.contains("ReusedQueryStage"),
      s"q44 must reuse the (type, slice) exchange:\n$plan")
    val scans = plan.linesIterator
      .count(l => l.contains("Scan parquet") && l.contains("events"))
    assert(scans === 2,
      s"q44: bounds pass + rank pass only (found $scans scans)")
  }

  test("q44: exact targets on planted counts incl. the 1-row group") {
    import spark.implicits._
    // type a: n=10 -> p50 = 5th of 10..100 = 50c; p90 = 9th = 90c;
    // p99 = ceil(9.9) = 10th = 100c. type b: n=1 -> all three = 7c.
    val rows = (1 to 10).map(i =>
      (i.toLong, "a", 100L + i, 0.10 * i)) ++ Seq(
      (99L, "b", 200L, 0.07),
      (98L, null.asInstanceOf[String], 201L, 0.42)) // NULL type group
    val ev = rows.toDF("event_id", "event_type", "user_id", "value")
      .withColumn("ts", org.apache.spark.sql.functions.lit(1L))
    val out = graft.operators.Pipeline.exactQuantiles(ev).collect()
      .map(r => Option(r.getString(0)) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(out(Some("a")) === ((10L, 50L, 90L, 100L)))
    assert(out(Some("b")) === ((1L, 7L, 7L, 7L)))
    // NULL event_type survives the null-safe metadata joins
    assert(out(None) === ((1L, 42L, 42L, 42L)))
  }

}
