package graft

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
}
