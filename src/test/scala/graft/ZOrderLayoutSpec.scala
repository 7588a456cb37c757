package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{SortedLayout, ZOrderLayout}

/** k16: the z-ordered tree must be (a) correct — the rectangle
  * read-back equals the straight-from-events computation, (b)
  * two-dimensionally local — per-file min/max spans are narrow on
  * BOTH user_id and bin_id, where the single-dim foil is narrow on
  * one and blind (full-span) on the other, (c) prunable — both
  * rectangle predicates reach the scan as PushedFilters.
  */
class ZOrderLayoutSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val events = Tables.events(spark, sf)

  private def spans(dir: String, column: String): Seq[Long] =
    SortedLayout.columnRanges(spark, dir, column)
      .map { case (_, lo, hi) => hi - lo }

  private def globalSpan(column: String): Long = {
    val r = events
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"),
        floor(Tables.epochUs(col("ts")) / ZOrderLayout.BinUs)
          .cast("long").as("bin_id"))
      .agg(min(col(column)), max(col(column))).head
    r.getLong(1) - r.getLong(0)
  }

  private def median(xs: Seq[Long]): Long = xs.sorted.apply(xs.size / 2)

  test("k16: rectangle read-back equals the events-side computation") {
    val got = SparkEntry.queries("k16_zorder_layout")(spark, sf)
      .collect().map(_.toSeq).toSet
    val (uLo, uHi, bLo, bHi) = ZOrderLayout.bounds(events)
    val uSpan = uHi - uLo + 1L
    val bSpan = bHi - bLo + 1L
    val want = events
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"),
        floor(Tables.epochUs(col("ts")) / ZOrderLayout.BinUs)
          .cast("long").as("bin_id"),
        col("event_type"), col("value"))
      .filter(col("user_id").between(uLo + uSpan / 4, uLo + uSpan / 2) &&
        col("bin_id").between(bLo + bSpan / 4, bLo + bSpan / 2))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("user_id")).cast("long").as("user_checksum"),
        sum(col("bin_id")).cast("long").as("bin_checksum"),
        round(sum(col("value")), 4).as("sum_value"))
      .collect().map(_.toSeq).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("k16: files are narrow on BOTH dims; the single-sort foil is blind on one") {
    val zDir = ZOrderLayout.stageZOrder(events, cacheKey = sf)
    val tDir = ZOrderLayout.stageTimeSorted(events)
    val uGlobal = globalSpan("user_id")
    val bGlobal = globalSpan("bin_id")
    assert(spans(zDir, "user_id").size > 4, "need a multi-file tree")

    // z-order: the Morton curve's top-level quadrants bound any
    // z-contiguous file to ≤ half the global span on each dim
    // (files straddling a quadrant boundary excepted — hence median)
    assert(median(spans(zDir, "user_id")) <= uGlobal / 2,
      s"z files span too much of user_id (global $uGlobal)")
    assert(median(spans(zDir, "bin_id")) <= bGlobal / 2,
      s"z files span too much of bin_id (global $bGlobal)")

    // the time-sorted foil: perfect on bin_id, every file sees
    // (nearly) the whole user range — the second axis can't prune
    assert(median(spans(tDir, "bin_id")) <= bGlobal / 2)
    assert(median(spans(tDir, "user_id")) >= (uGlobal * 8) / 10,
      "foil should be blind on user_id — is the corpus user-time correlated?")
  }

  test("k16: both rectangle predicates reach the scan") {
    val dir = ZOrderLayout.stageZOrder(events, cacheKey = sf)
    val q = ZOrderLayout.readZOrder(spark, dir)
      .filter(col("user_id").between(10L, 20L) &&
        col("bin_id").between(5L, 9L))
    val plan = q.queryExecution.executedPlan.toString
    val pushed =
      plan.replaceAll("(?s).*PushedFilters: \\[([^\\]]*)\\].*", "$1")
    assert(pushed.contains("user_id") && pushed.contains("bin_id"),
      s"rectangle predicates not pushed to the scan:\n$plan")
  }
}
