package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SketchLedger

/** k13: the materialized sketch ledger — readouts must track exact
  * distinct counts (DataSketches HLL is exact in sparse mode at these
  * cardinalities, estimated within ~5% beyond), exact counters must
  * be EXACT, and the ledger must build once per (session, cacheKey).
  */
class SketchLedgerSpec extends AnyFunSuite {
  import TestSpark._

  private def exactByDay = {
    val e = Tables.events(spark, sf)
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(to_date(col("ts")).as("day"), col("event_type"),
        col("user_id"))
    e.groupBy(col("day"), col("event_type"))
      .agg(countDistinct(col("user_id")).as("u"),
        count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getDate(0).toString, r.getString(1)) ->
        ((r.getLong(2), r.getLong(3))))
      .toMap
  }

  test("k13: daily and rolling readouts track exact distincts") {
    val exact = exactByDay
    val rows = SparkEntry.queries("k13_sketch_ledger")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    // rebuild the exact rolling answer per (type, day): trailing
    // 7-day distinct users over the raw slice
    val raw = Tables.events(spark, sf)
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(to_date(col("ts")).as("day"), col("event_type"),
        col("user_id"))
      .collect()
      .map(r => (r.getDate(0).toLocalDate, r.getString(1), r.getLong(2)))
    rows.foreach { r =>
      val et = r.getString(0)
      val day = java.time.LocalDate.parse(r.getString(1))
      val (exU, exN) = exact((day.toString, et))
      // exact counters are EXACT (they ride the ledger as longs)
      assert(r.getAs[Long]("n_events") === exN)
      val w = raw.filter { case (d, t, _) =>
        t == et && !d.isAfter(day) && !d.isBefore(day.minusDays(6))
      }
      assert(r.getAs[Long]("n_events_roll") === w.size.toLong)
      def close(est: Long, ex: Long, tag: String): Unit =
        assert(math.abs(est - ex) <= math.max(2.0, ex * 0.05),
          s"$tag: est=$est exact=$ex")
      close(r.getAs[Long]("uniques_day"), exU, s"day $et $day")
      close(r.getAs[Long]("uniques_roll"),
        w.map(_._3).distinct.size.toLong, s"roll $et $day")
    }
  }

  test("k13: ledger builds once per cacheKey (memoized staging)") {
    val e = Tables.events(spark, sf)
    val first = SketchLedger.ledger(e, cacheKey = sf).inputFiles.toSet
    val second = SketchLedger.ledger(e, cacheKey = sf).inputFiles.toSet
    assert(first === second && first.nonEmpty,
      "repeat readouts must hit the same staged ledger files")
  }

  test("st14: incrementally-landed ledger readout equals batch k13") {
    // Sketch MERGEABILITY on the finite harness: per-micro-batch
    // partial sketches union to the same ledger the single-pass
    // build produces, so the readouts must agree row for row (at
    // these cardinalities DataSketches HLL is in exact sparse mode;
    // exact counters must agree regardless).
    val batch = SparkEntry.queries("k13_sketch_ledger")(spark, sf)
    val stream = SparkEntry.queries("st14_stream_ledger")(spark, sf)
    assert(stream.count() > 0)
    assert(stream.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(stream).count() === 0)
  }

  test("st14: a replayed micro-batch rewrites its partial, never dups") {
    import org.apache.spark.sql.functions.to_date
    val e = Tables.events(spark, sf)
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(to_date(col("ts")).as("day"), col("event_type"),
        col("user_id"))
    val out = graft.Staging.dir("graft_st14_retry_")
    graft.streaming.StreamOps.writeLedgerPartial(e, 0L, out)
    def total() = graft.streaming.StreamOps
      .foldLedgerPartials(spark, out)
      .agg(sum(col("n_events"))).collect()(0).getLong(0)
    val first = total()
    graft.streaming.StreamOps.writeLedgerPartial(e, 0L, out)
    assert(total() === first,
      "replay must be idempotent via the b<id> overwrite")
  }

  test("k13: readout plan folds sketches, never rescans events") {
    // the registered query's plan must read the LEDGER parquet, and
    // the only events scan allowed is the (memoized) build — once
    // built, the readout plan contains no events.parquet scan
    val df = SparkEntry.queries("k13_sketch_ledger")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("events.parquet"),
      s"readout must fold stored sketches, not rescan events:\n$plan")
    assert(plan.contains("graft_k13_"))
  }
}
