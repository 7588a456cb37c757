package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamOps

class StreamOpsSpec extends AnyFunSuite {
  import TestSpark._

  private def sortedRows(rows: Array[Row]): Seq[Seq[Any]] =
    rows.map(_.toSeq.map(String.valueOf)).map(_.toSeq).toSeq.sortBy(_.mkString("|"))

  test("st01: streaming windowed agg equals the batch aggregation") {
    val stream = StreamOps.streamWindow(spark, sf).collect()
    val batch = Tables.events(spark, sf)
      .groupBy(
        expr("unix_micros(ts) DIV 21600000000").as("bin_id"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .collect()
    assert(stream.nonEmpty)
    assert(sortedRows(stream) === sortedRows(batch))
  }

  test("st02: stateful streaming sessions equal batch q16 exactly") {
    val stream = SparkEntry.queries("st02_stream_session")(spark, sf).collect()
    val batch = SparkEntry.queries("q16_sessionize")(spark, sf).collect()
    assert(stream.nonEmpty)
    assert(sortedRows(stream) === sortedRows(batch))
  }

  test("st03: streaming dedup counts equal batch count-distinct") {
    val stream = StreamOps.streamDedup(spark, sf).collect()
    val batch = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .collect()
    assert(stream.nonEmpty)
    assert(sortedRows(stream) === sortedRows(batch))
  }

  test("st02: session state is bounded to one open session per user") {
    // Structural invariant of the state class: session indices per
    // user are dense 1..n (an unbounded-state bug would skip or dup).
    val rows = SparkEntry.queries("st02_stream_session")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    rows.groupBy(_._1).foreach { case (_, ss) =>
      val idx = ss.map(_._2).sorted.toSeq
      assert(idx === (1L to idx.length).toSeq)
    }
  }
}
