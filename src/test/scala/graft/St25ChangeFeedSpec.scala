package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TimeTravel

class St25ChangeFeedSpec extends AnyFunSuite {
  import TestSpark._

  test("st25: drained CDF consumer equals a direct aggregate of the head") {
    val docs = Tables.documents(spark, sf)
    // independent catalog with the same deterministic commits the
    // operator stages internally — the expected head is v3
    val cat = graft.Staging.dir("graft_st25spec_")
    TimeTravel.stageBase(docs, cat)
    TimeTravel.commitChanges(docs, cat)
    TimeTravel.commitVersion(spark, cat,
      TimeTravel.cloneChangelog(TimeTravel.readAt(spark, cat, 2)), "c3")
    val want = TimeTravel.readAt(spark, cat, 3)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("doc_id")).cast("long").as("key_checksum"),
        coalesce(sum(length(col("text"))).cast("long"), lit(0L))
          .as("chars_checksum"))
      .collect().map(_.toSeq).toSet
    val got = graft.streaming.StreamOps.streamChangeFeed(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(got === want,
      "incrementally maintained summary must equal the v3 head")
    // the head equality is only meaningful if BOTH deltas were
    // applied: v2's alone misses ' v3' rows, v3's alone misses ' v2'
    val v2Only = TimeTravel.readAt(spark, cat, 2)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    val headN = got.map(r => Option(r.head.asInstanceOf[String]) ->
      r(1).asInstanceOf[Long]).toMap
    assert(headN !== v2Only.map(identity),
      "the second delta must actually change some partition count")
    // the NULL partition is maintained through the feed like any
    // other (k12's lesson, carried into the consumer)
    assert(got.exists(_.head == null), "NULL-lang row must survive")
    // deterministic: a re-run (fresh summary chain over the memoized
    // feed) folds to the identical state
    val again = graft.streaming.StreamOps.streamChangeFeed(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(again === got)
  }
}
