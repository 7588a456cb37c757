package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

class EditDistanceJoinSpec extends AnyFunSuite {
  import TestSpark._

  test("d17: banded join equals brute force on the real corpus") {
    val docs = Tables.documents(spark, sf)
    val got = Dedup.editDistanceJoin(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force: every pair, no blocking — the lossless contract
    val n = docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        graft.functions.TextOps.normText(col("text")).as("t"))
    val brute = n.select(col("doc_id").as("id_a"), col("t").as("ta"))
      .crossJoin(n.select(col("doc_id").as("id_b"), col("t").as("tb")))
      .filter(col("id_a") < col("id_b"))
      .withColumn("d", levenshtein(col("ta"), col("tb"), 8))
      .filter(col("d") >= 0)
      .select(col("id_a"), col("id_b"), col("d").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got === brute, "length-band blocking must be lossless")
    assert(got.nonEmpty, "the corpus plants near-dup pairs")
    assert(got.exists(_._3 > 0L), "some pair must be a near (not exact) dup")
  }

  test("d17: boundary pairs — |len diff| = maxDist included, k+1 excluded") {
    import spark.implicits._
    val docs = Seq(
      (1L, "aaaaaaaa"),               // len 8, bucket 0 (w=9)
      (2L, "aaaaaaaabbbbbbbb"),       // len 16, bucket 1: dist 8 = cap
      (3L, "ccccccccc"),              // len 9: dist 9 to doc 1 > cap
      (4L, "aaaaaaaa"),               // exact dup of 1: dist 0
      (5L, null.asInstanceOf[String]) // never joins
    ).toDF("doc_id", "text")
    val got = Dedup.editDistanceJoin(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((1L, 2L, 8L), (1L, 4L, 0L), (2L, 4L, 8L)),
      s"boundary semantics broke: $got")
  }

  test("d17: bucket join is a hash join, never a cartesian product") {
    val plan = Dedup.editDistanceJoin(Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      plan.linesIterator.take(12).mkString("\n"))
  }
}
