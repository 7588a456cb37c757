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

  /** Brute-force ≤maxDist edit-distance pairs — the truth set d18's
    * output must stay inside (soundness) and the planted pairs must
    * come from (recall).
    */
  private def brutePairs(
      docs: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] = {
    val n = docs.filter(col("text").isNotNull)
      .select(col("doc_id"),
        graft.functions.TextOps.normText(col("text")).as("t"))
    n.select(col("doc_id").as("id_a"), col("t").as("ta"))
      .crossJoin(n.select(col("doc_id").as("id_b"), col("t").as("tb")))
      .filter(col("id_a") < col("id_b"))
      .withColumn("d", levenshtein(col("ta"), col("tb"), 8))
      .filter(col("d") >= 0)
      .select(col("id_a"), col("id_b"), col("d").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
  }

  test("d18: finds every planted ≤maxDist pair, emits only true pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    def words(k: Int): String =
      Seq.fill(k)(("a" + rnd.alphanumeric.filter(_.isLetter)
        .take(6).mkString).toLowerCase).mkString(" ")
    // six long documents, each with a typo twin at a planted edit
    // distance in [1, 8]: a ≤8-edit pair on an 80-word doc damages
    // ≤ ~24 of its ~78 trigram shingles, so the 16×4 band curve must
    // propose it — the composed tier's recall contract
    val bases = (0 until 6).map(i => (i * 2 + 1).toLong -> words(80))
    val twins = bases.zipWithIndex.map { case ((id, t), i) =>
      val d = i + 2 // planted distances 2..7
      (id + 1) -> (t.take(t.length - d) + ("z" * d)) // d substitutions
    }
    // unrelated chaff: same length regime, no pair within 8 edits
    val chaff = (100 until 112).map(i => i.toLong -> words(80))
    val docs = (bases ++ twins ++ chaff).toDF("doc_id", "text")
    val got = Dedup.editDistanceJoinBlocked(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val truth = brutePairs(docs)
    assert(got.subsetOf(truth),
      s"d18 emitted a non-pair: ${got -- truth}")
    val planted = bases.map(_._1).map(id => (id, id + 1)).toSet
    val gotIds = got.map(p => (p._1, p._2))
    assert(planted.subsetOf(gotIds),
      s"composed tier missed planted pairs: ${planted -- gotIds}")
    // distance exactness rides the subset check: got's tuples carry
    // dist, and truth's are brute-force exact
  }

  test("d18 ⊆ d17 on the real corpus with identical distances") {
    val docs = Tables.documents(spark, sf)
    val d17 = Dedup.editDistanceJoin(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val d18 = Dedup.editDistanceJoinBlocked(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(d18.nonEmpty, "the corpus's near-dup plants must survive " +
      "the proposal tier")
    d18.foreach { case (ids, dist) =>
      assert(d17.get(ids).contains(dist),
        s"$ids -> $dist not in the lossless tier")
    }
  }

  test("d18: candidate and disposal joins stay hash joins") {
    val plan = Dedup.editDistanceJoinBlocked(Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoop"),
      plan.linesIterator.take(12).mkString("\n"))
  }
}
