package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Asof

class AsofSpec extends AnyFunSuite {
  import TestSpark._

  private def planted = {
    import spark.implicits._
    // (key, ts, id): u1 anchors at 10 and 30; u2 has none.
    val facts = Seq(
      (1L, 5L, 100L),  // before any anchor -> null
      (1L, 10L, 101L), // ties anchor ts    -> 10 (inclusive >=)
      (1L, 20L, 102L), // between           -> 10
      (1L, 30L, 103L), // ties later anchor -> 30
      (1L, 35L, 104L), // after both        -> 30
      (2L, 50L, 200L)  // keyed to no-anchor user -> null
    ).toDF("k", "t", "id")
    val anchors = Seq((1L, 10L), (1L, 10L), (1L, 30L))
      .toDF("k", "t") // duplicate anchor must not duplicate facts
    (facts, anchors)
  }

  test("q25 kernel: inclusive nearest-predecessor semantics, planted") {
    val (facts, anchors) = planted
    val out = Asof.asofJoin(facts, anchors, "k", "t", "a_ts")
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.getAs[java.lang.Long]("a_ts")).map(_.longValue)).toMap
    assert(out === Map(100L -> None, 101L -> Some(10L), 102L -> Some(10L),
      103L -> Some(30L), 104L -> Some(30L), 200L -> None))
  }

  test("q42 kernel: direction + tolerance semantics, planted") {
    val (facts, anchors) = planted
    def run(dir: String, tol: Long): Map[Long, Option[Long]] =
      Asof.asofTolerance(facts, anchors, "k", "t", dir, tol, "a_ts")
        .collect().map(r => r.getAs[Long]("id") ->
          Option(r.getAs[java.lang.Long]("a_ts")).map(_.longValue)).toMap
    // backward + infinite tolerance == q25's asofJoin exactly
    assert(run("backward", Long.MaxValue) === Map(
      100L -> None, 101L -> Some(10L), 102L -> Some(10L),
      103L -> Some(30L), 104L -> Some(30L), 200L -> None))
    // forward: inclusive at equal ts, next anchor otherwise
    assert(run("forward", Long.MaxValue) === Map(
      100L -> Some(10L), 101L -> Some(10L), 102L -> Some(30L),
      103L -> Some(30L), 104L -> None, 200L -> None))
    // nearest: fact 20 is 10 from both anchors -> tie goes BACKWARD;
    // fact 5 only has a forward candidate; fact 35 only backward
    assert(run("nearest", Long.MaxValue) === Map(
      100L -> Some(10L), 101L -> Some(10L), 102L -> Some(10L),
      103L -> Some(30L), 104L -> Some(30L), 200L -> None))
    // tolerance prunes both sides: 4 cuts fact 5 (gap 5) and
    // fact 35 (gap 5); equal-ts matches (gap 0) survive
    assert(run("nearest", 4L) === Map(
      100L -> None, 101L -> Some(10L), 102L -> None,
      103L -> Some(30L), 104L -> None, 200L -> None))
  }

  test("q42: plan stays one key exchange — no nested-loop join") {
    val plan = SparkEntry.queries("q42_asof_tolerance")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"))
  }

  test("q25 kernel: duplicate anchors never replicate fact rows") {
    val (facts, anchors) = planted
    assert(Asof.asofJoin(facts, anchors, "k", "t").count() === facts.count())
  }

  test("q25: plan is union+window — no nested-loop or cartesian join") {
    val plan = SparkEntry.queries("q25_asof_anchor")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "inequality-join encoding would BNLJ — the union+window must not")
    assert(!plan.contains("CartesianProduct"))
    assert(plan.contains("Window"))
  }

  test("q25: matches per-row brute force on real events") {
    val df = SparkEntry.queries("q25_asof_anchor")(spark, sf)
    val events = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        Tables.epochUs(col("ts")).as("ts_us"))
    val anchors = events.filter(col("event_type") === "signup")
      .collect().map(r => r.getLong(1) -> r.getLong(3))
      .groupBy(_._1)
      .map { case (u, ts) => u -> ts.map(_._2).sorted.toVector }
    val rows = df.collect()
    assert(rows.length ===
      events.filter(col("event_type") =!= "signup").count())
    rows.foreach { r =>
      val expected = anchors
        .getOrElse(r.getAs[Long]("user_id"), Vector.empty[Long])
        .takeWhile(_ <= r.getAs[Long]("ts_us")).lastOption
      val got = Option(r.getAs[java.lang.Long]("anchor_ts_us"))
        .map(_.longValue)
      assert(got === expected, s"event ${r.getAs[Long]("event_id")}")
    }
  }
}
