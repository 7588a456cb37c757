package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

class SkewSpec extends AnyFunSuite {
  import TestSpark._

  /** 90%-hot-key synthetic skew. */
  private def skewed = {
    import spark.implicits._
    (1 to 2000).map { i =>
      val k = if (i % 10 == 0) (i % 7).toLong else 1L
      (k, i.toLong, i * 1.5)
    }.toDF("k", "row_id", "v")
  }

  private def dim = {
    import spark.implicits._
    (0L to 7L).map(k => (k, s"name_$k")).toDF("dk", "name")
  }

  test("salted join equals the plain join on skewed data") {
    val plain = skewed.join(dim, col("k") === col("dk"))
      .select("row_id", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = Skew.saltedJoin(skewed, dim, "k", "dk", "row_id", 8)
      .select("row_id", "name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted === plain)
    assert(salted.size === 2000)
  }

  test("salted join spreads the hot key over all salt buckets") {
    val salts = skewed
      .withColumn("_salt", pmod(xxhash64(col("row_id")), lit(8L)))
      .filter(col("k") === 1L)
      .groupBy("_salt").count().collect()
    assert(salts.length === 8, "hot key must occupy every salt bucket")
  }

  test("salted aggregation equals the plain aggregation") {
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    val salted = Skew.saltedSumCount(skewed, "k", "v", "row_id", 8)
      .collect()
      .map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(salted.keySet === plain.keySet)
    salted.foreach { case (k, (s, n)) =>
      assert(n === plain(k)._2)
      assert(math.abs(s - plain(k)._1) < 1e-6)
    }
  }

  test("q27: salted plan equals plain group-by on real events, hot key split") {
    val events = Tables.events(spark, TestSpark.sf)
    val out = SparkEntry.queries("q27_skew_agg")(spark, TestSpark.sf)
    val salted = out.collect()
      .map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    val plain = events.groupBy(
        when(col("user_id") < 120, lit(-1L)).otherwise(col("user_id"))
          .as("k"))
      .agg((sum(round(col("value") * 100, 0).cast("long")) / 100.0)
        .as("sum_value"), count(lit(1)).as("n_rows"))
      .collect()
      .map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(salted === plain)
    // the hot key holds ~80% of rows — the plan's phase-1 must key on
    // (k, salt): two distinct aggregate exchanges, not one
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.linesIterator
      .count(l => l.contains("Exchange hashpartitioning")) >= 2,
      "two-phase salted aggregation needs both shuffles")
  }
}
