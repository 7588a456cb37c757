package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketedSpec extends AnyFunSuite {
  import TestSpark._

  test("k02: bucketed join skips the join-side shuffles") {
    val df = SparkEntry.queries("k02_bucketed_join")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"))
    // the only exchange allowed is the post-join groupBy; the two
    // bucketed scans must feed the join directly
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 1, s"bucketed join still shuffles:\n$plan")
    assert(plan.contains("Bucketed: true"), "scan must be bucket-aware")
  }

  test("k02: result equals the unbucketed join") {
    val bucketed = SparkEntry.queries("k02_bucketed_join")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDouble(2))).toSet
    val plain = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"), sum(col("l_quantity")).as("sum_qty"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDouble(2))).toSet
    assert(bucketed === plain)
  }
}
