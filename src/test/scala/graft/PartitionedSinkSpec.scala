package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.PartitionedSink

class PartitionedSinkSpec extends AnyFunSuite {
  import TestSpark._

  test("k01: round trip conserves rows and checksums per partition") {
    val orders = Tables.orders(spark, sf)
    val summary = PartitionedSink.ordersByPriority(orders).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val direct = orders.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum("o_orderkey").as("ck")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(summary === direct)
  }

  test("sink layout: one directory per key, partition pruning on read") {
    val out = Files.createTempDirectory("graft_sink_spec_").toString
    val orders = Tables.orders(spark, sf)
    PartitionedSink.writeAndSummarize(
      orders, "o_orderpriority", "o_orderkey", out).collect()
    val dirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    val nPriorities = orders.select("o_orderpriority").distinct.count()
    assert(dirs.size === nPriorities)
    assert(dirs.forall(_.startsWith("o_orderpriority=")))
    // a filter on the partition column must prune at planning time
    val pruned = spark.read.parquet(out)
      .filter(col("o_orderpriority") === "1-URGENT")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("o_orderpriority"))
    assert(pruned.count() ===
      orders.filter(col("o_orderpriority") === "1-URGENT").count())
  }
}
