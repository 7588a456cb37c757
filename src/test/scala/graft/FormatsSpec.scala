package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Formats

class FormatsSpec extends AnyFunSuite {
  import TestSpark._

  test("k05: ORC round trip preserves every row; scan prunes partitions") {
    val docs = Tables.documents(spark, sf)
    val out = Formats.orcRoundtrip(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // equality with the same aggregate over the parquet original —
    // any row lost/duplicated/corrupted by the format hop flips a
    // count or checksum
    val want = docs.filter(col("lang").isin("en", "de"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).cast("long").as("cc"),
        sum(col("doc_id")).cast("long").as("kc"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out === want)
    assert(out.nonEmpty && out.keySet.forall(k => Set("en", "de")(k._1)))
    // the lang predicate must reach the ORC scan as a PARTITION
    // filter (directory pruning), not a post-scan row filter
    val plan = Formats.orcRoundtrip(docs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("lang"),
      s"lang must prune partitions, plan was:\n$plan")
  }
}
