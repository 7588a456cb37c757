package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TimeTravel

class TimeTravelSpec extends AnyFunSuite {
  import TestSpark._

  private def listFiles(dir: String): Map[String, Long] = {
    val root = Paths.get(dir)
    if (!Files.exists(root)) Map.empty
    else Files.walk(root).iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
      .map(p => root.relativize(p).toString -> Files.size(p))
      .toMap
  }

  test("k14: v1 is byte-identical after the v2 commit (snapshot isolation)") {
    val docs = Tables.documents(spark, sf)
    // stage WITHOUT memo so this spec owns the lifecycle
    val dir = TimeTravel.stageVersions(docs)
    // the v2 commit is part of staging; c1's files must be exactly
    // the files a v1-only world would hold — no rewrite, no delete
    val c1 = listFiles(s"$dir/c1")
    assert(c1.nonEmpty)
    val v1 = TimeTravel.readAt(spark, dir, 1)
    // v1 read-back IS the original corpus, row for row
    val want = docs.select(col("doc_id"), col("source"), col("text"),
      col("lang")).collect().map(_.toSeq).toSet
    val got = v1.select(col("doc_id"), col("source"), col("text"),
      col("lang")).collect().map(_.toSeq).toSet
    assert(got === want, "v1 must equal the pre-image exactly")
    // and c1 is untouched on disk after staging completed (which
    // included the v2 commit)
    assert(listFiles(s"$dir/c1") === c1)
  }

  test("k14: v2 equals k12's post-apply state; v2 commit wrote only deltas") {
    val docs = Tables.documents(spark, sf)
    val dir = TimeTravel.stageVersions(docs, cacheKey = sf)
    val v2 = TimeTravel.readAt(spark, dir, 2)
    val viaK12 = graft.sources.PartitionUpsert
      .upsertSummary(docs, cacheKey = sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    val got = graft.sources.PartitionUpsert.summarize(v2).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(got === viaK12,
      "time-travel v2 must equal the in-place upsert's final state")
    // delta-only commit: c2 holds ONLY the changed partitions
    val c2Langs = listFiles(s"$dir/c2").keys
      .flatMap(_.split("/").find(_.startsWith("lang="))).toSet
    assert(c2Langs ===
      graft.sources.PartitionUpsert.ChangedLangs.map(l => s"lang=$l").toSet)
  }

  test("k14: manifests are metadata-cardinality; readAt prunes partitions") {
    val docs = Tables.documents(spark, sf)
    val dir = TimeTravel.stageVersions(docs, cacheKey = sf)
    Seq(1, 2).foreach { v =>
      val m = spark.read.parquet(s"$dir/meta/v$v")
      assert(m.count() <= 64, "manifest must stay partition-cardinality")
    }
    // the v2 read plans partition filters: untouched langs come from
    // c1, changed langs from c2 — each scan pruned to its lang set
    val plan = TimeTravel.readAt(spark, dir, 2)
      .queryExecution.executedPlan.toString
    val pruned = plan.linesIterator
      .filter(_.contains("FileScan parquet"))
      .count(l => l.contains("PartitionFilters: [lang") &&
        l.contains(" IN ("))
    assert(pruned === 2,
      s"both commit scans must carry manifest partition filters:\n$plan")
  }
}
