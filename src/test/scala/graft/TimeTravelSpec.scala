package graft

import java.nio.file.{Files, Paths}
import java.security.MessageDigest
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TimeTravel

class TimeTravelSpec extends AnyFunSuite {
  import TestSpark._

  /** Relative path -> md5 of file CONTENT for every parquet file
    * under `dir` — the listing the snapshot-isolation contract is
    * pinned on (paths + bytes, not just sizes).
    */
  private def digests(dir: String): Map[String, String] = {
    val root = Paths.get(dir)
    if (!Files.exists(root)) Map.empty
    else Files.walk(root).iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet"))
      .map { p =>
        val md = MessageDigest.getInstance("MD5")
        root.relativize(p).toString ->
          md.digest(Files.readAllBytes(p)).map("%02x".format(_)).mkString
      }.toMap
  }

  test("k14: c1 survives the v2 commit byte-identical (snapshot isolation)") {
    val docs = Tables.documents(spark, sf)
    val dir = graft.Staging.dir("graft_k14spec_")
    // bracket the commit: snapshot c1 BETWEEN the two commits
    TimeTravel.stageBase(docs, dir)
    val before = digests(s"$dir/c1")
    assert(before.nonEmpty)
    TimeTravel.commitChanges(docs, dir)
    assert(digests(s"$dir/c1") === before,
      "the v2 commit must not touch any c1 file")
    // v1 read-back IS the original corpus, row for row
    val want = docs.select(col("doc_id"), col("source"), col("text"),
      col("lang")).collect().map(_.toSeq).toSet
    val got = TimeTravel.readAt(spark, dir, 1)
      .select(col("doc_id"), col("source"), col("text"), col("lang"))
      .collect().map(_.toSeq).toSet
    assert(got === want, "v1 must equal the pre-image exactly")
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
    val c2Langs = digests(s"$dir/c2").keys
      .flatMap(_.split("/").find(_.startsWith("lang="))).toSet
    assert(c2Langs ===
      graft.sources.PartitionUpsert.ChangedLangs.map(l => s"lang=$l").toSet)
  }

  test("k14: manifests are metadata-cardinality; readAt lists only manifest dirs") {
    val docs = Tables.documents(spark, sf)
    val dir = TimeTravel.stageVersions(docs, cacheKey = sf)
    Seq(1, 2).foreach { v =>
      val m = spark.read.parquet(s"$dir/meta/v$v")
      assert(m.count() <= 64, "manifest must stay partition-cardinality")
    }
    // the v2 read's file indexes are built from EXPLICIT manifest
    // directories (no tree crawl): changed langs from c2, the rest
    // from c1 — and the c1 scan's location must NOT include the
    // changed langs' directories
    val plan = TimeTravel.readAt(spark, dir, 2)
      .queryExecution.executedPlan.toString
    val scans = plan.linesIterator
      .filter(_.contains("FileScan parquet")).toList
    assert(scans.exists(l => l.contains("/c2/lang=")), s"c2 scan:\n$plan")
    val c1Scan = scans.find(_.contains("/c1/lang="))
    assert(c1Scan.nonEmpty, s"c1 scan:\n$plan")
    graft.sources.PartitionUpsert.ChangedLangs.foreach { l =>
      assert(!c1Scan.get.contains(s"/c1/lang=$l"),
        s"c1's file index must exclude the superseded lang=$l")
    }
  }
}
