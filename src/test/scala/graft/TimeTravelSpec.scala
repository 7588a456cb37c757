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
    // v1 read-back IS the demo base (corpus + NULL-lang shadows),
    // row for row — including the hive default partition
    val want = graft.sources.PartitionUpsert.demoBase(docs)
      .collect().map(_.toSeq).toSet
    assert(want.exists(_.last == null),
      "demo base must contain NULL-lang rows")
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
    // (the two changed langs + the NULL partition)
    val c2Langs = digests(s"$dir/c2").keys
      .flatMap(_.split("/").find(_.startsWith("lang="))).toSet
    assert(c2Langs ===
      graft.sources.PartitionUpsert.ChangedPartitionDirs)
  }

  test("k14: manifests are metadata-cardinality; readAt lists only manifest dirs") {
    val docs = Tables.documents(spark, sf)
    val dir = TimeTravel.stageVersions(docs, cacheKey = sf)
    Seq(1, 2).foreach { v =>
      val m = spark.read.parquet(s"$dir/meta/v$v")
      assert(m.count() <= 64, "manifest must stay partition-cardinality")
    }
    // the v2 read's file indexes are built from EXPLICIT manifest
    // directories (no tree crawl): changed partitions from c2, the
    // rest from c1 — asserted on the scan's ACTUAL selected files
    // (Dataset.inputFiles), not the truncated plan string, which
    // elides locations ("..., N more") and can pass vacuously
    val files = TimeTravel.readAt(spark, dir, 2).inputFiles
    assert(files.exists(_.contains("/c2/lang=")), "v2 must scan c2")
    assert(files.exists(_.contains("/c1/lang=")),
      "v2 must inherit unchanged partitions from c1")
    graft.sources.PartitionUpsert.ChangedPartitionDirs.foreach { d =>
      assert(!files.exists(_.contains(s"/c1/$d/")),
        s"c1's file index must exclude the superseded $d")
    }
  }

  test("k14: expire vacuums superseded files; retained versions read unchanged") {
    val docs = Tables.documents(spark, sf)
    val dir = graft.Staging.dir("graft_k14_expire_")
    TimeTravel.stageBase(docs, dir)
    TimeTravel.commitChanges(docs, dir)
    val v2Before = graft.sources.PartitionUpsert
      .summarize(TimeTravel.readAt(spark, dir, 2))
      .collect().map(_.toSeq).toSet
    val c1Before = digests(s"$dir/c1")
    TimeTravel.expire(spark, dir, retainFrom = 2)
    // the v1 manifest is gone, and with it the only references to
    // c1's superseded partitions — exactly those are vacuumed
    assert(!Files.exists(Paths.get(s"$dir/meta/v1")))
    val c1After = digests(s"$dir/c1")
    val changed = graft.sources.PartitionUpsert.ChangedPartitionDirs
    assert(c1After.keys.forall(p =>
      !changed.exists(d => p.startsWith(s"$d/"))),
      "superseded c1 partitions must be deleted")
    // every file v2 still references is byte-identical
    val kept = c1Before.filterNot { case (p, _) =>
      changed.exists(d => p.startsWith(s"$d/")) }
    assert(c1After === kept,
      "retained c1 partitions must survive the vacuum untouched")
    // and the retained version still reads exactly as before
    val v2After = graft.sources.PartitionUpsert
      .summarize(TimeTravel.readAt(spark, dir, 2))
      .collect().map(_.toSeq).toSet
    assert(v2After === v2Before)
    // the expired version is no longer readable
    intercept[Exception] { TimeTravel.readAt(spark, dir, 1).collect() }
    // expiring everything is refused
    intercept[IllegalArgumentException] {
      TimeTravel.expire(spark, dir, retainFrom = 99)
    }
  }

  test("k30: registered post-expire read equals the k12 head exactly") {
    val docs = Tables.documents(spark, sf)
    val got = TimeTravel.retentionSummary(docs)
      .collect().map(_.toSeq).toSet
    val want = graft.sources.PartitionUpsert.upsertSummary(docs)
      .collect().map(_.toSeq).toSet
    assert(got === want,
      "the retained head after expire+vacuum must read as the merged state")
    assert(got.nonEmpty)
  }
}
