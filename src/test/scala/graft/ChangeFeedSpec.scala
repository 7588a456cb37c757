package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{PartitionUpsert, TimeTravel}

/** k28_change_feed — the O(delta) CDF read over the k14 catalog:
  * content against an independently-derived delta, the manifest-diff
  * scan discipline on actual input files, the insert/whole-partition
  * legs on a planted catalog, and the k22/k21 compositions (a clone's
  * feed scans only diverged partitions; a restore's feed is the bad
  * commit's feed inverted).
  */
class ChangeFeedSpec extends AnyFunSuite {
  import TestSpark._

  private def feedSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1),
      Option(r.getString(2)), r.getLong(3), r.getLong(4))).toSet

  test("k28: v1→v2 feed equals the changelog's arithmetic effect exactly") {
    val docs = Tables.documents(spark, sf)
    val dir = TimeTravel.stageVersions(docs, cacheKey = sf)
    val got = feedSet(TimeTravel.changesBetween(spark, dir, 1, 2))
    // independent expectation straight from the demo changelog's
    // definition (upsert +' v2' for id%3=0 at seq 1, delete id%11=4
    // at seq 2, latest-wins) over the pre-image rows of the changed
    // partitions — no engine code reused
    val want = PartitionUpsert.demoBase(docs)
      .filter(col("lang").isin("en", "de") || col("lang").isNull)
      .select(col("doc_id"), col("lang"), length(col("text")).cast("long"))
      .collect().flatMap { r =>
        val (id, lang, len) = (r.getLong(0), Option(r.getString(1)),
          r.getLong(2))
        if (id % 11 == 4) Some(("delete", id, lang, len, -1L))
        else if (id % 3 == 0) Some(("update", id, lang, len, len + 3L))
        else None
      }.toSet
    assert(want.nonEmpty && got === want)
    assert(!got.exists(_._1 == "insert"),
      "the demo changelog only touches existing keys")
  }

  test("k28: scan set is exactly the two changed trees' partitions (O(delta))") {
    val docs = Tables.documents(spark, sf)
    val dir = TimeTravel.stageVersions(docs, cacheKey = sf)
    val files = TimeTravel.changesBetween(spark, dir, 1, 2).inputFiles
    assert(files.nonEmpty)
    val changed = PartitionUpsert.ChangedPartitionDirs
    files.foreach { f =>
      assert(changed.exists(d =>
        f.contains(s"/c1/$d/") || f.contains(s"/c2/$d/")),
        s"feed scanned a file outside the changed partitions: $f")
    }
    // both sides of a changed partition are present (pre- and post-)
    assert(files.exists(_.contains("/c1/lang=en/")))
    assert(files.exists(_.contains("/c2/lang=en/")))
    // identical manifests → empty feed, ZERO files even listed
    val same = TimeTravel.changesBetween(spark, dir, 2, 2)
    assert(same.inputFiles.isEmpty && same.count() === 0L)
  }

  test("k28: inserts and whole-partition add/remove on a planted catalog") {
    import spark.implicits._
    val base = Seq(
      (1L, "s", "alpha text", "aa"),
      (2L, "s", "beta text", "aa"),
      (3L, "s", "gamma text", "bb"))
      .toDF("doc_id", "source", "text", "lang")
    val dir = graft.Staging.dir("graft_k28plant_")
    PartitionUpsert.writeTree(base, s"$dir/c1")
    TimeTravel.writeManifest(spark, dir, 1,
      TimeTravel.commitLangs(spark, s"$dir/c1")
        .map(TimeTravel.ManifestRow(_, "c1", null)))
    // changelog: update key 1, INSERT new key 10 into aa, delete bb's
    // only row (partition vanishes), INSERT key 20 into brand-new cc
    val changes = Seq(
      (1L, "aa", 1L, "upsert", "alpha text v2"),
      (10L, "aa", 1L, "upsert", "fresh row"),
      (3L, "bb", 1L, "delete", null),
      (20L, "cc", 1L, "upsert", "new partition"))
      .toDF("doc_id", "lang", "seq", "op", "new_text")
    TimeTravel.commitVersion(spark, dir, changes, "c2")
    val got = feedSet(TimeTravel.changesBetween(spark, dir, 1, 2))
    assert(got === Set(
      ("update", 1L, Some("aa"), 10L, 13L),
      ("insert", 10L, Some("aa"), -1L, 9L),
      ("delete", 3L, Some("bb"), 10L, -1L),
      ("insert", 20L, Some("cc"), -1L, 13L)))
    // key 2 (untouched row inside the rewritten aa partition) is
    // filtered before materialization — the feed is the true delta
    assert(!got.exists(_._2 == 2L))
  }

  test("k28 × k22: a clone's feed scans only the diverged partitions") {
    val docs = Tables.documents(spark, sf)
    val (srcDir, dstDir) = TimeTravel.stageClone(docs, cacheKey = sf)
    val feed = TimeTravel.changesBetween(spark, dstDir, 1, 2)
    val changed = TimeTravel.CloneLangs.map("lang=" + _).toSet +
      ("lang=" + "__HIVE_DEFAULT_PARTITION__")
    feed.inputFiles.foreach { f =>
      assert(changed.exists(d => f.contains(s"/$d/")),
        s"clone feed scanned an undiverged partition: $f")
    }
    // the pre-image side reads the SOURCE's immutable trees in place;
    // the post-image side is the clone's own local commit
    assert(feed.inputFiles.exists(_.startsWith("file:" + srcDir) ||
      feed.inputFiles.exists(_.contains(srcDir))))
    assert(feed.inputFiles.exists(_.contains(dstDir)))
    // content: the divergent changelog's arithmetic over clone v1
    val got = feedSet(feed)
    val want = TimeTravel.readAt(spark, dstDir, 1)
      .filter(col("lang").isin("en", "fr") || col("lang").isNull)
      .select(col("doc_id"), col("lang"), length(col("text")).cast("long"))
      .collect().flatMap { r =>
        val (id, lang, len) = (r.getLong(0), Option(r.getString(1)),
          r.getLong(2))
        if (id % 13 == 1) Some(("delete", id, lang, len, -1L))
        else if (id % 7 == 2) Some(("update", id, lang, len, len + 3L))
        else None
      }.toSet
    assert(want.nonEmpty && got === want)
  }

  test("k28 × k21: a restore's feed is the bad commit's feed inverted") {
    val docs = Tables.documents(spark, sf)
    val dir = TimeTravel.stageRestored(docs, cacheKey = sf)
    val bad = feedSet(TimeTravel.changesBetween(spark, dir, 1, 2))
    val rollback = feedSet(TimeTravel.changesBetween(spark, dir, 2, 3))
    val inverted = bad.map {
      case ("insert", id, lang, _, after) => ("delete", id, lang, after, -1L)
      case ("delete", id, lang, before, _) => ("insert", id, lang, -1L, before)
      case ("update", id, lang, before, after) =>
        ("update", id, lang, after, before)
    }
    assert(bad.nonEmpty && rollback === inverted,
      "v2→v3(restore of v1) must be exactly the v1→v2 delta inverted")
    // and v1→v3 is a no-op feed: identical manifests, zero scan
    val noop = TimeTravel.changesBetween(spark, dir, 1, 3)
    assert(noop.inputFiles.isEmpty && noop.count() === 0L)
  }
}
