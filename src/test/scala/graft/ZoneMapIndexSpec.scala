package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ZOrderLayout, ZoneMapIndex}

/** k19: the zone-map manifest must be (a) faithful — its per-file
  * min/max equal a fresh recompute over the tree, one row per data
  * file; (b) skipping — a narrow rectangle's fetch constructs its
  * scan over strictly fewer files than the tree holds, and only
  * manifest-overlapping ones; (c) exact — the fetched rows equal the
  * full-scan filter (no false negatives, boundaries inclusive), and
  * the registered query equals the events-side computation; (d)
  * degrading — an overlap-free rectangle yields a typed empty frame,
  * not an error.
  */
class ZoneMapIndexSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val events = Tables.events(spark, sf)
  private lazy val stagedAll = ZoneMapIndex.stageWithManifest(events, sf)

  test("k19: manifest rows equal a fresh per-file recompute, one per data file") {
    val (dir, manifest, _) = stagedAll
    val want = ZoneMapIndex
      .statsRowsFor(ZOrderLayout.readZOrder(spark, dir))
      .collect().map(_.toSeq).toSet
    val got = ZoneMapIndex.readManifest(spark, manifest)
      .collect().map(_.toSeq).toSet
    assert(got === want)
    val dataFiles = ZOrderLayout.readZOrder(spark, dir).inputFiles.toSet
    assert(got.size === dataFiles.size,
      s"manifest must carry exactly one row per data file " +
        s"(${got.size} rows vs ${dataFiles.size} files)")
    assert(got.nonEmpty)
  }

  test("k19: a narrow rectangle reads only manifest-overlapping files, fewer than the tree") {
    val (dir, manifest, (uLo, uHi, bLo, bHi)) = stagedAll
    // one sixteenth of each axis: small enough that a z-ordered
    // multi-file tree MUST have non-overlapping files to skip
    val (qu1, qu2) = (uLo, uLo + (uHi - uLo + 1L) / 16)
    val (qb1, qb2) = (bLo, bLo + (bHi - bLo + 1L) / 16)
    // _metadata.file_path and Dataset.inputFiles disagree on URI
    // form (file:/// vs file:/) — compare by filesystem path
    def norm(s: String): String = new java.net.URI(s).getPath
    val overlapping = ZoneMapIndex
      .overlappingFiles(spark, manifest, qu1, qu2, qb1, qb2)
      .map(norm).toSet
    val fetched = ZoneMapIndex
      .fetchRectangle(spark, dir, manifest, qu1, qu2, qb1, qb2)
    val readFiles = fetched.inputFiles.map(norm).toSet
    val allFiles =
      ZOrderLayout.readZOrder(spark, dir).inputFiles.map(norm).toSet
    assert(allFiles.size > 4, "need a multi-file tree to prove skipping")
    assert(readFiles.subsetOf(overlapping),
      "the scan must be constructed from the manifest's survivors")
    assert(readFiles.size < allFiles.size,
      s"no files skipped: read ${readFiles.size} of ${allFiles.size}")
  }

  test("k19: fetch equals the full-scan filter — no false negatives, boundaries inclusive") {
    val (dir, manifest, (_, _, bLo, bHi)) = stagedAll
    val tree = ZOrderLayout.readZOrder(spark, dir)
    // anchor the rectangle's corners ON values the tree actually
    // holds so inclusivity is exercised, not vacuously true
    val us = tree.select(col("user_id")).distinct()
      .orderBy(col("user_id")).collect().map(_.getLong(0))
    val (qu1, qu2) = (us(us.length / 3), us(us.length / 2))
    val (qb1, qb2) = (bLo, bHi) // full time axis: user axis alone prunes
    val got = ZoneMapIndex
      .fetchRectangle(spark, dir, manifest, qu1, qu2, qb1, qb2)
      .collect().map(_.toSeq).toSet
    val want = tree
      .filter(col("user_id").between(qu1, qu2) &&
        col("bin_id").between(qb1, qb2))
      .collect().map(_.toSeq).toSet
    assert(got === want)
    assert(got.nonEmpty)
    assert(got.exists(_(1) == qu1) && got.exists(_(1) == qu2),
      "boundary rows must be present — corners chosen off the data?")
  }

  test("k19: registered query equals the events-side third-quarter rectangle") {
    val got = SparkEntry.queries("k19_zonemap_skipping")(spark, sf)
      .collect().map(_.toSeq).toSet
    val (uLo, uHi, bLo, bHi) = ZOrderLayout.bounds(events)
    val uSpan = uHi - uLo + 1L
    val bSpan = bHi - bLo + 1L
    val want = events
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"),
        floor(Tables.epochUs(col("ts")) / ZOrderLayout.BinUs)
          .cast("long").as("bin_id"),
        col("event_type"), col("value"))
      .filter(col("user_id")
        .between(uLo + uSpan / 2, uLo + 3L * uSpan / 4) &&
        col("bin_id").between(bLo + bSpan / 2, bLo + 3L * bSpan / 4))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("user_id")).cast("long").as("user_checksum"),
        sum(col("bin_id")).cast("long").as("bin_checksum"),
        round(sum(col("value")), 4).as("sum_value"))
      .collect().map(_.toSeq).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("k19: an overlap-free rectangle degrades to a typed empty frame") {
    val (dir, manifest, (_, uHi, _, bHi)) = stagedAll
    val empty = ZoneMapIndex
      .fetchRectangle(spark, dir, manifest,
        uHi + 1000L, uHi + 2000L, bHi + 1000L, bHi + 2000L)
    assert(empty.count() === 0L)
    assert(empty.columns.toSeq === Seq("event_id", "user_id", "bin_id",
      "event_type", "value"))
  }
}
