package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ZoneMapCompaction, ZoneMapIndex}

/** k20: compaction must be (a) compacting — c1 holds strictly fewer
  * files than the fragments it rewrote; (b) reindexed atomically —
  * v2's rows equal a fresh per-file recompute over c1, nothing else;
  * (c) isolating — v1 still reads the untouched fragments
  * byte-identically after the rewrite; (d) a layout win, not just a
  * rewrite — the SAME narrow rectangle resolves to fewer files
  * through v2 than through v1; (e) semantically invisible — the
  * rectangle's rows are identical through v1, through v2, and off a
  * raw full-scan filter.
  */
class ZoneMapCompactionSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val events = Tables.events(spark, sf)
  private lazy val stagedAll = ZoneMapCompaction.stageCompacted(events, sf)

  private def norm(s: String): String = new java.net.URI(s).getPath

  test("k20: the compacted generation holds strictly fewer files than the fragments") {
    val (root, _) = stagedAll
    val fragFiles = ZoneMapIndex.readManifest(spark, s"$root/_zonemap/v1")
      .count()
    val c1Files = ZoneMapIndex.readManifest(spark, s"$root/_zonemap/v2")
      .count()
    assert(fragFiles > c1Files,
      s"compaction did not shrink the file count: $fragFiles -> $c1Files")
    assert(c1Files > 1L, "need a multi-file generation to prove skipping")
  }

  test("k20: v2 equals a fresh per-file recompute over c1 and points only into c1") {
    val (root, _) = stagedAll
    val got = ZoneMapIndex.readManifest(spark, s"$root/_zonemap/v2")
      .collect().map(_.toSeq).toSet
    val want = ZoneMapIndex.statsRowsFor(
      spark.read.schema(graft.sources.ZOrderLayout.TreeSchema)
        .parquet(s"$root/c1"))
      .collect().map(_.toSeq).toSet
    assert(got === want)
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.head.toString.contains("/c1/"),
        s"v2 row ${r.head} points outside the compacted generation")
    }
  }

  test("k20: v1 still reads the untouched fragments identically after the rewrite") {
    val (root, (uLo, uHi, bLo, bHi)) = stagedAll
    val throughV1 = ZoneMapCompaction
      .fetchAt(spark, root, version = 1, uLo, uHi, bLo, bHi)
      .collect().map(_.toSeq).toSet
    val raw = ZoneMapIndex.readStreamedTree(spark, s"$root/frag")
      .collect().map(_.toSeq).toSet
    assert(throughV1 === raw,
      "v1's full-rectangle read diverged from the fragment tree")
    assert(throughV1.nonEmpty)
  }

  test("k20: the same narrow rectangle reads fewer files through v2 than v1") {
    val (root, (uLo, uHi, bLo, bHi)) = stagedAll
    val (qu1, qu2) = (uLo, uLo + (uHi - uLo + 1L) / 8)
    val (qb1, qb2) = (bLo, bLo + (bHi - bLo + 1L) / 8)
    val v1Read = ZoneMapCompaction
      .fetchAt(spark, root, 1, qu1, qu2, qb1, qb2)
      .inputFiles.map(norm).toSet
    val v2Read = ZoneMapCompaction
      .fetchAt(spark, root, 2, qu1, qu2, qb1, qb2)
      .inputFiles.map(norm).toSet
    // every fragment overlaps the hot corner (each is a z-clustered
    // slice of the SAME distribution), so v1 pays ~a file per
    // fragment; the global re-cluster confines the corner
    assert(v2Read.size < v1Read.size,
      s"compaction bought no skipping: v1 reads ${v1Read.size}, " +
        s"v2 reads ${v2Read.size}")
    val rows1 = ZoneMapCompaction.fetchAt(spark, root, 1, qu1, qu2, qb1, qb2)
      .collect().map(_.toSeq).toSet
    val rows2 = ZoneMapCompaction.fetchAt(spark, root, 2, qu1, qu2, qb1, qb2)
      .collect().map(_.toSeq).toSet
    assert(rows1 === rows2, "the two generations disagree on the rows")
    assert(rows1.nonEmpty)
  }

  test("k20: registered query equals the events-side first-quarter rectangle") {
    val got = SparkEntry.queries("k20_compact_reindex")(spark, sf)
      .collect().map(_.toSeq).toSet
    val (uLo, uHi, bLo, bHi) = graft.sources.ZOrderLayout.bounds(events)
    val uSpan = uHi - uLo + 1L
    val bSpan = bHi - bLo + 1L
    val want = events
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("user_id"),
        floor(Tables.epochUs(col("ts")) / graft.sources.ZOrderLayout.BinUs)
          .cast("long").as("bin_id"),
        col("event_type"), col("value"))
      .filter(col("user_id").between(uLo, uLo + uSpan / 4) &&
        col("bin_id").between(bLo, bLo + bSpan / 4))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("user_id")).cast("long").as("user_checksum"),
        sum(col("bin_id")).cast("long").as("bin_checksum"),
        round(sum(col("value")), 4).as("sum_value"))
      .collect().map(_.toSeq).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }
}
