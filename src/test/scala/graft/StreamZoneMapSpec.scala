package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ZoneMapIndex

/** st17: the live-maintained zone map must be (a) versioned — a
  * multi-batch run leaves a v1..vFinal trail, no version ever
  * rewritten under a reader; (b) convergent — the final manifest is
  * row-identical to a from-scratch recompute over the drained tree,
  * so k19's no-false-negative contract carries to the streamed store;
  * (c) delta-proportional — each version's new rows come from exactly
  * that batch's own landing directory; (d) twin-exact — the fetch
  * through the final version equals batch k19 row-for-row (they share
  * one oracle); (e) replay-safe — refolding a batch's version from
  * its landed directory reproduces it bit-identically.
  */
class StreamZoneMapSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val ran =
    graft.streaming.StreamOps.streamZoneMapWithTree(spark, sf)

  test("st17: a multi-batch run leaves a full version trail") {
    val (_, tree, finalV) = ran
    // 4 arrival files consumed 2 per trigger = 2 micro-batches:
    // v1 empty bootstrap + one version per batch
    assert(finalV >= 3L,
      s"expected a multi-batch version trail, got final v$finalV")
    (1L to finalV).foreach { v =>
      assert(new java.io.File(s"$tree/_zonemap/v$v").exists(),
        s"version v$v missing from the trail")
    }
    assert(ZoneMapIndex
      .readManifest(spark, s"$tree/_zonemap/v1").count() === 0L,
      "v1 must be the empty bootstrap")
  }

  test("st17: final manifest equals a from-scratch recompute of the drained tree") {
    val (_, tree, finalV) = ran
    val got = ZoneMapIndex
      .readManifest(spark, s"$tree/_zonemap/v$finalV")
      .collect().map(_.toSeq).toSet
    val want = ZoneMapIndex
      .statsRowsFor(ZoneMapIndex.readStreamedTree(spark, tree))
      .collect().map(_.toSeq).toSet
    assert(got === want,
      "streamed manifest diverged from the from-scratch recompute")
    assert(got.nonEmpty)
  }

  test("st17: each version's delta rows lie under that batch's own directory") {
    val (_, tree, finalV) = ran
    (2L to finalV).foreach { v =>
      val batchId = v - 2L
      val prev = ZoneMapIndex
        .readManifest(spark, s"$tree/_zonemap/v${v - 1L}")
        .collect().map(_.getString(0)).toSet
      val cur = ZoneMapIndex
        .readManifest(spark, s"$tree/_zonemap/v$v")
        .collect().map(_.getString(0)).toSet
      val delta = cur -- prev
      assert(delta.nonEmpty, s"batch $batchId landed no files?")
      delta.foreach { f =>
        assert(f.contains(s"/b$batchId/"),
          s"v$v delta row $f not under b$batchId — the refresh " +
            "scanned beyond its own batch")
      }
      assert(prev.subsetOf(cur),
        s"v$v dropped rows carried from v${v - 1L}")
    }
  }

  test("st17: fetch through the final version equals batch k19 row-for-row") {
    val (fetch, _, _) = ran
    val got = fetch.collect().map(_.toSeq).toSet
    val want = SparkEntry.queries("k19_zonemap_skipping")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("st17: a replayed refold reproduces its version into a probe target") {
    val (_, tree, finalV) = ran
    val streamed = ZoneMapIndex
      .readManifest(spark, s"$tree/_zonemap/v$finalV")
      .collect().map(_.toSeq).toSet
    // replay the LAST batch's fold into a separate probe version
    // chained off the same predecessor: the streamed artifact under
    // comparison survives the test, and a silently-no-op refold would
    // leave the probe missing rather than pass vacuously
    ZoneMapIndex.refoldVersionTo(spark, tree, batchId = finalV - 2L,
      fromV = finalV - 1L, toV = 901L)
    val replayed = ZoneMapIndex
      .readManifest(spark, s"$tree/_zonemap/v901")
      .collect().map(_.toSeq).toSet
    assert(replayed === streamed)
    assert(replayed.nonEmpty)
  }
}
