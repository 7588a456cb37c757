package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{CoverageTrack, SortedLayout}

/** k15: the coverage-track artifact must be (a) correct — window
  * read-back equals the straight-from-events computation, (b) laid
  * out — per-file bin ranges disjoint within each track so a window
  * fetch skips row groups, (c) pruned — a one-track read lists only
  * that track's directory, (d) manifest-complete — every physical
  * file has a manifest row and rows conserve.
  */
class CoverageTrackSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val events = Tables.events(spark, sf)

  test("k15: window read-back equals the events-side computation") {
    val got = SparkEntry.queries("k15_coverage_track")(spark, sf)
      .collect().map(_.toSeq).toSet
    val bins = graft.operators.Pipeline.binCoverage(events)
    val mb = bins.agg(min(col("bin_id"))).head.getLong(0)
    val want = bins
      .filter(col("bin_id").between(mb + CoverageTrack.WindowLoOffset,
        mb + CoverageTrack.WindowHiOffset))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_bins"),
        sum(col("n_events")).cast("long").as("n_events"),
        sum(col("bin_id")).cast("long").as("bin_checksum"),
        sum(round(col("sum_value") * 10000d).cast("long"))
          .cast("long").as("mass_e4"))
      .collect().map(_.toSeq).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("k15: per-file bin ranges are disjoint within each track") {
    val dir = CoverageTrack.stageTrack(events, cacheKey = sf)
    val typeDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("event_type="))
    assert(typeDirs.length > 1, "multiple tracks expected")
    typeDirs.foreach { td =>
      val ranges = SortedLayout
        .columnRanges(spark, td.getAbsolutePath, "bin_id")
        .sortBy(_._2)
      ranges.sliding(2).foreach {
        case Seq((fa, _, maxA), (fb, minB, _)) =>
          assert(maxA < minB,
            s"${td.getName}: files $fa and $fb overlap on bin_id — " +
              "range clustering broken, row-group skip impossible")
        case _ => ()
      }
    }
  }

  test("k15: a one-track window read prunes to that track's directory") {
    val dir = CoverageTrack.stageTrack(events, cacheKey = sf)
    val oneTrack = CoverageTrack.readTrack(spark, dir)
      .filter(col("event_type") === "click" &&
        col("bin_id").between(0L, Long.MaxValue))
    // partition pruning is a plan property (inputFiles lists the
    // pre-pruning index): the scan must carry a PartitionFilters
    // entry on event_type AND a pushed bin_id range for the
    // row-group skip
    val plan = oneTrack.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("event_type"),
      s"no event_type partition filter in:\n$plan")
    assert(plan.contains("PushedFilters") &&
      plan.replaceAll("(?s).*PushedFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("bin_id"),
      s"bin_id bounds not pushed to the scan in:\n$plan")
    // and the pruned scan actually returns only the requested track
    assert(oneTrack.select("event_type").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("click"))
  }

  test("k15: manifest covers every file and conserves rows") {
    val dir = CoverageTrack.stageTrack(events, cacheKey = sf)
    val manifest = CoverageTrack.trackManifest(events, cacheKey = sf)
      .collect()
    val onDisk = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      walk(new java.io.File(dir)).map(_.getName).toSet
    }
    assert(manifest.map(_.getAs[String]("file_name")).toSet === onDisk,
      "manifest must list exactly the physical files")
    val totalBins = manifest.map(_.getAs[Long]("n_bins")).sum
    val expected = graft.operators.Pipeline.binCoverage(events).count()
    assert(totalBins === expected, "manifest rows must conserve bins")
  }
}
