package graft.tools

import org.apache.spark.sql.SparkSession

/** AvailableNow micro-batch FLOOR probe (r15 verdict #8): st18/st19
  * pay ~2.6-3.4 s at sf0.1 and the suspicion is per-trigger fixed
  * cost (offset log + job scheduling + 4 state-store commits per
  * shuffle partition per batch), not join-plan cost. This measures
  * it directly: the SAME query timed under different
  * files-per-trigger (→ different micro-batch counts), per-dial
  * minimum over reps. seconds(n_batches) is ~affine: slope = the
  * per-trigger floor, intercept = plan cost — the number BASELINE.md
  * documents so a PLAN regression isn't masked by harness cost.
  *
  * HarnessFilesPerTrigger is read from the env at object init, so
  * one JVM = one dial: invoke once per dial,
  *   GRAFT_HARNESS_FILES_PER_TRIGGER=N runMain
  *     graft.tools.HarnessFloorProbe <sfDir> [reps]
  * (N=1 → 4 batches/side, 2 → 2 [the registered default], 8 → 1).
  */
object HarnessFloorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 3
    val files =
      sys.env.getOrElse("GRAFT_HARNESS_FILES_PER_TRIGGER", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-harness-floor-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm once: staging memo + parquet footer cache, so every dial
    // pays the same input cost
    graft.streaming.StreamOps.streamStreamJoin(spark, sfDir).count()
    Seq(
      "st18" -> (() => graft.streaming.StreamOps
        .streamStreamJoin(spark, sfDir).count()),
      "st19" -> (() => graft.streaming.StreamOps
        .streamStreamOuterJoin(spark, sfDir).count())
    ).foreach { case (name, run) =>
      val secs = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        run()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(
        f"HARNESS_FLOOR: q=$name files_per_trigger=$files%d secs=$secs%.3f")
    }
    spark.stop()
  }
}
