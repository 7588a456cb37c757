package graft.tools

import org.apache.spark.sql.SparkSession

/** st14 harness-economics probe (VERDICT r17 #6): the st14 sf10 leg
  * grows with the finite harness's BATCH COUNT, not data volume
  * (commit d78daa7 called it harness-bound). This probe times the
  * full st14 run at the CURRENT `GRAFT_HARNESS_FILES_PER_TRIGGER`
  * (the probe-only env override — Verify/Bench refuse it, probes are
  * its intended consumer), so two invocations (env unset = the
  * registered 2, env=4 = single-trigger) give the two-point evidence
  * the verdict asked for: how much of the leg is per-trigger fixed
  * cost vs sketch work. st14's output is batching-INDEPENDENT by
  * construction (mergeable sketch partials), so the comparison is
  * pure harness economics, not semantics.
  *
  * Usage: GRAFT_HARNESS_FILES_PER_TRIGGER=4 \
  *   runMain graft.tools.St14Probe <sfDir> [reps=2]
  */
object St14Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val fpt = sys.env.getOrElse("GRAFT_HARNESS_FILES_PER_TRIGGER", "2")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def once(): Double = {
      val t0 = System.nanoTime()
      graft.streaming.StreamOps.streamSketchLedger(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once() // warmup (stages the arrival tree, like Bench)
    val best = (1 to reps).map(_ => once()).min
    println(f"ST14PROBE dir=$dir filesPerTrigger=$fpt sec=$best%.3f")
    spark.stop()
  }
}
