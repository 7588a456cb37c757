package graft.tools

import org.apache.spark.sql.SparkSession

/** st18 statePartitions crossover probe: the sized-dial story needs
  * its other half measured — 8 partitions beat the inherited 32 by
  * 3× at sf0.1 (state-commit floor dominates), but per-batch join
  * parallelism IS the same number, so at some scale more partitions
  * must win. Prints seconds per (sfDir, statePartitions) so the dial
  * guidance in BASELINE/SURVEY cites a crossover, not a hunch.
  *
  * Usage: runMain graft.tools.St18Probe <sfDir> <parts,parts,...>
  */
object St18Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val parts = args(1).split(",").map(_.toInt).toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-st18-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // stage + warm once so every dial pays the same (memoized) input
    graft.streaming.StreamOps.streamStreamJoin(spark, sfDir).count()
    parts.foreach { p =>
      val secs = (0 until 2).map { _ =>
        val t0 = System.nanoTime()
        graft.streaming.StreamOps
          .streamStreamJoin(spark, sfDir, statePartitions = p).count()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"ST18_PROBE: sf=$sfDir parts=$p%d secs=$secs%.3f")
    }
    spark.stop()
  }
}
