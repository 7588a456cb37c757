package graft.tools

import org.apache.spark.sql.SparkSession

/** st23 statePartitions probe — same question as St18Probe asked of
  * the symmetric join, for the transformWithState operator: timer
  * sweeps and RocksDB instances parallelize by the stateful
  * operator's partition count, so the right sizing is scale-
  * dependent and should be cited, not guessed.
  *
  * Usage: runMain graft.tools.St23Probe <sfDir> <parts,parts,...>
  */
object St23Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val parts = args(1).split(",").map(_.toInt).toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-st23-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.streaming.StreamOps.streamSessionTimers(spark, sfDir).count()
    parts.foreach { p =>
      val secs = (0 until 2).map { _ =>
        val t0 = System.nanoTime()
        graft.streaming.StreamOps
          .streamSessionTimers(spark, sfDir, statePartitions = p).count()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"ST23_PROBE: sf=$sfDir parts=$p%d secs=$secs%.3f")
    }
    spark.stop()
  }
}
