package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Dedup

/** d08 scale evidence (round 17): the REGISTERED dial is the
  * kClusters=1 lossless anchor (all-pairs — correctness-gate tier,
  * single-key join by construction), so its curve is quadratic BY
  * CONTRACT; the PRODUCTION tier is the same operator at learned
  * blocking (kClusters sized to the corpus). This probe times the
  * production dial at a given SF dir so BENCH_sf10.json can carry a
  * measured number for the tier a deployment actually runs — the
  * d17/d18 split, inside one operator's dial.
  *
  * Usage: runMain graft.tools.D08Probe <sfDir> [kClusters=auto] [reps=2]
  * (kClusters "auto" or 0 = the r18 corpus-sized default dial)
  */
object D08Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val k = if (args.length > 1 && args(1) != "auto") args(1).toInt else 0
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.Tables.embeddings(spark, dir)
    def once(): Double = {
      val t0 = System.nanoTime()
      Dedup.dedupEmbeddingAuto(e, kClusters = k, cacheKey = dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once() // warmup (also trains+memoizes the quantizer, like Bench)
    val best = (1 to reps).map(_ => once()).min
    println(f"D08PROBE dir=$dir kClusters=$k sec=$best%.3f")
    spark.stop()
  }
}
