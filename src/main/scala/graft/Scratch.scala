package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling entry (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // see Verify.scala: avoids triple shingle evaluation pre-explode
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.env.get("SPARK_GRAFT_EXCLUDE").foreach(r =>
      spark.conf.set("spark.sql.optimizer.excludedRules", r))
    val names = args.toSeq
    names.foreach { n =>
      // timer spans CONSTRUCTION + execution — iterative operators
      // (d07's label loop, s02's Lloyd build) run jobs while the
      // DataFrame is being built, same accounting as Bench.
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      println(f"TIMING $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) df.explain("formatted")
    }
    spark.stop()
  }
}
