package graft.tools

import org.apache.spark.sql.SparkSession

/** Execute registered queries under the Bench session config and
  * print the FINAL adaptive plan's shape counts (scans of the
  * documents/events/embeddings parquet, exchanges, reused stages,
  * join strategies) — the runtime truth the initial formatted plan
  * cannot show under AQE (exchange/stage reuse and join demotion
  * are decided at stage materialization).
  *
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     sbt 'runMain graft.tools.ExecPlanProbe <q1,q2,...> [dumpDir]'
  */
object ExecPlanProbe {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").map(_.trim)
      .filter(_.nonEmpty).toSeq).getOrElse(Seq.empty)
    val dumpDir = args.lift(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      // collect(), not a noop write: the write spawns its OWN
      // QueryExecution, leaving df.queryExecution un-executed (no
      // final adaptive plan). Registered queries return bounded
      // result sets, so collect is safe here (probe-only).
      df.collect()
      val plan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      def c(p: String) = plan.linesIterator.count(_.contains(p))
      println(s"EXECPLAN: $n scans=${c("Scan parquet")} " +
        s"exchanges=${c("Exchange")} reusedExchange=${c("ReusedExchange")} " +
        s"reusedStage=${c("ReusedQueryStage") + c("TableCacheQueryStage")} " +
        s"smj=${c("SortMergeJoin")} bhj=${c("BroadcastHashJoin")} " +
        s"sorts=${c("Sort ")}")
      dumpDir.foreach { d =>
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$d/${n}_exec.txt"), plan)
      }
    }
    spark.stop()
  }
}
