package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` of registered queries to
  * plans/<round>/<query>_<suffix>.txt (the optimization-round
  * deliverable).
  *
  *   sbt 'runMain graft.tools.PlanDump <suffix> <q1,q2,...> [outDir]'
  *
  * Runs under the Bench session config so the dumped plan is the
  * plan the bench executes. For queries whose registered fn runs
  * work eagerly (streaming harnesses, iterative builds), the dump
  * is the plan of the RETURNED DataFrame — the declared query
  * surface.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val suffix = args.headOption.getOrElse("after")
    val names = args.lift(1).map(_.split(",").map(_.trim)
      .filter(_.nonEmpty).toSeq).getOrElse(graft.SparkEntry.queries.keys.toSeq)
    val outDir = args.lift(2).getOrElse("plans/r18")
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
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      try {
        val df = graft.SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${n}_$suffix.txt"), txt)
        println(s"PLANDUMP: wrote $outDir/${n}_$suffix.txt")
      } catch {
        case e: Throwable =>
          println(s"PLANDUMP: $n FAILED ${e.getClass.getName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
