package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** p14 build-phase decomposition (r18 optimization round): PhaseProbe
  * reads p14 as build=4.4 s / write=1.7 s — the checkpointed
  * buildSplitTable owns the build. This splits it into the pipeline's
  * stages, each materialized via noop on top of the previous stage's
  * checkpoint so a stage pays only its own cost:
  *   sets    — quality scan + shingle digests + exact-dedup window
  *   pairs   — d04 candidate pipeline over the sets
  *   groups  — d07 label loop over the pairs
  *   split   — anti-join + salted split + the localCheckpoint itself
  *   tail    — trainingBuildFrom (mixture/packing/rollup, the write)
  *
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     sbt 'runMain graft.tools.P14Probe [reps]'
  */
object P14Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
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
    import org.apache.spark.sql.expressions.Window
    import graft.functions.{ShingleExprs, TextOps}
    import graft.operators.{Corpus, Dedup, TextAnalysis}

    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"P14: $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = graft.Tables.documents(spark, sfDir)
    val minQ = Corpus.BuildMinQualityBp / 10000.0

    (0 until reps).foreach { r =>
      println(s"P14: === rep $r ===")
      val sets = time("sets chk (scan+quality+shingles+exact window)") {
        val enriched = TextAnalysis
          .qualityScore(docs, passthrough = Seq("lang", "source", "text"))
          .filter(col("quality_score") >= minQ)
          .select(col("doc_id"), col("source"), col("n_tokens"),
            xxhash64(TextOps.normText(col("text"))).as("nh"),
            ShingleExprs.shingleHashSet(col("text"), 3).as("sh"))
        val surv = Window.partitionBy(col("nh"))
        enriched
          .withColumn("_min", min(col("doc_id")).over(surv))
          .filter(col("doc_id") === col("_min"))
          .select(col("doc_id"), col("source"), col("n_tokens"),
            col("sh"), size(col("sh")).as("nsh"))
          .localCheckpoint(true)
      }
      val pairs = time("pairs chk (d04 pipeline)") {
        Dedup.ngramJaccardFromSets(
          sets.filter(col("nsh") > 0).select(col("doc_id"), col("sh"),
            col("nsh"))).localCheckpoint(true)
      }
      val groups = time("groups chk (d07 loop)") {
        Dedup.dedupGroups(pairs).localCheckpoint(true)
      }
      time("split+anti (rest of buildSplitTable)") {
        val dropped = groups.filter(col("doc_id") =!= col("cluster_rep"))
          .select(col("doc_id"))
        val kept = sets.select(col("doc_id"), col("source"),
          col("n_tokens")).join(dropped, Seq("doc_id"), "left_anti")
        noop(kept)
      }
      time("full buildSplitTable chk (registered shape)") {
        graft.operators.Corpus.trainingBuild(docs) // builds + chk + plan
      }
      time("p14 full (build+write)") {
        noop(graft.operators.Corpus.trainingBuild(docs))
      }
    }
    spark.stop()
  }
}
