package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage decomposition of the d04/d07/p03/p14 shingle-pair pipeline
  * (optimization round r18, guide §1). Times progressively longer
  * prefixes of ngramJaccard's plan under the bench session config so
  * the deltas attribute cost to: shingle scan+explode, the posting
  * exchange, the df window, the candidate self-join+agg. Measurement
  * only; nothing registered changes.
  */
object PairsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("GRAFT_PHASE_REPS", "3").toInt
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
    import graft.functions.ShingleExprs

    val docs = graft.Tables.documents(spark, sfDir)
    val sets = docs.select(col("doc_id"),
      ShingleExprs.shingleHashSet(col("text"), 3).as("sh"))
      .select(col("doc_id"), col("sh"), size(col("sh")).as("nsh"))

    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(label: String)(body: => Unit): Unit = {
      body // warmup
      val s = (0 until reps).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"PP: $label min=$s%.3f")
    }

    val exploded = sets
      .select(col("doc_id"), col("nsh"), explode(col("sh")).as("gh"))
    val repart = exploded.repartition(col("gh"))
    val posting = {
      import org.apache.spark.sql.expressions.Window
      repart
        .withColumn("df", count(lit(1)).over(Window.partitionBy(col("gh"))))
        .filter(col("df") <= 128)
        .drop("df")
    }
    println(s"PP: docs=${docs.count()} postingRows=${exploded.count()}")
    time("1 sets (scan+shingle)") { noop(sets) }
    time("2 exploded") { noop(exploded) }
    time("3 repartition(gh)") { noop(repart) }
    time("4 posting (df window)") { noop(posting) }
    time("5 pairs (full)") { noop(graft.operators.Dedup.ngramJaccard(docs)) }
  }
}
