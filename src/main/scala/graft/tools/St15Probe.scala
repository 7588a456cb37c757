package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage-timer for st15's scale profile (not part of the
  * library surface): times the weight pass, the staging write, the
  * streaming run, and the final fold separately so a slope claim in
  * BENCH_sf10.json rests on measured stages, not guesses.
  */
object St15Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"ST15PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm the JVM/page cache once
    graft.Tables.documents(spark, dir).count()
    val docs = graft.Tables.documents(spark, dir)
    val weights = t("weights") {
      graft.operators.Corpus.importanceWeightRows(docs)
    }
    t("full_streamSelect_cold_stage") {
      graft.streaming.StreamOps.streamSelect(spark, dir).count()
    }
    t("full_streamSelect_warm_stage") {
      graft.streaming.StreamOps.streamSelect(spark, dir).count()
    }
    // batch equivalent of the stream's total work
    t("batch_score_equiv") {
      graft.operators.Corpus.importanceScore(docs, weights)
        .filter(col("score") > 0).count()
    }
    // hand-rolled stream with per-batch timers
    t("manual_stream") {
      val stage = t("staging_write") {
        val s = graft.Staging.dir("graft_probe_st15_")
        docs.select(col("doc_id"), col("source"), col("text"))
          .repartition(4)
          .write.mode("overwrite").parquet(s)
        s
      }
      val out = graft.Staging.dir("graft_probe_st15_out_")
      val src = spark.readStream
        .schema("doc_id BIGINT, source STRING, text STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
      val q = src.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
          t(s"batch_$id") {
            graft.streaming.StreamOps.writeSelectPartial(batch, id, out,
              weights)
          }
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.stop()
  }
}
