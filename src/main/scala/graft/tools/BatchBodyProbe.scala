package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-experiments for the streaming foreachBatch bodies and
  * stateful-partitioning dials (optimization round r18). Everything
  * here is measurement-only; nothing registered changes.
  *
  * Experiments:
  *  1. st14's partial write, as-shipped (agg → write, final stage =
  *     shuffle.partitions tasks) vs coalesce(1) before the write
  *     (the partial is ≤ days×types metadata rows — one task, one
  *     file, one rename).
  *  2. st01's windowed aggregation stream at statePartitions ∈
  *     {32 (inherited), 8 (the st18/st19 sized dial)} — isolates the
  *     state-commit floor the TriggerProbe surfaced (10.7 s summed
  *     commit across 32 stores for 600 state rows).
  */
object BatchBodyProbe {
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // --- experiment 1: st14 partial-write body ---
    val events = graft.Tables.events(spark, sfDir)
    val stage = graft.Staging.dir("graft_bb_st14_")
    events.select(to_date(col("ts")).as("day"), col("event_type"),
      col("user_id")).repartition(4).write.mode("overwrite").parquet(stage)
    // one trigger's slice = 2 of the 4 files
    val files = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted.take(2)
    val slice = spark.read
      .schema("day DATE, event_type STRING, user_id BIGINT")
      .parquet(files: _*)

    def time(label: String)(body: => Unit): Unit = {
      body // warmup
      val s = (0 until reps).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }.min
      println(f"BB: $label min=$s%.3f")
    }

    val out1 = graft.Staging.dir("graft_bb_out_")
    time("st14_body_asis") {
      slice.repartition(32).groupBy(col("day"), col("event_type"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"),
          count(lit(1)).as("n_events"))
        .write.mode("overwrite").parquet(s"$out1/a")
    }
    time("st14_body_coalesce1") {
      slice.repartition(32).groupBy(col("day"), col("event_type"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"),
          count(lit(1)).as("n_events"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$out1/c")
    }
    time("st14_body_nospread") {
      slice.groupBy(col("day"), col("event_type"))
        .agg(hll_sketch_agg(col("user_id")).as("sk"),
          count(lit(1)).as("n_events"))
        .coalesce(1)
        .write.mode("overwrite").parquet(s"$out1/n")
    }

    // --- experiment 2: st01 stream at statePartitions 32 vs 8 ---
    def st01At(parts: Int): Unit = {
      val child = spark.newSession()
      child.conf.set("spark.sql.shuffle.partitions", parts)
      val batch = graft.Tables.events(child, sfDir)
      val stage2 = graft.Staging.dir(s"graft_bb_st01_$parts")
      batch.write.mode("overwrite").parquet(stage2)
      val src = child.readStream.schema(batch.schema).parquet(stage2)
      val agg = src
        .withWatermark("ts", "0 seconds")
        .groupBy(window(col("ts"), "1 day"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("v"))
      val sink = s"bb_st01_${parts}_${System.nanoTime()}"
      val q = agg.writeStream
        .outputMode("append")
        .format("memory").queryName(sink)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      child.table(sink).count()
    }
    st01At(32) // warm staging + codegen
    time("st01_like_parts32") { st01At(32) }
    time("st01_like_parts8") { st01At(8) }
    time("st01_like_parts4") { st01At(4) }

    spark.stop()
  }
}
