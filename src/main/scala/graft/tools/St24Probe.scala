package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe for the st24 design: drain the open-session stream,
  * then dump the statestore source's schema and rows against the
  * arithmetic candidates for the timer-expiry inequality, so the
  * operator and its oracle encode the inequality Spark ACTUALLY
  * applies rather than a guess.
  */
object St24Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ckpt = graft.streaming.StreamOps
      .openSessionCheckpoint(spark, sfDir, 1800L, 8)
    println(s"[probe] checkpoint: $ckpt")
    val reader = spark.read.format("statestore")
      .option("stateVarName", "lastTs")
      .load(ckpt)
    reader.printSchema()
    reader.show(10, truncate = false)
    println(s"[probe] state rows: ${reader.count()}")
    // candidates: who SHOULD be open under each inequality variant
    val ev = graft.Tables.events(spark, sfDir)
    val us = graft.Tables.epochUs(col("ts"))
    val gapUs = 1800L * 1000000L
    val perUser = ev.groupBy(col("user_id")).agg(max(us).as("last_us"))
    val wmMs = ev.agg((max(us) / 1000L).cast("long")).collect()(0).getLong(0)
    println(s"[probe] final watermark ms: $wmMs")
    Seq(
      ("expiry>wm", perUser.filter(
        (col("last_us") + gapUs) / 1000L + 1L > wmMs)),
      ("expiry>=wm", perUser.filter(
        (col("last_us") + gapUs) / 1000L + 1L >= wmMs))
    ).foreach { case (name, df) =>
      println(s"[probe] candidate $name count: ${df.count()}")
    }

    // ---- planted boundary probe: gap 10 s, wm driven by u9 ----
    // expiryMs(last) = (last_us + gap_us)/1000 + 1
    // u9 last 100_000_777 us -> wm floor = 100_000 ms (pins the floor)
    // u2 expiry exactly wm   (89_999_500 -> 100_000)
    // u3 expiry wm + 1       (90_000_500 -> 100_001)
    // u4 expiry wm - 1       (88_998_500 -> 99_999)
    import spark.implicits._
    val planted = Seq(
      (2L, 89_999_500L), (3L, 90_000_500L), (4L, 88_998_500L),
      (9L, 50_000_000L), (9L, 100_000_777L))
    val stage = graft.Staging.dir("graft_st24_probe_")
    val sch = org.apache.spark.sql.types.StructType.fromDDL(
      "user_id BIGINT, ts TIMESTAMP")
    planted.zipWithIndex.groupBy(_._1._2 < 90_000_000L).toSeq
      .sortBy(!_._1).zipWithIndex.foreach { case ((_, rows), i) =>
        rows.map(_._1).toDF("user_id", "us")
          .select(col("user_id"), timestamp_micros(col("us")).as("ts"))
          .coalesce(1).write.mode("overwrite").parquet(s"$stage/f$i")
      }
    val ck2 = graft.streaming.StreamOps.drainOpenSessions(
      spark, s"$stage/f*", sch, 10L * 1000000L, 2)
    val st2 = spark.read.format("statestore")
      .option("stateVarName", "lastTs").load(ck2)
      .select(col("key.value").as("u"), col("value.value").as("last"))
    println("[probe] planted open state:")
    st2.orderBy("u").show(truncate = false)
    spark.stop()
  }
}
