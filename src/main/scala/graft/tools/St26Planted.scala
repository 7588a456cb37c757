package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Probe the st26 planted-boundary corpus: which rows actually sit
  * in each join side's state store (by event id), so the null-user
  * and boundary contracts are read off the engine, not assumed.
  */
object St26Planted {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val us = 1000000L
    val t0 = 1706650000000000L
    val maxClick = t0 + 5 * 3600 * us
    val w = t0 - 3600 * us
    val horizon = 24L * 3600 * us
    def ts(u: Long) = new java.sql.Timestamp(u / 1000L)
    val rows = Seq(
      (1L, Some(ts(w - horizon)), Some(10L), Some("click")),
      (2L, Some(ts(w - horizon - 1000L)), Some(11L), Some("click")),
      (3L, Some(ts(maxClick)), Some(12L), Some("click")),
      (4L, Option.empty[java.sql.Timestamp], Some(13L), Some("click")),
      (5L, Some(ts(w)), Some(20L), Some("purchase")),
      (6L, Some(ts(w - 1000L)), Some(21L), Some("purchase")),
      (7L, Some(ts(t0)), Some(22L), Some("purchase")),
      (8L, Some(ts(t0 - 1800 * us)), Option.empty[Long],
        Some("purchase"))
    ).toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0))
      .withColumn("props", lit(null).cast("string"))
    val dir = graft.Staging.dir("graft_st26planted_")
    rows.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val ckpt = graft.streaming.StreamOps.joinStateCheckpoint(spark, dir)
    Seq("left" -> "c", "right" -> "p").foreach { case (side, pre) =>
      val ids = spark.read.format("statestore")
        .option("joinSide", side).load(ckpt)
        .select(col(s"value.${pre}_id")).collect()
        .map(_.getLong(0)).sorted.toSeq
      println(s"[planted] side=$side held ids=$ids")
    }
  }
}
