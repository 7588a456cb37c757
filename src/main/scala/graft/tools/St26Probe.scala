package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe for the st26 design: drain the sentinel-less
  * symmetric join, dump each join side's buffered state, and print
  * the held sets the watermark-arithmetic candidates predict — so
  * the census operator and its oracle encode the eviction inequality
  * Spark ACTUALLY applies (ms flooring, strict vs non-strict, which
  * batch's watermark ran the final eviction) rather than a guess.
  * St24Probe's protocol applied to join state.
  */
object St26Probe {
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
      .joinStateCheckpoint(spark, sfDir)
    println(s"[probe] checkpoint: $ckpt")
    Seq("left" -> "c", "right" -> "p").foreach { case (sideName, pre) =>
      val reader = spark.read.format("statestore")
        .option("joinSide", sideName)
        .load(ckpt)
      println(s"[probe] side=$sideName schema:")
      reader.printSchema()
      val held = reader
        .select(col(s"value.${pre}_id").as("id"),
          graft.Tables.epochUs(col(s"value.${pre}_ts")).as("ts_us"))
      val n = held.count()
      val mm = held.agg(min(col("ts_us")), max(col("ts_us")))
        .collect()(0)
      println(s"[probe] side=$sideName held=$n " +
        s"min_ts=${mm.get(0)} max_ts=${mm.get(1)}")
    }
    // batch-side candidates
    val ev = graft.Tables.events(spark, sfDir)
      .filter(col("ts").isNotNull)
    val hiUs = ev.agg(max(graft.Tables.epochUs(col("ts"))))
      .collect()(0).getLong(0)
    val horizonUs = 24L * 3600 * 1000000L
    val delayUs = 3600L * 1000000L
    println(s"[probe] corpus max_us=$hiUs")
    def heldCounts(wUs: Long): (Long, Long, Long, Long) = {
      val clicks = ev.filter(col("event_type") === "click")
        .filter(graft.Tables.epochUs(col("ts")) + horizonUs >= wUs)
        .count()
      val clicksStrict = ev.filter(col("event_type") === "click")
        .filter(graft.Tables.epochUs(col("ts")) + horizonUs > wUs)
        .count()
      val purch = ev.filter(col("event_type") === "purchase")
        .filter(graft.Tables.epochUs(col("ts")) >= wUs)
        .count()
      val purchStrict = ev.filter(col("event_type") === "purchase")
        .filter(graft.Tables.epochUs(col("ts")) > wUs)
        .count()
      (clicks, clicksStrict, purch, purchStrict)
    }
    // solve for the implied eviction watermark interval: W must keep
    // every held row (W ≤ min held bound) and evict every absent one
    // (W > max evicted bound); bounds: click ts + horizon, purchase ts
    val heldL = spark.read.format("statestore")
      .option("joinSide", "left").load(ckpt)
      .select(graft.Tables.epochUs(col("value.c_ts")).as("ts_us"))
      .collect().map(_.getLong(0)).toSet
    val heldR = spark.read.format("statestore")
      .option("joinSide", "right").load(ckpt)
      .select(graft.Tables.epochUs(col("value.p_ts")).as("ts_us"))
      .collect().map(_.getLong(0)).toSet
    val clicks = ev.filter(col("event_type") === "click")
      .select(graft.Tables.epochUs(col("ts"))).collect()
      .map(_.getLong(0))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(graft.Tables.epochUs(col("ts"))).collect()
      .map(_.getLong(0))
    val wHigh = math.min(
      heldL.map(_ + horizonUs).min, heldR.min)
    val wLowC = clicks.filterNot(heldL).map(_ + horizonUs)
      .foldLeft(Long.MinValue)(math.max)
    val wLowP = purchases.filterNot(heldR)
      .foldLeft(Long.MinValue)(math.max)
    println(s"[probe] implied W interval: (${math.max(wLowC, wLowP)}," +
      s" $wHigh]  (left-low=$wLowC right-low=$wLowP)")
    println(s"[probe] reference points: hi-delay=${hiUs - delayUs} " +
      s"hi-2delay=${hiUs - 2 * delayUs}")
    // per-slice maxima: 4 time-ordered slices, 2 files/trigger →
    // batch1 = f0+f1, batch2 = f2+f3; the watermark EVICTING in
    // batch k was computed after batch k−1
    val loUs = ev.agg(min(graft.Tables.epochUs(col("ts"))))
      .collect()(0).getLong(0)
    val span = hiUs - loUs + 1
    val sliceMax = (0 until 4).map { i =>
      val until = loUs + span * (i + 1) / 4
      ev.filter(graft.Tables.epochUs(col("ts")) < until)
        .agg(max(graft.Tables.epochUs(col("ts"))))
        .collect()(0).getLong(0)
    }
    println(s"[probe] slice maxima: $sliceMax")
    // id-level diff vs the candidate prediction (null-user contract)
    val heldLIds = spark.read.format("statestore")
      .option("joinSide", "left").load(ckpt)
      .select(col("value.c_id")).collect().map(_.getLong(0)).toSet
    val wTry = (math.min(clicks.max, purchases.max) / 1000L) * 1000L -
      delayUs
    val predIds = ev.filter(col("event_type") === "click")
      .filter(graft.Tables.epochUs(col("ts")) + horizonUs >= wTry)
      .select(col("event_id"), col("user_id")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -999L else r.getLong(1)))
    println(s"[probe] pred-not-held=${predIds.map(_._1).toSet -- heldLIds}" +
      s" held-not-pred=${heldLIds -- predIds.map(_._1).toSet}")
    println(s"[probe] null-user preds=${predIds.filter(_._2 == -999L).toSeq}")
    val maxClick = clicks.max
    val maxPurch = purchases.max
    println(s"[probe] maxClick=$maxClick maxPurch=$maxPurch")
    Seq(
      "min-over-sides wm (per-side max − delay)" ->
        (math.min(maxClick, maxPurch) - delayUs),
      "min-over-sides wm, ms-floored" ->
        ((math.min(maxClick, maxPurch) / 1000L) * 1000L - delayUs),
      "final wm (us − delay)" -> (hiUs - delayUs)
    ).foreach { case (name, w) =>
      val (c, cs, p, ps) = heldCounts(w)
      println(s"[probe] candidate '$name' w_us=$w: " +
        s"clicks>=:$c clicks>:$cs purchases>=:$p purchases>:$ps" +
        s"  (actual ${heldL.size}/${heldR.size})")
    }
  }
}
