package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** d17 cost-attribution probe (r16): times the band join WITHOUT the
  * DP (survivor count only), then with it, so the "what dominates at
  * sf1/sf10" question is measured, not guessed.
  * Usage: runMain graft.tools.D17Probe <sfDir>
  */
object D17Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.TextOps
    val docs = graft.Tables.documents(spark, sfDir)
    val maxDist = 8
    val w = maxDist + 1
    val n = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), TextOps.normText(col("text")).as("t"))
      .withColumn("len", length(col("t")).cast("long"))
      .withColumn("nv",
        (col("len") - length(translate(col("t"), "aeiou", ""))).cast("long"))
      .withColumn("nc",
        (col("len") - length(translate(col("t"), "nrsth", ""))).cast("long"))
    val base = expr(s"len div $w")
    val left = n.select(col("doc_id").as("id_a"), col("t").as("ta"),
      col("len").as("la"), col("nv").as("va"), col("nc").as("ca"),
      explode(array(base - 1, base, base + 1)).as("bucket"))
    val right = n.select(col("doc_id").as("id_b"), col("t").as("tb"),
      col("len").as("lb"), col("nv").as("vb"), col("nc").as("cb"),
      base.as("bucket_b")).repartition(col("id_b"))
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = f
      println(f"D17PROBE $tag count=$c%d secs=${(System.nanoTime()-t0)/1e9}%.2f")
    }
    val bandCond =
      col("bucket") === col("bucket_b") && col("id_a") < col("id_b") &&
      abs(col("la") - col("lb")) <= maxDist &&
      abs(col("va") - col("vb")) <= maxDist &&
      abs(col("ca") - col("cb")) <= maxDist
    val lenOnlyCond =
      col("bucket") === col("bucket_b") && col("id_a") < col("id_b") &&
      abs(col("la") - col("lb")) <= maxDist
    // warm
    left.join(right, lenOnlyCond).select(col("id_a")).limit(1).count()
    time("len_band_pairs") {
      left.join(right, lenOnlyCond).count() }
    time("all_band_pairs") {
      left.join(right, bandCond).count() }
    time("with_dp") {
      left.join(right, bandCond)
        .withColumn("d", levenshtein(col("ta"), col("tb"), maxDist))
        .filter(col("d") >= 0).count() }
    time("dp_in_cond_last") {
      left.join(right, bandCond &&
        levenshtein(col("ta"), col("tb"), maxDist) >= 0).count() }
    spark.stop()
  }
}
