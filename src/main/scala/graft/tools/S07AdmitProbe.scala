package graft.tools

import org.apache.spark.sql.SparkSession

/** s07 admission census across scales: how many (query, cluster)
  * pairs the lossless angular bound actually admits vs the
  * #queries × #clusters ceiling — the "pruning bites" claim as a
  * measured number per scale (r14 verdict item 2).
  */
object S07AdmitProbe {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/sf1", "/tmp/sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    dirs.foreach { dir =>
      val e = graft.Tables.embeddings(spark, dir)
      val nq = e.filter(org.apache.spark.sql.functions
        .col("vec_id") % 50 === 0).count()
      val admitted = graft.operators.Similarity
        .rangeAdmitted(e, tau = 0.3)
      println(s"S07ADMIT dir=$dir queries=$nq clusters=10 " +
        s"admitted=$admitted ceiling=${nq * 10} " +
        f"share=${admitted.toDouble / (nq * 10)}%.3f")
    }
    spark.stop()
  }
}
