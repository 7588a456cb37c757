package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Similarity

/** r16 verdict #4: make s03 earn its registration. On the driver's
  * NEAR-RANDOM corpus, hyperplane-LSH buckets barely prune (neighbors
  * sit at ~90°, so co-bucketing is near-coincidence and the dials buy
  * candidates ≈ half the corpus) — at sf10 s03 measured SLOWER than
  * s01 brute force at recall 0.78. The docs claim real corpora
  * cluster; this probe MEASURES that claim on the planted-clustered
  * corpus (PlantedClusters): recall@5 and wall seconds for s01
  * (exact), s02 (IVF, registered nprobe=3), and s03 across the dial
  * grid, at probe scale.
  *
  * Usage: runMain graft.tools.S03ClusteredProbe [n] [outDir]
  * (defaults n=200000 — the sf10 embeddings cardinality — and a /tmp
  * staging dir). Prints one CLUSTEREDPROBE line per measurement.
  */
object S03ClusteredProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 200000L
    val dir = if (args.length > 1) args(1)
      else s"/tmp/graft_clustered_$n"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = PlantedClusters.materialize(spark, dir, n)
    def timed[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (exact, tExact) = timed {
      Similarity.annBruteForce(e).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    println(f"CLUSTEREDPROBE n=$n s01 exact sec=$tExact%.2f")
    def recallOf(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val (got, t) = timed {
        df.select("q_id", "n_id").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      (math.rint(1e4 * exact.count(got.contains) / exact.size) / 1e4, t)
    }
    // s02 at the registered approximate dial, for the three-way read
    val (r02, t02) = recallOf(Similarity.annIvf(e, nprobe = 3,
      cacheKey = dir))
    println(f"CLUSTEREDPROBE n=$n s02 nprobe=3 recall=$r02 sec=$t02%.2f")
    // the r18 AUTO dial first (nBits=-1 ⇒ ⌈log2(n/LshBucketTarget)⌉
    // from a corpus count — VERDICT r17 #3): the default a caller
    // gets without remembering the sizing rule
    val (rAuto, tAuto) = recallOf(Similarity.annLsh(e))
    println(f"CLUSTEREDPROBE n=$n s03 nBits=auto tables=16 " +
      f"recall=$rAuto sec=$tAuto%.2f")
    // s03 dial grid around the old fixed (5,16) default; nBits
    // should track log2(corpus/bucket-target), so include larger
    // bits at larger n
    for (bits <- Seq(5, 8, 11, 14); tables <- Seq(4, 8, 16)) {
      val (r, t) = recallOf(Similarity.annLsh(e, nBits = bits,
        tables = tables))
      println(f"CLUSTEREDPROBE n=$n s03 nBits=$bits tables=$tables " +
        f"recall=$r sec=$t%.2f")
    }
    spark.stop()
  }
}
