package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 probe-data generator (VERDICT r11 item 1): derive a ~10×
  * corpus from the driver's sf0.1 tables so the "would this plan
  * survive a 10× scale-up" argument is MEASURED, not prose. The
  * driver's generator is not available to us (TESTDATA.md: testdata
  * is read-only), so sf1 is derived by k-fold replication with
  * per-copy transforms chosen to preserve each workload's SHAPE:
  *
  *  - documents: doc_id shifts by copy·(max+1); text passes through a
  *    per-copy Caesar rotation (`translate`, copy 0 = identity) of
  *    letters and digits. Rotation preserves length, whitespace, and
  *    the intra-copy token/shingle/df structure EXACTLY while making
  *    copies token-disjoint — verbatim replication would plant a
  *    10-copy exact+near-dup clique on every document, inflating the
  *    dedup family's pair term quadratically (a blowup no real 10×
  *    corpus has; a real one has ~the same duplication RATE). lang /
  *    source / n_chars keep (strata count fixed, strata sizes ×k —
  *    the realistic growth axis).
  *  - embeddings: vec_id shifts; the vector rotates left by copy
  *    positions (norm- and distribution-preserving; copies are not
  *    mutual near-neighbors). label keeps.
  *  - events: event_id and user_id shift (more users at the same
  *    per-user activity — the realistic growth; shifting only the
  *    event_id would instead 10× every user's history and change
  *    per-key window costs superlinearly). ts/type/value/props keep:
  *    k× the event density over the same time range.
  *  - orders/lineitem: orderkey shifts on both sides (FK preserved);
  *    partkey/suppkey/custkey KEEP — the dims are deliberately not
  *    replicated, so each dim key serves k× the fact rows, which is
  *    how a fact table actually outgrows its dimensions.
  *  - region/nation/customer/supplier/part: copied unchanged.
  *
  * Usage: runMain graft.tools.ScaleUp <srcDir> <outDir> [factor=10]
  */
object ScaleUp {

  private val Lower = "abcdefghijklmnopqrstuvwxyz"
  private val Upper = Lower.toUpperCase
  private val Digit = "0123456789"

  private def rot(s: String, k: Int): String = {
    val n = s.length
    val kk = ((k % n) + n) % n
    s.substring(kk) + s.substring(0, kk)
  }

  /** Multipliers coprime to 26 — the `a` of the per-copy affine
    * substitution x → a·x + b (mod 26). Pure rotation (a=1) repeats
    * every 26 copies, which at factor > 26 would plant IDENTICAL-text
    * cliques (the letters-only corpus has no digits to break the
    * tie); cycling `a` every 26 copies extends the injective range to
    * 12·26 = 312 copies. Two distinct affine maps agree on ≤ 2 of 26
    * residues, so any doc using a handful of distinct letters maps to
    * near-token-disjoint text under different copies — the same
    * shape-preservation argument as the original Caesar rotation,
    * which this reproduces exactly for k < 26 (a=1, b=k).
    */
  private val CoprimeA = List(1, 3, 5, 7, 9, 11, 15, 17, 19, 21, 23, 25)

  private def affineImage(alphabet: String, a: Int, b: Int): String = {
    val n = alphabet.length
    (0 until n).map(i => alphabet((a * i + b) % n)).mkString
  }

  /** Per-copy affine alphabet substitution: identity at k=0. */
  private def caesar(c: org.apache.spark.sql.Column, k: Int) =
    if (k == 0) c
    else {
      val a = CoprimeA((k / 26) % CoprimeA.length)
      val b = k % 26
      translate(c, Lower + Upper + Digit,
        affineImage(Lower, a, b) + affineImage(Upper, a, b) +
          rot(Digit, k))
    }

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def read(t: String): DataFrame =
      spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")

    def shiftBase(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head.getLong(0) + 1L

    // unchanged dims
    Seq("region", "nation", "customer", "supplier", "part")
      .foreach(t => write(read(t), t))

    val docs = read("documents")
    val dShift = shiftBase(docs, "doc_id")
    write((0 until factor).map { k =>
      docs.select(
        (col("doc_id") + lit(k * dShift)).as("doc_id"),
        caesar(col("text"), k).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_.unionByName(_)), "documents")

    val emb = read("embeddings")
    val vShift = shiftBase(emb, "vec_id")
    // rotate by k mod dim — a raw k-rotation degenerates to the
    // IDENTITY once k reaches the vector length (planting exact
    // duplicate vectors); past dim copies, a sign flip opens a second
    // injective tier (norm- and distribution-preserving like the
    // rotation), so factor ≤ 2·dim stays collision-free.
    // degenerate sources (empty table, null/zero-length first vector)
    // fall back to dim=1 — identity rotation + alternating sign, so
    // the tool still writes a complete (if trivial) derivation
    val dim = emb.select(size(col("embedding"))).limit(1).collect()
      .headOption.collect { case r if !r.isNullAt(0) => r.getInt(0) }
      .filter(_ > 0).getOrElse(1)
    write((0 until factor).map { k =>
      val r = k % dim
      val rotated =
        if (r == 0) col("embedding")
        else concat(slice(col("embedding"), r + 1, 100000),
          slice(col("embedding"), 1, r))
      val signed =
        if ((k / dim) % 2 == 0) rotated
        else transform(rotated, x => -x)
      emb.select((col("vec_id") + lit(k * vShift)).as("vec_id"),
        signed.as("embedding"), col("label"))
    }.reduce(_.unionByName(_)), "embeddings")

    val ev = read("events")
    val eShift = shiftBase(ev, "event_id")
    val uShift = shiftBase(ev, "user_id")
    write((0 until factor).map { k =>
      ev.select((col("event_id") + lit(k * eShift)).as("event_id"),
        col("ts"), (col("user_id") + lit(k * uShift)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_.unionByName(_)), "events")

    val ord = read("orders")
    val oShift = shiftBase(ord, "o_orderkey")
    write((0 until factor).map { k =>
      ord.withColumn("o_orderkey", col("o_orderkey") + lit(k * oShift))
    }.reduce(_.unionByName(_)), "orders")

    val li = read("lineitem")
    write((0 until factor).map { k =>
      li.withColumn("l_orderkey", col("l_orderkey") + lit(k * oShift))
    }.reduce(_.unionByName(_)), "lineitem")

    println(s"SCALEUP_DONE: $out factor=$factor")
    spark.stop()
  }
}
