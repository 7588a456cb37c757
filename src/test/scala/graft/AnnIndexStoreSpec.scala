package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.sources.AnnIndexStore

class AnnIndexStoreSpec extends AnyFunSuite {
  import TestSpark._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3))).toSet

  test("k31: landed fetch ≡ the memoized path at s05's dials " +
      "(single-commit index)") {
    val emb = Tables.embeddings(spark, sf)
    val dir = graft.Staging.dir("graft_k31spec_full_")
    // one commit over the FULL corpus — same training set as the
    // memo, so the landed read-back must reproduce s05 row-for-row
    // (parquet round-trips doubles exactly; the scan is shared code)
    AnnIndexStore.buildAndAppend(
      emb.filter(lit(true)), emb.filter(lit(false)), dir)
    val landed = rows(AnnIndexStore.fetch(spark, emb, dir, 2))
    val memo = rows(Similarity.annIvfPq(emb))
    assert(landed === memo,
      "landed fetch diverged from the in-session memoized path")
    assert(landed.nonEmpty)
  }

  test("k31: v2 append is O(batch) and rewrites no v1 file") {
    val emb = Tables.embeddings(spark, sf)
    val dir = AnnIndexStore.stageIndex(emb, cacheKey = "")
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def files(sub: String): Map[String, Long] = {
      val p = new org.apache.hadoop.fs.Path(s"$dir/$sub")
      fs.listStatus(p).filter(_.getPath.getName.endsWith(".parquet"))
        .map(f => f.getPath.toString -> f.getLen).toMap
    }
    // c1 artifacts exist; c2 holds ONLY a codes tree (no retrain)
    assert(files("_ann/c1/centroids").nonEmpty)
    assert(files("_ann/c1/codebook").nonEmpty)
    assert(files("_ann/c1/codes").nonEmpty)
    assert(files("_ann/c2/codes").nonEmpty)
    assert(files("_ann/c1/centroids").size === 1)
    assert(files("_ann/c1/codebook").size === 1)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(
      s"$dir/_ann/c2/centroids")),
      "an incremental append must not retrain the quantizer")
    // the delta codes tree indexes exactly the arrival batch's
    // defined vectors
    val c2 = spark.read.parquet(s"$dir/_ann/c2/codes")
    val arrivals = emb.filter(pmod(col("vec_id"), lit(4L)) === 3L)
    assert(c2.count() === arrivals.count(),
      "delta tree must hold the arrival batch and nothing else")
    val c2Ids = c2.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(c2Ids.forall(_ % 4 == 3))
    // a v1 fetch never lists a c2 file (version isolation)
    val v1Files = AnnIndexStore.fetch(spark, emb, dir, 1).inputFiles
      .filter(_.contains("/_ann/"))
    assert(v1Files.nonEmpty && v1Files.forall(_.contains("/c1/")),
      s"v1 fetch leaked past its manifest: ${v1Files.toSeq}")
  }

  test("k31: retrain lands a fresh generation; v3 fetch ≡ the " +
      "memoized path, prior manifests untouched") {
    val emb = Tables.embeddings(spark, sf)
    val dir = graft.Staging.dir("graft_k31spec_rt_")
    AnnIndexStore.buildAndAppend(
      emb.filter(pmod(col("vec_id"), lit(4L)) =!= 3L),
      emb.filter(pmod(col("vec_id"), lit(4L)) === 3L), dir)
    val v2Before = spark.read.parquet(s"$dir/_ann/v2").collect()
      .map(_.toSeq).toSet
    // retrain over the FULL corpus = the memo's training set, so the
    // v3 fetch must reproduce s05's memoized output row-for-row
    AnnIndexStore.retrain(emb, dir, version = 3, commit = "c3")
    val v3 = rows(AnnIndexStore.fetch(spark, emb, dir, 3))
    assert(v3 === rows(graft.operators.Similarity.annIvfPq(emb)))
    // generation isolation: the v2 manifest is untouched, a v3 fetch
    // lists only c3 files, and no pre-retrain file was rewritten
    assert(spark.read.parquet(s"$dir/_ann/v2").collect()
      .map(_.toSeq).toSet === v2Before)
    val v3Files = AnnIndexStore.fetch(spark, emb, dir, 3).inputFiles
      .filter(_.contains("/_ann/"))
    assert(v3Files.nonEmpty && v3Files.forall(_.contains("/c3/")),
      s"v3 fetch leaked past its manifest: ${v3Files.toSeq}")
  }

  test("k31: the codes tree is corpus-partitioned (r15 verdict #2) " +
      "and a multi-file tree reads identically") {
    // At the test SF, AQE's partition coalescing correctly shrinks
    // the tiny encode shuffle to one partition (at 1e9 vectors it
    // would size ~64 MB chunks instead — the desired behavior); to
    // pin the WRITE-PATH contract — no coalesce(1) on the O(corpus)
    // artifact — build once with coalescing off and assert the tree
    // is multi-file while the broadcast-sized artifacts stay
    // single-file, then prove the multi-file tree reads the same
    // rows as the single-file build's.
    val emb = Tables.embeddings(spark, sf)
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val old = spark.conf.get(key)
    val dir = graft.Staging.dir("graft_k31spec_mf_")
    try {
      spark.conf.set(key, "false")
      AnnIndexStore.buildAndAppend(
        emb.filter(pmod(col("vec_id"), lit(4L)) =!= 3L),
        emb.filter(pmod(col("vec_id"), lit(4L)) === 3L), dir)
    } finally spark.conf.set(key, old)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    def nFiles(sub: String): Int =
      fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/$sub"))
        .count(_.getPath.getName.endsWith(".parquet"))
    assert(nFiles("_ann/c1/codes") > 1,
      "base codes tree must be corpus-partitioned (multi-file)")
    assert(nFiles("_ann/c1/centroids") === 1)
    assert(nFiles("_ann/c1/codebook") === 1)
    // multi-file ≡ single-file: same fetch rows as the memoized-path
    // build (the coalesced tree the other tests read)
    val mf = rows(AnnIndexStore.fetch(spark, emb, dir, 2))
    val sf1 = rows(AnnIndexStore.fetch(spark, emb,
      AnnIndexStore.stageIndex(emb, cacheKey = ""), 2))
    assert(mf === sf1, "multi-file codes tree must read identically")
  }

  test("k31: lossless fetch through the incremental v2 index ≡ " +
      "brute force") {
    val emb = Tables.embeddings(spark, sf)
    val got = rows(SparkEntry.queries("k31_ann_index")(spark, sf))
    val brute = rows(Similarity.annBruteForce(emb))
    assert(got === brute,
      "the landed two-version index at lossless dials must be exact")
  }

  test("st27: streamed per-batch appends build the same index — " +
      "lossless fetch exact, lossy fetch ≡ the batch-built index") {
    val emb = Tables.embeddings(spark, sf)
    // registered query: lossless dials through the final streamed
    // manifest ≡ exact brute force (the anchor, shared oracle)
    val got = rows(SparkEntry.queries("st27_stream_ann_ingest")(spark, sf))
    assert(got === rows(Similarity.annBruteForce(emb)))
    // continuity: at s05's REGISTERED lossy dials the streamed index
    // (4 delta trees) answers row-for-row like k31's batch-built one
    // (1 delta tree) — same landed quantizer ⇒ identical codes ⇒
    // identical ADC ordering, independent of arrival batching
    val k31Dir = AnnIndexStore.stageIndex(emb, cacheKey = "")
    val k31Lossy = rows(AnnIndexStore.fetch(spark, emb, k31Dir, 2))
    // rebuild st27's staging fresh to pull its annDir deterministically
    val st27 = graft.streaming.StreamOps.streamAnnIngest(spark, sf)
    // same dials as fetch's defaults via a direct lossy fetch on the
    // memoized streamed catalog: reuse the registered path's artifacts
    // by fetching v5 at (nprobe=5, rerankDepth=64)
    val st27Dir = {
      // the memo keyed on (dir|4) — recover via a second call's
      // inputFiles (all under one _ann root)
      val f = st27.inputFiles.find(_.contains("/_ann/"))
      // registered query fetched lossless; lossy fetch needs the dir
      f.map(_.split("/_ann/")(0)).get
    }
    val st27Lossy = rows(AnnIndexStore.fetch(spark, emb, st27Dir, 5))
    assert(st27Lossy === k31Lossy,
      "arrival batching must not change the lossy-dial answers")
  }
}
