package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.BlobStore

class BlobStoreSpec extends AnyFunSuite {
  import TestSpark._

  test("m08: every digest is stored exactly once (CAS invariant)") {
    val docs = Tables.documents(spark, sf)
    val root = BlobStore.stage(docs, cacheKey = sf)
    val blobs = BlobStore.readBlobs(spark, root)
    assert(blobs.count() === blobs.select("digest").distinct().count())
    // and the store holds exactly the corpus's distinct contents
    val want = docs.filter(col("text").isNotNull)
      .select(md5(col("text").cast("binary"))).distinct().count()
    assert(blobs.count() === want)
  }

  test("m08: reconstruction reproduces every payload bit-for-bit") {
    val docs = Tables.documents(spark, sf)
    val root = BlobStore.stage(docs, cacheKey = sf)
    val got = BlobStore.fetch(spark, root, docs.select(col("doc_id")))
      .collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq))
      .sortBy(_._1)
    val want = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("text").cast("binary"))
      .collect()
      .map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq))
      .sortBy(_._1)
    assert(got.length === want.length && got.toSeq === want.toSeq)
  }

  test("m08: re-ingesting the whole corpus lands ZERO new blobs") {
    import org.apache.spark.sql.DataFrame
    val docs = Tables.documents(spark, sf)
    // own root, NOT the cacheKey-memoized one: this test MUTATES the
    // store (the replay appends a refs landing), and the memoized
    // artifact is the registered m08 query's — poisoning it here
    // breaks any later spec that compares against m08 (st22's twin
    // equality did exactly that in the full-suite order)
    val root = BlobStore.stage(docs)
    val before = BlobStore.readBlobs(spark, root).count()
    val rows: DataFrame = docs.filter(col("text").isNotNull)
      .select(col("doc_id"), col("source"),
        col("text").cast("binary").as("payload"))
      .withColumn("digest", md5(col("payload")))
      .withColumn("n_bytes", length(col("payload")).cast("long"))
    val novel = BlobStore.ingest(spark, root, rows)
    assert(novel === 0L, "at-least-once replay must be a storage no-op")
    assert(BlobStore.readBlobs(spark, root).count() === before)
  }

  test("m08: accounting reads refs only — no blob file is opened") {
    val docs = Tables.documents(spark, sf)
    val out = BlobStore.accounting(docs, cacheKey = sf)
    val files = out.inputFiles
    assert(files.nonEmpty)
    assert(files.forall(_.contains("/refs/")),
      s"storage accounting must be metadata-only: ${files.take(3).toSeq}")
    val r = out.agg(sum(col("n_refs")), sum(col("n_blobs"))).collect()(0)
    assert(r.getLong(0) >= r.getLong(1))
  }

  test("m08: shared content is stored once and accounted logically") {
    // this corpus happens to have no byte-identical texts (every
    // md5 distinct — m05 reports n_copies=1 across the board), so
    // the SHARING half of the CAS contract needs a planted re-post:
    // three docs, two sharing bytes, split across the two demo
    // ingest slices (doc 2 and 3 land in different batches)
    import spark.implicits._
    val docs = Seq(
      (2L, "web", "shared payload"),
      (3L, "forum", "shared payload"),
      (4L, "web", "unique payload"))
      .toDF("doc_id", "source", "text")
    val root = BlobStore.stage(docs) // no cacheKey: fresh tree
    assert(BlobStore.readBlobs(spark, root).count() === 2L,
      "two distinct contents -> two blobs, the re-post stored never")
    val acct = BlobStore.accounting(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // per-source grain: each source holds its OWN distinct set
    assert(acct.toSeq === Seq(("forum", 1L, 1L), ("web", 2L, 2L)))
    // and both re-post doc_ids reconstruct to the same bytes
    val bytes = BlobStore.fetch(spark, root,
        Seq(2L, 3L).toDF("doc_id"))
      .collect().map(r => new String(r.getAs[Array[Byte]](1), "UTF-8"))
    assert(bytes.toSeq.sorted === Seq("shared payload", "shared payload"))
  }
}
