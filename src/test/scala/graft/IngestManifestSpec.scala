package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.IngestManifest

/** k11: reconciliation must hand every source the RIGHT verdict —
  * the simulated drop plants two missing and two partial sources, so
  * all three status branches are exercised — and the per-file fetch
  * detail must roll up to the reconciliation's delivered side
  * exactly (the manifest is one set of facts viewed at two grains,
  * not two independent computations that happen to agree today).
  */
class IngestManifestSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val docs = Tables.documents(spark, sf)
  private lazy val recon =
    IngestManifest.reconcile(docs, cacheKey = sf).cache()

  test("k11: every catalog source gets exactly one verdict row") {
    val expected = docs.select("source").distinct().count()
    assert(recon.count() == expected)
    assert(recon.select("source").distinct().count() == expected)
  }

  test("k11: statuses land on the planted failure pattern") {
    val byStatus = recon.collect()
      .map(r => r.getAs[String]("source") -> r.getAs[String]("status"))
      .toMap
    assert(IngestManifest.missingSources.forall(s =>
      byStatus(s) == "missing"), s"planted-missing misclassified: $byStatus")
    assert(byStatus("src3") == "partial" && byStatus("src17") == "partial",
      s"planted-partial misclassified: $byStatus")
    val others = byStatus.view
      .filterKeys(k => !Set("src3", "src7", "src13", "src17")(k))
    assert(others.forall(_._2 == "complete"),
      s"untouched sources must be complete: ${others.toMap}")
  }

  test("k11: missing sources report zero delivered, full expected") {
    recon.filter(col("status") === "missing").collect().foreach { r =>
      assert(r.getAs[Long]("n_delivered") == 0L)
      assert(r.getAs[Long]("bytes_delivered") == 0L)
      assert(r.getAs[Long]("key_delivered") == 0L)
      assert(r.getAs[Long]("n_expected") > 0L)
    }
  }

  test("k11: partial sources delivered strictly between 0 and expected") {
    recon.filter(col("status") === "partial").collect().foreach { r =>
      val d = r.getAs[Long]("n_delivered")
      assert(d > 0L && d < r.getAs[Long]("n_expected"),
        s"partial ${r.getAs[String]("source")}: $d")
    }
  }

  test("k11: per-file fetch detail rolls up to the delivered side") {
    val rolled = IngestManifest.fetchManifest(docs, cacheKey = sf)
      .groupBy("source")
      .agg(sum("n_rows").cast("long").as("n"),
        sum("key_checksum").cast("long").as("k"),
        sum("bytes_payload").cast("long").as("b"))
      .collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n"), r.getAs[Long]("k"), r.getAs[Long]("b")))
      .toMap
    val delivered = recon.filter(col("n_delivered") > 0).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_delivered"), r.getAs[Long]("key_delivered"),
          r.getAs[Long]("bytes_delivered")))
      .toMap
    assert(rolled == delivered,
      s"file grain and source grain disagree:\n$rolled\nvs\n$delivered")
  }

  test("k11: file sizes are real and file count is writer-bounded") {
    val files = IngestManifest.fetchManifest(docs, cacheKey = sf)
      .select("source", "file_name", "file_size").collect()
    assert(files.forall(_.getAs[Long]("file_size") > 0L))
    val perSource = files.groupBy(_.getAs[String]("source"))
      .view.mapValues(_.map(_.getAs[String]("file_name")).distinct.length)
    assert(perSource.forall(_._2 <= 4), // writers = 4 default
      s"salted writers must bound files per source: ${perSource.toMap}")
  }

  test("k11: staging is memoized per cacheKey") {
    val a = IngestManifest.stageDrop(docs, cacheKey = sf)
    val b = IngestManifest.stageDrop(docs, cacheKey = sf)
    assert(a == b, "same cacheKey must reuse the staged tree")
  }
}
