package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.FileBloomIndex

/** k17: the bloom-indexed fetch must be (a) exact — equals the
  * direct predicate on documents, (b) sound — candidate files are a
  * superset of the files that truly hold the ids (no false
  * negatives, the bloom guarantee the exactness rests on), (c)
  * selective — the probe reads a strict subset of the tree (the
  * whole point), with the false-positive surplus bounded.
  */
class FileBloomIndexSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val documents = Tables.documents(spark, sf)

  test("k17: indexed fetch equals the direct lookup") {
    val got = SparkEntry.queries("k17_bloom_point_lookup")(spark, sf)
      .collect().map(_.toSeq).toSet
    val want = documents
      .filter(col("doc_id").isNotNull &&
        pmod(col("doc_id"), lit(FileBloomIndex.LookupMod))
          === FileBloomIndex.LookupRes)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .collect().map(_.toSeq).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("k17: candidates cover every true file and skip most of the tree") {
    val dir = FileBloomIndex.stageStore(documents, cacheKey = sf)
    val idx = FileBloomIndex.ensureIndex(spark, dir)
    val wanted = documents
      .filter(col("doc_id").isNotNull &&
        pmod(col("doc_id"), lit(FileBloomIndex.LookupMod))
          === FileBloomIndex.LookupRes)
      .select(col("doc_id")).distinct()
    val candidates =
      FileBloomIndex.candidateFiles(spark, idx, wanted).toSet

    // ground truth: the files that actually hold the wanted ids
    // (_metadata must be projected off the scan before the join)
    val trueFiles = FileBloomIndex.readStore(spark, dir)
      .select(col("doc_id"), col("_metadata.file_path").as("file"))
      .join(wanted, Seq("doc_id"), "left_semi")
      .select(col("file")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(trueFiles.subsetOf(candidates),
      s"bloom produced a FALSE NEGATIVE: ${trueFiles -- candidates}")

    val allFiles = FileBloomIndex.readStore(spark, dir)
      .select(col("_metadata.file_path")).distinct().count()
    assert(candidates.size < allFiles,
      s"index prunes nothing: ${candidates.size} of $allFiles files")
    // surplus = false-positive files; at ~10 bits/key it stays small
    assert(candidates.size - trueFiles.size <= allFiles / 4,
      s"false-positive surplus too high: ${candidates.size} candidates " +
        s"for ${trueFiles.size} true files of $allFiles")
  }

  test("k17: a planted miss probes zero files") {
    val dir = FileBloomIndex.stageStore(documents, cacheKey = sf)
    val idx = FileBloomIndex.ensureIndex(spark, dir)
    // ids far outside the corpus key space
    val ghosts = spark.range(900000000L, 900000005L)
      .select(col("id").as("doc_id"))
    val candidates = FileBloomIndex.candidateFiles(spark, idx, ghosts)
    val allFiles = FileBloomIndex.readStore(spark, dir)
      .select(col("_metadata.file_path")).distinct().count()
    assert(candidates.size <= allFiles / 4,
      s"absent keys should touch (almost) nothing, got ${candidates.size}")
  }
}
