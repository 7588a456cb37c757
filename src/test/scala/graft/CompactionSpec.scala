package graft

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Compaction

class CompactionSpec extends AnyFunSuite {
  import TestSpark._

  test("k03: compaction collapses fragmented partitions to capped file counts") {
    val docs = Tables.documents(spark, sf)
    val frag = graft.Staging.dir("k03_spec_frag_")
    docs.repartition(8, col("doc_id"))
      .write.mode(SaveMode.Overwrite).partitionBy("lang").parquet(frag)
    val before = Compaction.fileCounts(spark, frag)
    assert(before.values.forall(_ > 1),
      s"staging must be fragmented (got $before)")

    val out = graft.Staging.dir("k03_spec_out_")
    val compacted = Compaction.compact(spark, frag, out, "lang")
    val after = Compaction.fileCounts(spark, out)
    assert(after.keySet === before.keySet, "no partition value lost")
    assert(after.values.forall(_ === 1),
      s"default cap: one file per partition value (got $after)")

    // row-level preservation: same multiset of (doc_id, n_chars)
    val a = docs.select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = compacted.select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a === b)
  }

  test("k03: maxRecordsPerFile splits an oversized partition, never merges values") {
    val docs = Tables.documents(spark, sf)
    val frag = graft.Staging.dir("k03_spec_frag2_")
    docs.repartition(4, col("doc_id"))
      .write.mode(SaveMode.Overwrite).partitionBy("lang").parquet(frag)
    val out = graft.Staging.dir("k03_spec_out2_")
    Compaction.compact(spark, frag, out, "lang", maxRecordsPerFile = 25L)
    val perLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = Compaction.fileCounts(spark, out)
    assert(after.nonEmpty)
    after.foreach { case (dir, files) =>
      val rows = perLang(dir.stripPrefix("lang="))
      assert(files === math.ceil(rows / 25.0).toInt,
        s"$dir: $files files for $rows rows at cap 25")
    }
  }

  test("k03: salted writers parallelize a value's rewrite, file count bounded") {
    val docs = Tables.documents(spark, sf)
    val frag = graft.Staging.dir("k03_spec_frag3_")
    docs.repartition(8, col("doc_id"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("lang").parquet(frag)
    val out = graft.Staging.dir("k03_spec_out3_")
    val writers = 4
    Compaction.compact(spark, frag, out, "lang",
      writersPerPartition = writers)
    val before = Compaction.fileCounts(spark, frag)
    val after = Compaction.fileCounts(spark, out)
    assert(after.keySet === before.keySet)
    after.foreach { case (dir, files) =>
      assert(files <= writers && files >= 1,
        s"$dir: $files files with $writers salted writers")
      assert(files <= before(dir), s"$dir must not gain files")
    }
  }
}
