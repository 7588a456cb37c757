package graft

import java.io.File

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.PartitionUpsert

/** k12: the sink's whole value is what does NOT happen — partitions
  * the changelog doesn't touch must stay byte-identical on disk —
  * plus q28's merge semantics on what does, and idempotence under
  * re-apply (the CDC job that runs twice must not corrupt).
  */
class PartitionUpsertSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val docs = Tables.documents(spark, sf)

  /** (file name, size, mtime) per lang directory. */
  private def listing(dir: String): Map[String, Set[(String, Long, Long)]] =
    new File(dir).listFiles().filter(_.getName.startsWith("lang="))
      .map { d =>
        d.getName -> d.listFiles().filter(_.getName.startsWith("part-"))
          .map(f => (f.getName, f.length(), f.lastModified())).toSet
      }.toMap

  test("k12: untouched partitions stay byte-identical on disk") {
    val dir = graft.Staging.dir("graft_k12_spec_") + "/tree"
    val base = PartitionUpsert.demoBase(docs)
    base
      .repartition(col("lang"), pmod(xxhash64(col("doc_id")), lit(4)))
      .write.option("partitionOverwriteMode", "dynamic")
      .partitionBy("lang").parquet(dir)
    val before = listing(dir)
    assert(before.contains("lang=" + PartitionUpsert.HiveNull),
      "demo base must materialize the hive default partition")
    PartitionUpsert.applyChanges(spark, dir,
      PartitionUpsert.changelog(base))
    val after = listing(dir)
    val changed = PartitionUpsert.ChangedPartitionDirs
    before.keys.filterNot(changed).foreach { lang =>
      assert(after(lang) === before(lang),
        s"$lang was rewritten despite an empty changelog for it")
    }
    changed.filter(before.contains).foreach { lang =>
      assert(after(lang) !== before(lang), s"$lang must be rewritten")
    }
  }

  test("k12: NULL-partition base rows survive an unrelated-key upsert") {
    // the silent-data-loss shape: an isin prune drops NULL-lang base
    // rows while dynamic overwrite still rewrites the NULL partition
    // from the changelog side — every unrelated-key null row vanishes.
    // The null-safe path must keep them, byte-for-byte.
    val dir = graft.Staging.dir("graft_k12_null_") + "/tree"
    val base = PartitionUpsert.demoBase(docs)
    PartitionUpsert.writeTree(base, dir)
    val cl = PartitionUpsert.changelog(base)
    // the demo changelog REALLY touches the null partition both ways
    assert(cl.filter(col("lang").isNull && col("op") === "upsert")
      .count() > 0, "demo changelog needs a NULL-partition upsert")
    assert(cl.filter(col("lang").isNull && col("op") === "delete")
      .count() > 0, "demo changelog needs a NULL-partition delete")
    val untouchedBefore = base.filter(col("lang").isNull)
      .join(cl.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
      .collect().map(_.toSeq).toSet
    assert(untouchedBefore.nonEmpty,
      "some NULL-partition rows must be unrelated to the changelog")
    PartitionUpsert.applyChanges(spark, dir, cl)
    val nullAfter = spark.read
      .schema("doc_id BIGINT, source STRING, text STRING, lang STRING")
      .parquet(dir)
      .filter(col("lang").isNull).collect().map(_.toSeq).toSet
    untouchedBefore.foreach { r =>
      assert(nullAfter.contains(r),
        s"unrelated NULL-partition row $r was lost by the merge")
    }
  }

  test("k12: read-back equals the relational merge of base + changelog") {
    val out = SparkEntry.queries("k12_partition_upsert")(spark, sf)
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("key_checksum"),
          r.getAs[Long]("chars_checksum"), r.getAs[Long]("n_upserted")))
      .toMap
    val changedLangs = PartitionUpsert.ChangedLangs.toSet
    val expected = PartitionUpsert.demoBase(docs)
      .select(col("doc_id"), col("lang"), col("text"))
      .withColumn("hit",
        col("lang").isin(changedLangs.toSeq: _*) || col("lang").isNull)
      .withColumn("del", col("hit") && pmod(col("doc_id"), lit(11L)) === 4L)
      .withColumn("up",
        col("hit") && pmod(col("doc_id"), lit(3L)) === 0L && !col("del"))
      .filter(!col("del"))
      .withColumn("text_out",
        when(col("up"), concat(col("text"), lit(" v2")))
          .otherwise(col("text")))
      .groupBy("lang")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(col("doc_id")).cast("long").as("k"),
        sum(length(col("text_out"))).cast("long").as("c"),
        sum(when(col("text_out").like("% v2"), 1L).otherwise(0L))
          .cast("long").as("u"))
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n"), r.getAs[Long]("k"), r.getAs[Long]("c"),
          r.getAs[Long]("u")))
      .toMap
    assert(out === expected)
    assert(PartitionUpsert.ChangedLangs.exists(l =>
      out.get(l).exists(_._4 > 0)), "changed langs must show upserts")
  }

  test("st12: streaming convergent apply equals batch k12 exactly") {
    val batch = SparkEntry.queries("k12_partition_upsert")(spark, sf)
      .collect().map(_.toSeq).toSet
    val stream = SparkEntry.queries("st12_stream_upsert")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(stream === batch)
    assert(batch.nonEmpty)
  }

  test("st12: application is ORDER-independent (reversed feed, same tree)") {
    import graft.sources.PartitionUpsert
    val demo = PartitionUpsert.demoBase(docs)
    val full = PartitionUpsert.changelog(demo).cache()
    val b1 = full.filter(col("seq") === 1L) // upserts
    val b2 = full.filter(col("seq") === 2L) // deletes
    def stateAfter(batches: Seq[org.apache.spark.sql.DataFrame]) = {
      val dir = graft.Staging.dir("graft_st12_order_") + "/tree"
      PartitionUpsert.stageConvergentBase(demo, dir)
      batches.foreach(b => PartitionUpsert.applyConvergent(spark, dir, b))
      PartitionUpsert.convergentState(spark, dir)
        .collect().map(_.toSeq).toSet
    }
    val forward = stateAfter(Seq(b1, b2))
    val reversed = stateAfter(Seq(b2, b1))
    assert(forward === reversed,
      "max-seq + tombstones must converge under any arrival order")
    // the deletes really do beat the upserts they overlap with: the
    // reversed run must NOT resurrect a deleted key
    val deletedIds = b2.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(reversed.forall(r => !deletedIds(r.head.asInstanceOf[Long])))
  }

  test("st12: a replayed batch is a natural no-op (equal seq never wins)") {
    import graft.sources.PartitionUpsert
    val dir = graft.Staging.dir("graft_st12_replay_") + "/tree"
    val demo = PartitionUpsert.demoBase(docs)
    PartitionUpsert.stageConvergentBase(demo, dir)
    val batch = PartitionUpsert.changelog(demo)
    PartitionUpsert.applyConvergent(spark, dir, batch)
    val first = PartitionUpsert.convergentState(spark, dir)
      .collect().map(_.toSeq).toSet
    PartitionUpsert.applyConvergent(spark, dir, batch)
    val second = PartitionUpsert.convergentState(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(second === first)
  }

  test("k12: re-applying the same changelog is idempotent") {
    val dir = PartitionUpsert.stageApplied(docs, cacheKey = sf)
    def summarize() =
      spark.read
        .schema("doc_id BIGINT, source STRING, text STRING, lang STRING")
        .parquet(dir)
        .groupBy("lang")
        .agg(count(lit(1)).as("n"), sum(length(col("text"))).as("c"))
        .collect().map(r => (r.getString(0), r.getLong(1),
          r.getAs[Long]("c"))).toSet
    val first = summarize()
    PartitionUpsert.applyChanges(spark, dir,
      PartitionUpsert.changelog(PartitionUpsert.demoBase(docs)))
    assert(summarize() === first,
      "second apply of the same changelog must not change state")
  }
}
