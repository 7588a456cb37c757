package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{ColumnStats, PartitionUpsert, TimeTravel}

class ColumnStatsSpec extends AnyFunSuite {
  import TestSpark._

  /** Direct exact aggregate over a catalog version — what the stats
    * artifact must equal row for row.
    */
  private def direct(dir: String, v: Int): Set[Seq[Any]] =
    TimeTravel.readAt(spark, dir, v)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(col("doc_id")).as("ndv_doc_id"),
        min(col("doc_id")).as("min_doc_id"),
        max(col("doc_id")).as("max_doc_id"),
        coalesce(sum(length(col("text"))).cast("long"), lit(0L))
          .as("chars_sum"),
        sum(when(col("text").isNull, 1L).otherwise(0L)).as("n_text_null"))
      .collect().map(_.toSeq).toSet

  test("k29: v2 ANALYZE rescans only rewritten partitions and stays exact") {
    val docs = Tables.documents(spark, sf)
    val dir = graft.Staging.dir("graft_k29spec_")
    TimeTravel.stageBase(docs, dir)
    TimeTravel.commitChanges(docs, dir)
    // v1: no prior stats exist — every manifest partition is scanned
    val r1 = ColumnStats.analyze(spark, dir, 1).map(Option(_)).toSet
    val m1 = spark.read.parquet(s"$dir/meta/v1").collect()
      .map(r => Option(r.getString(0)) -> r.getString(1)).toMap
    assert(r1 === m1.keySet, "first ANALYZE must scan every partition")
    val v1Stats = spark.read.parquet(s"$dir/meta/stats_v1")
      .collect().map(_.toSeq).toSet
    // v2: the rescan set is exactly the partitions whose serving
    // tree changed (derived from the manifest diff, not hardcoded)
    val r2 = ColumnStats.analyze(spark, dir, 2).map(Option(_)).toSet
    val m2 = spark.read.parquet(s"$dir/meta/v2").collect()
      .map(r => Option(r.getString(0)) -> r.getString(1)).toMap
    val expect = m2.filter { case (l, c) => !m1.get(l).contains(c) }.keySet
    assert(r2 === expect,
      s"incremental ANALYZE rescanned $r2, manifest diff says $expect")
    assert(expect.size < m2.size,
      "demo commit must leave some partition unchanged (else the " +
        "reuse path is untested)")
    // reused rows are the v1 rows verbatim; v1's artifact unchanged
    val v2Stats = spark.read.parquet(s"$dir/meta/stats_v2")
      .collect().map(_.toSeq).toSet
    val reusedLangs = m2.keySet -- expect
    val reusedV2 = v2Stats.filter(r => reusedLangs.contains(
      Option(r.head.asInstanceOf[String])))
    assert(reusedV2.subsetOf(v1Stats),
      "unchanged partitions must reuse their v1 stats rows verbatim")
    assert(spark.read.parquet(s"$dir/meta/stats_v1")
      .collect().map(_.toSeq).toSet === v1Stats,
      "analyzing v2 must not rewrite v1's artifact")
    // exactness: both artifacts equal a direct full aggregate
    def dropTree(rows: Set[Seq[Any]]): Set[Seq[Any]] =
      rows.map(r => r.head +: r.drop(3)) // (lang, stats...) sans tree id
    assert(dropTree(v1Stats) === direct(dir, 1))
    assert(dropTree(v2Stats) === direct(dir, 2))
  }

  test("k29: registered read-back is metadata-only with sane stats") {
    val docs = Tables.documents(spark, sf)
    val df = ColumnStats.columnStats(docs)
    // the stats query must never open a data file — its whole scan
    // set lives under the catalog's meta/ directory
    assert(df.inputFiles.nonEmpty)
    assert(df.inputFiles.forall(_.contains("/meta/stats_v")),
      "stats read-back listed a non-meta file")
    val rows = df.collect()
    val v1 = rows.filter(_.getLong(0) == 1L)
    assert(v1.map(_.getLong(2)).sum ===
      PartitionUpsert.demoBase(docs).count(),
      "v1 row counts must total the staged pre-image")
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), "ndv <= n_rows")
      assert(r.getLong(4) <= r.getLong(5), "min <= max")
    }
  }

  test("k29: an all-NULL-doc_id partition records NULL min/max") {
    import spark.implicits._
    // one healthy partition plus one whose every key is NULL — the
    // min/max aggregates come back NULL and ANALYZE must record
    // them as such, not NPE on getLong (r15 ADVICE regression)
    val docs = (Seq((Some(1L), "s", "alpha beta", "en"),
        (Some(2L), "s", "gamma", "en")) ++
      Seq.fill(3)((None: Option[Long], "s", "orphan row", "qq")))
      .toDF("doc_id", "source", "text", "lang")
    val dir = graft.Staging.dir("graft_k29null_")
    TimeTravel.stageBase(docs, dir)
    val scanned = ColumnStats.analyze(spark, dir, 1)
    assert(scanned.contains("qq"))
    val stats = spark.read.parquet(s"$dir/meta/stats_v1").collect()
      .map(r => Option(r.getString(0)) -> r).toMap
    val qq = stats(Some("qq"))
    assert(qq.getAs[Long]("n_rows") === 3L)
    assert(qq.getAs[Long]("ndv_doc_id") === 0L)
    assert(qq.isNullAt(qq.fieldIndex("min_doc_id")))
    assert(qq.isNullAt(qq.fieldIndex("max_doc_id")))
    val en = stats(Some("en"))
    assert(en.getAs[Long]("min_doc_id") === 1L &&
      en.getAs[Long]("max_doc_id") === 2L)
  }
}
