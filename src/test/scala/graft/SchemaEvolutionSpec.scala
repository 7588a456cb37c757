package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{PartitionUpsert, TimeTravel}

/** k24_schema_evolution — schema as commit-log state: an evolved
  * commit widens the column set for ITS version onward, old versions
  * keep their exact schema, inherited partitions surface the new
  * column as NULL, and restore/clone carry the schema pointer with
  * the manifest.
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  import TestSpark._

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.select(col("doc_id"), col("source"), col("text"), col("lang"))
      .collect().map(_.toSeq).toSet

  test("k24: old versions keep their schema and rows; the evolved version widens") {
    val docs = Tables.documents(spark, sf)
    val dir = graft.Staging.dir("graft_k24spec_")
    TimeTravel.stageBase(docs, dir)
    TimeTravel.commitChanges(docs, dir)
    val v1Before = rows(TimeTravel.readAt(spark, dir, 1))
    val v2Before = rows(TimeTravel.readAt(spark, dir, 2))
    TimeTravel.commitEvolved(spark, dir,
      TimeTravel.evolveChangelog(TimeTravel.readAt(spark, dir, 2)),
      "c3", TimeTravel.EvolvedSchema,
      Seq("quality" -> round(length(col("text")) / 100.0, 4)))
    // old versions: EXACT old column set, identical rows
    assert(TimeTravel.readAt(spark, dir, 1).columns.toSeq ===
      Seq("doc_id", "source", "text", "lang"))
    assert(rows(TimeTravel.readAt(spark, dir, 1)) === v1Before)
    assert(rows(TimeTravel.readAt(spark, dir, 2)) === v2Before)
    // the evolved version reads the widened schema
    val v3 = TimeTravel.readAt(spark, dir, 3)
    assert(v3.columns.contains("quality"))
    // rewritten partitions carry quality exactly; inherited ones
    // surface typed NULL
    val evolved = v3.filter(col("lang").isin("es", "zh"))
    assert(evolved.filter(col("quality").isNull).count() === 0L)
    assert(evolved.filter(
      col("quality") =!= round(length(col("text")) / 100.0, 4)).count()
      === 0L)
    val inherited = v3.filter(!col("lang").isin("es", "zh") ||
      col("lang").isNull)
    assert(inherited.count() > 0L)
    assert(inherited.filter(col("quality").isNotNull).count() === 0L)
    // the changelog took effect in the same commit
    assert(v3.filter(col("text").like("% v4")).count() > 0L)
    // a founding-schema commit to the evolved catalog is refused
    // loudly (it would silently drop the evolved column)
    intercept[IllegalArgumentException] {
      TimeTravel.commitVersion(spark, dir,
        PartitionUpsert.changelog(PartitionUpsert.demoBase(docs)), "cX")
    }
  }

  test("k24: restore and clone carry the schema pointer with the manifest") {
    val docs = Tables.documents(spark, sf)
    val dir = TimeTravel.stageEvolved(docs, cacheKey = sf)
    // restore of the evolved version keeps its column set
    val v4 = TimeTravel.restore(spark, dir, 3)
    assert(TimeTravel.readAt(spark, dir, v4).columns.contains("quality"))
    // restore of a pre-evolution version returns to the old set
    val v5 = TimeTravel.restore(spark, dir, 2)
    assert(!TimeTravel.readAt(spark, dir, v5).columns.contains("quality"))
    // a clone taken at the evolved version reads it identically
    val dst = graft.Staging.dir("graft_k24clone_")
    TimeTravel.cloneAt(spark, dir, dst, 3)
    val srcV3 = TimeTravel.readAt(spark, dir, 3)
      .collect().map(_.toSeq).toSet
    val cloneV1 = TimeTravel.readAt(spark, dst, 1)
      .collect().map(_.toSeq).toSet
    assert(cloneV1 === srcV3,
      "the clone must read the evolved version column-for-column")
  }

  test("k24: registered query separates the versions' schemas exactly") {
    val out = SparkEntry.queries("k24_schema_evolution")(spark, sf)
      .collect()
    val byV = out.groupBy(_.getAs[Long]("version"))
    assert(byV.keySet === Set(1L, 2L, 3L))
    Seq(1L, 2L).foreach { v =>
      assert(byV(v).forall(_.getAs[Long]("n_quality") == 0L),
        s"v$v predates the column and must carry no quality values")
      assert(byV(v).forall(_.getAs[Long]("quality_checksum") == 0L))
    }
    val v3ByLang = byV(3L).map(r =>
      r.getAs[String]("lang") -> r).toMap
    TimeTravel.EvolveLangs.foreach { l =>
      val r = v3ByLang(l)
      assert(r.getAs[Long]("n_quality") === r.getAs[Long]("n_docs"),
        s"every rewritten $l row must carry quality")
      assert(r.getAs[Long]("quality_checksum") ===
        r.getAs[Long]("chars_checksum"),
        "de-scaled quality must equal the char checksum exactly")
    }
    v3ByLang.collect { case (l, r) if !TimeTravel.EvolveLangs.contains(l) =>
      assert(r.getAs[Long]("n_quality") === 0L,
        s"inherited partition $l must surface NULL quality")
    }
  }
}
