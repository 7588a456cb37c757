package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Formats

class FormatsSpec extends AnyFunSuite {
  import TestSpark._

  test("k05: ORC round trip preserves every row; scan prunes partitions") {
    val docs = Tables.documents(spark, sf)
    val out = Formats.orcRoundtrip(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // equality with the same aggregate over the parquet original —
    // any row lost/duplicated/corrupted by the format hop flips a
    // count or checksum
    val want = docs.filter(col("lang").isin("en", "de"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).cast("long").as("cc"),
        sum(col("doc_id")).cast("long").as("kc"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out === want)
    assert(out.nonEmpty && out.keySet.forall(k => Set("en", "de")(k._1)))
    // the lang predicate must reach the ORC scan as a PARTITION
    // filter (directory pruning), not a post-scan row filter
    val plan = Formats.orcRoundtrip(docs)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
        .contains("lang"),
      s"lang must prune partitions, plan was:\n$plan")
  }

  test("k06: CSV round trip survives quoting hazards and null-vs-empty") {
    import spark.implicits._
    val spark2 = spark
    import java.nio.file.Files
    // every classic CSV hazard: separators, quotes, newlines, CRLF,
    // CJK, the escape char itself, plus null and EMPTY text (which
    // default CSV options conflate)
    val hazards = Seq(
      (1L, "en", "src0", "plain text", 10L),
      (2L, "en", "src0", "comma, separated, values", 24L),
      (3L, "en", "src1", "a \"quoted\" phrase", 17L),
      (4L, "en", "src1", "line one\nline two", 17L),
      (5L, "de", "src0", "crlf\r\nline", 10L),
      (6L, "de", "src0", "混合 \"引号\", 和\n换行", 13L),
      (7L, "de", "src1", "", 0L),
      (8L, "de", "src1", null.asInstanceOf[String], 0L))
      .toDF("doc_id", "lang", "source", "text", "n_chars")
    // direct write/read replay with the operator's exact options
    val dir = graft.Staging.dir("graft_k06_spec_") + "/tree"
    hazards.write.option("header", "true").option("escape", "\"")
      .option("nullValue", "\\N").partitionBy("lang").csv(dir)
    val back = spark2.read.schema(hazards.schema)
      .option("header", "true").option("escape", "\"")
      .option("nullValue", "\\N").option("multiLine", "true").csv(dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (Option(r.getAs[String]("text")), r.getAs[String]("lang"),
          r.getAs[String]("source"))).toMap
    val want = hazards.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (Option(r.getAs[String]("text")), r.getAs[String]("lang"),
          r.getAs[String]("source"))).toMap
    assert(back === want,
      "every hazard row must round-trip byte-identically")
    assert(back(7L)._1 === Some(""), "empty text must stay empty")
    assert(back(8L)._1 === None, "null text must stay null")
    // the registered operator's summary equals the parquet original's
    val docs = Tables.documents(spark, sf)
    val out = Formats.csvRoundtrip(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val wantAgg = docs.filter(col("lang").isin("en", "de"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)), sum(col("n_chars")).cast("long"),
        sum(col("doc_id")).cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out === wantAgg)
  }

  test("k07: JSONL round trip — escapes, null-vs-empty, line framing") {
    import spark.implicits._
    import java.nio.file.Files
    val hazards = Seq(
      (1L, "en", "src0", "plain"),
      (2L, "en", "src0", "line one\nline two\r\nthree"),
      (3L, "en", "src1", "quotes \" and \\ backslash"),
      (4L, "de", "src0", "unicode: 混合文本 émoji"),
      (5L, "de", "src1", ""),
      (6L, "de", "src1", null.asInstanceOf[String]))
      .toDF("doc_id", "lang", "source", "text")
    val dir = graft.Staging.dir("graft_k07_spec_") + "/t"
    hazards.write.partitionBy("lang").json(dir)
    val back = spark.read.schema(hazards.schema).json(dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> Option(r.getAs[String]("text")))
      .toMap
    val want = hazards.collect()
      .map(r => r.getAs[Long]("doc_id") -> Option(r.getAs[String]("text")))
      .toMap
    assert(back === want, "every hazard row must round-trip exactly")
    assert(back(5L) === Some("") && back(6L) === None,
      "empty text stays empty; omitted field restores as null")
    // line framing: embedded newlines must be escaped, so the file
    // has exactly one line per record — the property that keeps
    // JSONL splittable (no multiLine reader needed)
    val enFiles = new java.io.File(s"$dir/lang=en").listFiles()
      .filter(f => f.getName.endsWith(".json"))
    val lines = enFiles.flatMap(f =>
      scala.io.Source.fromFile(f, "UTF-8").getLines().toSeq)
    assert(lines.length === 3, "one physical line per en record")
    // the registered operator's summary equals the parquet original's
    val docs = Tables.documents(spark, sf)
    val out = Formats.jsonlRoundtrip(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val wantAgg2 = docs.filter(col("lang").isin("en", "de"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)), sum(col("n_chars")).cast("long"),
        sum(col("doc_id")).cast("long"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out === wantAgg2)
  }

  test("k10: merged read unions the drifted schemas; legacy rows carry null rev") {
    val docs = Tables.documents(spark, sf)
    // drive the staging once, then inspect the tree directly
    Formats.schemaEvolution(docs, cacheKey = "k10spec").collect()
    val outDirs = new java.io.File("/tmp").listFiles()
      .filter(_.getName.startsWith("graft_k10_evo_")).sortBy(_.lastModified)
    assert(outDirs.nonEmpty)
    val tree = outDirs.last.getAbsolutePath + "/tree"
    val merged = spark.read.option("mergeSchema", "true").parquet(tree)
    assert(merged.columns.contains("rev"),
      "union schema must include the late-added column")
    // the null pattern IS the epoch marker
    val legacyIds = merged.filter(col("rev").isNull)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val wantLegacy = docs.filter(col("doc_id") < 250L)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(legacyIds === wantLegacy)
    // new-epoch rows carry the derived rev, never null
    assert(merged.filter(col("rev").isNotNull &&
      col("doc_id") < 250L).count() === 0L)
    assert(merged.filter(col("rev").isNull &&
      col("doc_id") >= 250L).count() === 0L)
    // summary equals the direct computation on the original table
    val got = Formats.schemaEvolution(docs, cacheKey = "k10spec").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val want = docs.groupBy(col("lang"))
      .agg(count(lit(1)),
        sum(when(col("doc_id") < 250L, 1L).otherwise(0L)),
        sum(when(col("doc_id") >= 250L,
          pmod(col("doc_id"), lit(5L)) + 1L).otherwise(0L)).cast("long"),
        sum(col("n_chars")).cast("long"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got === want)
  }
}
