package graft

import java.nio.file.Files

import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TextIngest

class TextIngestSpec extends AnyFunSuite {
  import TestSpark._

  private val docSchema = StructType(new StructType()
    .add("doc_id", "long").add("lang", "string").add("text", "string"))

  test("jsonl round-trips the documents table and counts planted corruption") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "lang", "text")
    val dir = graft.Staging.dir("graft_jsonl_")
    docs.write.mode("overwrite").json(dir)
    // Plant malformed lines alongside the good ones.
    Seq("{ not json at all", "{\"doc_id\": \"also broken")
      .toDF("value").write.mode("append").text(dir)

    val ingested = TextIngest.readJsonl(spark, dir, docSchema)
    val (clean, corrupt) = TextIngest.split(ingested)
    assert(corrupt.count() === 2)
    assert(clean.count() === docs.count())
    // Byte-exact round trip of the payloads.
    val a = docs.collect().map(r => (r.getLong(0), r.getString(2))).toMap
    val b = clean.collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(a === b)

    val s = TextIngest.ingestSummary(ingested).collect()(0)
    assert(s.getLong(0) === docs.count())
    assert(s.getLong(1) === 2L)
  }

  test("warc-lite splits records at the version marker and extracts payloads") {
    val dir = graft.Staging.dir("graft_warc_")
    Files.writeString(java.nio.file.Paths.get(dir, "crawl.warc"),
      "WARC/1.0\r\n" +
        "WARC-Type: response\r\n" +
        "WARC-Target-URI: https://example.org/a\r\n" +
        "Content-Length: 11\r\n" +
        "\r\n" +
        "hello there\r\n" +
        "WARC/1.0\r\n" +
        "WARC-Type: metadata\r\n" +
        "WARC-Target-URI: https://example.org/b\r\n" +
        "\r\n" +
        "k: v\r\n" +
        "WARC/1.0\r\n" +
        "NotARealHeader: x\r\n" +
        "\r\n" +
        "payload without type\r\n")
    val out = TextIngest.readWarcLite(spark, dir).collect()
      .map(r => (Option(r.getString(0)), r.getString(1), r.getString(2)))
    assert(out.length === 3)
    val byUri = out.map(t => t._2 -> t).toMap
    assert(byUri("https://example.org/a")._1 === Some("response"))
    assert(byUri("https://example.org/a")._3.startsWith("hello there"))
    assert(byUri("https://example.org/b")._1 === Some("metadata"))
    assert(byUri("https://example.org/b")._3.startsWith("k: v"))
    val untyped = out.find(_._1.isEmpty)
    assert(untyped.isDefined, "typeless record must surface with null type")
    assert(untyped.get._3.startsWith("payload without type"))
  }

  test("warc-lite: marker-bearing payload is flagged, never silently split") {
    val dir = graft.Staging.dir("graft_warc_marker_")
    // Record b's payload contains the version marker on its own line,
    // so the lineSep split cuts it mid-payload. The documented
    // contract: the head fragment is truncated (declared 40 bytes,
    // carries fewer) and the tail fragment has no WARC headers — both
    // detectable, neither silent.
    Files.writeString(java.nio.file.Paths.get(dir, "crawl.warc"),
      "WARC/1.0\r\n" +
        "WARC-Type: response\r\n" +
        "WARC-Target-URI: https://example.org/a\r\n" +
        "Content-Length: 20\r\n" +
        "\r\n" +
        "AAAA BBBB CCCC DDDD!\r\n" +
        "WARC/1.0\r\n" +
        "WARC-Type: response\r\n" +
        "WARC-Target-URI: https://example.org/b\r\n" +
        "Content-Length: 40\r\n" +
        "\r\n" +
        "payload that mentions\r\n" +
        "WARC/1.0\r\n" +
        "in running text\r\n" +
        "WARC/1.0\r\n" +
        "WARC-Type: response\r\n" +
        "WARC-Target-URI: https://example.org/c\r\n" +
        "Content-Length: 5\r\n" +
        "\r\n" +
        "hello\r\n")
    val out = TextIngest.readWarcLite(spark, dir).collect()
      .map(r => (Option(r.getString(0)), r.getString(1),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4)))
    assert(out.length === 4, "three records + one orphaned tail fragment")
    val byUri = out.filter(_._1.isDefined).map(t => t._2 -> t).toMap
    assert(!byUri("https://example.org/a")._4, "intact record a not flagged")
    assert(!byUri("https://example.org/c")._4, "intact record c not flagged")
    assert(byUri("https://example.org/b")._4,
      "head fragment of the split record must be flagged truncated")
    assert(byUri("https://example.org/b")._3 === Some(40L))
    val orphans = out.filter(_._1.isEmpty)
    assert(orphans.length === 1,
      "the payload tail must surface as exactly one typeless fragment")
  }

  test("csv ingest parses a headered file and flags short rows") {
    val dir = graft.Staging.dir("graft_csv_")
    Files.writeString(java.nio.file.Paths.get(dir, "part.csv"),
      """doc_id,lang,text
        |1,en,"hello world"
        |broken line without commas
        |2,de,"hallo welt"
        |""".stripMargin)
    val ingested = TextIngest.readCsv(spark, dir, docSchema)
    val (clean, corrupt) = TextIngest.split(ingested)
    assert(clean.count() === 2)
    assert(corrupt.count() === 1)
    assert(clean.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
  }

  test("csv header drop takes exactly one line per file, not every lookalike") {
    import org.apache.spark.sql.types.StructType
    val schema = StructType(new StructType()
      .add("a", "string").add("b", "string"))
    val dir = graft.Staging.dir("graft_csv_hdr_")
    // file 1: a DATA row that happens to equal the header line —
    // exactly one copy is dropped (the header), the data row survives
    Files.writeString(java.nio.file.Paths.get(dir, "one.csv"),
      "a,b\nx,y\na,b\nz,w\n")
    // file 2: its own header must also be dropped (per-file, not global)
    Files.writeString(java.nio.file.Paths.get(dir, "two.csv"),
      "a,b\np,q\n")
    val (clean, corrupt) = TextIngest.split(
      TextIngest.readCsv(spark, dir, schema))
    assert(corrupt.count() === 0)
    val rows = clean.collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.sorted.toSeq ===
      Seq(("a", "b"), ("p", "q"), ("x", "y"), ("z", "w")))
  }

  test("k04: fastq round trip — stats equal the closed form, '@' quality survives") {
    val docs = Tables.documents(spark, TestSpark.sf)
    val out = SparkEntry.queries("k04_fastq_ingest")(spark, TestSpark.sf)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val expected = docs.select("doc_id", "n_chars").collect().map { r =>
      val (id, nc) = (r.getLong(0), r.getLong(1))
      val len = nc % 80 + 20
      val gc = (0L until len).count(p => Set(1L, 2L)((id + p) % 4)).toLong
      val qs = (0L until len).map(p => 33L + (id + p) % 40).sum
      id -> (len, gc, qs)
    }.toMap
    assert(out === expected)
    // at least one staged read's quality line starts with '@'
    // (doc_id % 40 == 31) — positional grouping must not split there
    assert(docs.filter("doc_id % 40 = 31").count() > 0, "fixture check")
  }

  test("k04: malformed records flagged, never silently dropped") {
    val dir = graft.Staging.dir("fastq_spec_")
    Files.writeString(java.nio.file.Paths.get(dir, "bad.fastq"),
      "@r1\nACGT\n+\n!!!!\n" +       // well-formed
      "@r2\nACGT\n+\n!!!\n" +        // |qual| != |seq|
      "@r3\nACGT\nX\n!!!!\n")        // bad separator
    val rows = TextIngest.readFastq(spark, dir).collect()
      .map(r => r.getString(0) -> r.getBoolean(4)).toMap
    assert(rows === Map("r1" -> true, "r2" -> false, "r3" -> false))
  }
}
