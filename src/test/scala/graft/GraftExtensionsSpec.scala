package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  private lazy val sqlSpark: SparkSession = {
    // Extensions bind at session BUILD time, and getOrCreate returns
    // any live session unchanged — clear the active/default slots so
    // a genuinely new session (sharing the JVM's SparkContext) is
    // built with the extensions, then restore the slots for the
    // other suites.
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // Unconditionally evict this session from the active/default
    // slots: if no session existed before (this suite ran first), a
    // bare restore would leave THIS local[2] session — without the
    // engine configs — as the default that TestSpark.getOrCreate
    // then returns for every other suite.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    prevActive.foreach(SparkSession.setActiveSession)
    prevDefault.foreach(SparkSession.setDefaultSession)
    s
  }

  test("SQL-registered kernels match the Column API") {
    import sqlSpark.implicits._
    Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"))
      .toDF("id", "text").createOrReplaceTempView("t")
    val viaSql = sqlSpark.sql(
      """SELECT id,
               rolling_min_hash(text, 16) AS fp,
               simhash64(split(lower(text), '\\s+')) AS sh,
               minhash_sigs(split(lower(text), '\\s+'), 8) AS ms,
               vector_dot(array(1.0, 2.0), array(3.0, 4.0)) AS dp,
               hyperplane_sig(array(1.0, -2.0, 0.5), 0, 6) AS hs,
               stopword_hits(split(lower(text), '\\s+'),
                             array('the', 'my', 'with')) AS sw,
               pq_adc(array(1, 2), array(10.0, 20.0, 30.0,
                                         1.0, 2.0, 3.0), 3) AS adc
         FROM t""").collect()
    viaSql.foreach { r =>
      val text = if (r.getLong(0) == 1L)
        "the quick brown fox jumps over the lazy dog"
      else "pack my box with five dozen liquor jugs"
      assert(r.getAs[Long]("fp") === graft.functions.RollingMinHash.compute(
        text.getBytes("UTF-8"), 16, 31L, 1000000007L))
      assert(r.getAs[Double]("dp") === 11.0)
      assert(r.getAs[Seq[Long]]("ms").length === 8)
      assert(r.getAs[Long]("sh") !== 0L)
      assert(r.getAs[Long]("hs") >= 0L && r.getAs[Long]("hs") < 64L)
      // "the … the …" has 2 hits; "… my … with …" has 2 hits
      assert(r.getAs[Long]("sw") === 2L)
      // slots 0·3+1 and 1·3+2 → 20 + 3
      assert(r.getAs[Double]("adc") === 23.0)
    }
  }

  test("nfc_normalize is SQL-callable and composes the decomposed form") {
    val row = sqlSpark.sql(
      "SELECT nfc_normalize('café') AS n").head
    assert(row.getString(0) === "café")
    // null propagates
    assert(sqlSpark.sql("SELECT nfc_normalize(CAST(NULL AS STRING))")
      .head.isNullAt(0))
  }

  test("deflate_size is SQL-callable; repetition compresses below prose") {
    val rep = sqlSpark.sql(
      "SELECT deflate_size(repeat('ab', 500)) AS n").head.getInt(0)
    assert(rep > 0 && rep < 100) // 1000 bytes of 'ab' collapses
    // null propagates
    assert(sqlSpark.sql("SELECT deflate_size(CAST(NULL AS STRING))")
      .head.isNullAt(0))
  }

  test("bpe_token_count is SQL-callable: greedy rank-ordered merges") {
    // 'ththth' under merges [(t,h)] -> th th th = 3 symbols
    assert(sqlSpark.sql(
      "SELECT bpe_token_count('ththth', array('t'), array('h')) AS n")
      .head.getLong(0) === 3L)
    // rank order matters: (t,h) then (th,e) fuses 'the' to ONE symbol
    assert(sqlSpark.sql(
      "SELECT bpe_token_count('the', array('t','th'), array('h','e')) AS n")
      .head.getLong(0) === 1L)
    // the U+001F boundary is never counted and never fuses
    assert(sqlSpark.sql(
      "SELECT bpe_token_count(concat('t', chr(31), 'h'), " +
        "array('t'), array('h')) AS n")
      .head.getLong(0) === 2L)
    assert(sqlSpark.sql(
      "SELECT bpe_token_count(CAST(NULL AS STRING), array('t'), array('h'))")
      .head.isNullAt(0))
  }

  test("misra_gries is SQL-callable: aggregate returns the MG board") {
    // 'a' holds 5/9 > 1/(k+1) of the stream — must be on the board
    // with est <= true count; the board never exceeds k entries.
    val rows = sqlSpark.sql(
      """SELECT misra_gries(t, 3) AS board
         FROM (SELECT explode(array('a','a','b','a','c','a','d','a','e'))
                 AS t)""").head.getSeq[org.apache.spark.sql.Row](0)
    assert(rows.length <= 3)
    val a = rows.find(_.getString(0) == "a")
    assert(a.isDefined, s"heavy item 'a' missing from $rows")
    assert(a.get.getLong(1) >= 1L && a.get.getLong(1) <= 5L)
    // GROUP BY composes: one independent board per group
    val grouped = sqlSpark.sql(
      """SELECT g, misra_gries(t, 2) AS board FROM (
           SELECT 'x' AS g, explode(array('p','p','q')) AS t
           UNION ALL
           SELECT 'y' AS g, explode(array('r','r','r','s')) AS t)
         GROUP BY g""").collect()
      .map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(_.getString(0)).toSet)
      .toMap
    assert(grouped("x").contains("p") && grouped("y").contains("r"))
  }

  test("cdc_chunks is SQL-callable: exact cover of the payload") {
    val rows = sqlSpark.sql(
      """SELECT cdc_chunks(CAST('the quick brown fox jumps over a dog'
           AS BINARY)) AS ch""").head
      .getSeq[org.apache.spark.sql.Row](0)
    assert(rows.nonEmpty && rows.head.getLong(0) === 0L)
    assert(rows.map(_.getLong(1)).sum === 36L)
  }

  test("arity errors are rejected with a usable message") {
    sqlSpark.sql("SELECT 1").collect() // force init
    val e = intercept[Exception] {
      sqlSpark.sql("SELECT minhash_sigs(array('a'))").collect()
    }
    assert(e.getMessage.contains("minhash_sigs"))
  }
}
