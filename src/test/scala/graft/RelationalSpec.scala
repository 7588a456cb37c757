package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // see Verify.scala: avoids triple shingle evaluation pre-explode
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import TestSpark._

  test("q01_qc_summary: groups and algebraic stats") {
    val df = SparkEntry.queries("q01_qc_summary")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty && rows.length <= 9) // 3 flags x 3 statuses max
    val total = rows.map(_.getAs[Long]("n_rows")).sum
    assert(total === Tables.lineitem(spark, sf).count())
  }

  test("q02_trim_filter: no short docs pass, trimmed_len <= n_chars") {
    val df = SparkEntry.queries("q02_trim_filter")(spark, sf)
    assert(df.count() > 0)
    val docs = Tables.documents(spark, sf)
    assert(df.count() === docs.filter("n_chars >= 100").count())
  }

  test("q03_align_join: broadcast join present in plan") {
    val df = SparkEntry.queries("q03_align_join")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(df.count() > 0)
  }

  test("q04_pe_pair: one pair per order having both mates") {
    val df = SparkEntry.queries("q04_pe_pair")(spark, sf)
    val li = Tables.lineitem(spark, sf)
    val expected = li.filter("l_linenumber = 1").select("l_orderkey")
      .intersect(li.filter("l_linenumber = 2").select("l_orderkey")).count()
    assert(df.count() === expected)
  }

  test("q05_anti_filter: no surviving order has a lineitem") {
    val df = SparkEntry.queries("q05_anti_filter")(spark, sf)
    val li = Tables.lineitem(spark, sf)
    assert(df.count() > 0)
    assert(df.join(li, df("o_orderkey") === li("l_orderkey")).count() === 0)
  }

  test("q06_range_filter: bounds respected and pushed down") {
    val df = SparkEntry.queries("q06_range_filter")(spark, sf)
    assert(df.filter("l_quantity < 10 OR l_quantity >= 40").count() === 0)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") &&
      scan.contains("GreaterThanOrEqual(l_quantity,10.0)"))
  }

  test("q07_histogram: densities sum to ~1") {
    val df = SparkEntry.queries("q07_histogram")(spark, sf)
    val dsum = df.collect().map(_.getAs[Double]("density")).sum
    assert(math.abs(dsum - 1.0) < 1e-3)
  }

  test("q08_dedup_pos: unique position keys, deterministic representative") {
    val df = SparkEntry.queries("q08_dedup_pos")(spark, sf)
    assert(df.groupBy("l_partkey", "l_suppkey").count()
      .filter("count > 1").count() === 0)
  }

  test("q08: out-of-range rows fail loudly instead of corrupting the packing") {
    import spark.implicits._
    def li(qty: Double, line: Int) = Seq(
      (1L, 1L, 10L, line, qty)
    ).toDF("l_partkey", "l_suppkey", "l_orderkey", "l_linenumber",
      "l_quantity")
    // in-range row round-trips exactly
    val ok = graft.operators.Relational.dedupPos(li(50.0, 3)).collect()
    assert(ok.length === 1 &&
      ok(0).getAs[Double]("l_quantity") === 50.0 &&
      ok(0).getAs[Int]("l_linenumber") === 3)
    // quantity beyond the 7-bit field: job error, not a wrong answer
    val e = intercept[Exception] {
      graft.operators.Relational.dedupPos(li(200.0, 3)).collect()
    }
    assert(e.getMessage.contains("q08_dedup_pos") ||
      e.getCause != null && e.getCause.getMessage.contains("q08_dedup_pos"))
    // fractional quantity would truncate silently — also rejected
    intercept[Exception] {
      graft.operators.Relational.dedupPos(li(10.5, 3)).collect()
    }
  }

  test("q09_sort_limit: descending order, n rows") {
    val df = SparkEntry.queries("q09_sort_limit")(spark, sf)
    val prices = df.collect().map(_.getAs[Double]("l_extendedprice"))
    assert(prices.length === 100)
    assert(prices.sliding(2).forall(p => p(0) >= p(1)))
  }

  test("entry: flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q28: merge semantics — upsert, insert, delete, latest-wins") {
    import spark.implicits._
    val base = Seq((1L, "one"), (2L, "two"), (3L, "three"), (4L, "four"))
      .toDF("doc_id", "text")
    val changes = Seq(
      (2L, 1L, "upsert", "two-v2"),   // update existing
      (5L, 1L, "upsert", "five"),     // insert new key
      (3L, 1L, "delete", null),       // delete existing
      (4L, 1L, "upsert", "four-v2"),  // ...then deleted later:
      (4L, 2L, "delete", null),       // latest wins -> gone
      (6L, 1L, "delete", null),       // delete of absent key: no row
      (7L, 1L, "upsert", "seven-a"),  // two upserts: later wins
      (7L, 2L, "upsert", "seven-b"))
      .toDF("doc_id", "seq", "op", "new_text")
    val out = graft.operators.Relational.changelogMerge(base, changes)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(out === Map(
      1L -> (("base", 3L)), 2L -> (("upsert", 6L)),
      5L -> (("upsert", 4L)), 7L -> (("upsert", 7L))))
  }

  test("q28: changelog compaction is an aggregation, not a window sort") {
    val plan = SparkEntry.queries("q28_changelog_merge")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "latest-per-key must be max_by partial aggregation")
  }

  // One synthetic read per flag bit, each setting ONLY its own bit,
  // plus the all-bits and no-bits rows — so every bit's predicate is
  // proven independently and the decoded columns are checked against
  // the planted word.
  private def flagRows = {
    import TestSpark.spark.implicits._
    Seq(
      // (orderkey, linenumber, quantity, returnflag, linestatus)
      (1L, 1, 20.0, "N", "O"),  // flag 0
      (1L, 2, 20.0, "N", "O"),  // flag 1  (even line -> paired)
      (1L, 1, 20.0, "N", "F"),  // flag 2  (F status -> proper)
      (1L, 1, 20.0, "R", "O"),  // flag 4  (R -> unmapped)
      (1L, 1, 5.0, "N", "O"),   // flag 8  (qty < 10 -> short)
      (7L, 1, 20.0, "N", "O"),  // flag 16 (orderkey % 7 -> dup)
      (3L, 2, 20.0, "N", "F"),  // flag 3  (paired AND proper)
      (14L, 2, 5.0, "R", "F"))  // flag 31 (all bits)
      .toDF("l_orderkey", "l_linenumber", "l_quantity",
        "l_returnflag", "l_linestatus")
  }

  test("q35: each flag bit is derived independently and decoded back") {
    val all = graft.operators.Relational
      .flagCensus(flagRows, excludeMask = 0, requireMask = 0)
      .collect()
      .map(r => r.getAs[Int]("flag") ->
        (r.getAs[Long]("n_reads"), r.getAs[Int]("b_paired"),
          r.getAs[Int]("b_proper"), r.getAs[Int]("b_unmapped"),
          r.getAs[Int]("b_short"), r.getAs[Int]("b_dup"))).toMap
    assert(all.keySet === Set(0, 1, 2, 3, 4, 8, 16, 31))
    assert(all.values.forall(_._1 == 1L), "one planted read per word")
    assert(all(31) === ((1L, 1, 1, 1, 1, 1)), "all-bits row decodes to all ones")
    assert(all(0) === ((1L, 0, 0, 0, 0, 0)))
    assert(all(4)._4 == 1 && all(4)._2 == 0, "only the planted bit is set")
  }

  test("q35: -F excludes ANY masked bit, -f requires ALL masked bits") {
    // samtools view -F4 -f1: mapped AND paired
    val kept = graft.operators.Relational
      .flagCensus(flagRows, excludeMask = 4, requireMask = 1)
      .collect().map(_.getAs[Int]("flag")).toSet
    assert(kept === Set(1, 3), s"bit2 rows excluded, bit0 required: $kept")
    // multi-bit -f: BOTH bits must be present (31 has them; 1/2 alone fail)
    val both = graft.operators.Relational
      .flagCensus(flagRows, excludeMask = 0, requireMask = 3)
      .collect().map(_.getAs[Int]("flag")).toSet
    assert(both === Set(3, 31), s"requireMask is all-of, not any-of: $both")
  }

  test("q35: run_mode detect rides the census rollup — ONE base scan") {
    // the mode is a partition-less window over the ≤ 2^bits rollup
    // rows (a separate aggregate branch would let the mask filter
    // push through the census groupBy and split the scan in two)
    val df = SparkEntry.queries("q35_flag_census")(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val scans = plan.linesIterator
      .count(l => l.contains("Scan parquet") && l.contains("lineitem"))
    assert(scans === 1, s"q35 must scan lineitem once (found $scans)")
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    // and the BAMPE detect still reads the PRE-filter census
    assert(df.collect().forall(_.getAs[String]("run_mode") == "BAMPE"))
  }
}
