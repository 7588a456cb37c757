package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational operators q01–q09.
  *
  * Each re-expresses one data-processing step of the reference
  * pipeline (awnimo/seqDataPipeline) as a declarative Spark plan; see
  * SURVEY.md §2 for the mapping. All functions are pure
  * `DataFrame => DataFrame` so Catalyst sees the whole plan (pushdown,
  * partial aggregation, broadcast) and specs can feed synthetic
  * frames.
  */
object Relational {

  /** q01_qc_summary — per-group record statistics, the fastqc-style
    * quality summary (reference tools.py:101). Algebraic aggregates
    * only → map-side partial aggregation at any scale.
    *
    * Money/ratio sums run in EXACT INTEGER units (cents /
    * ten-thousandths, the q13 recipe): a raw double sum is
    * order-sensitive in the last ulp, and Spark's and DuckDB's
    * different summation orders can land a 4dp rounding tie on
    * different sides — integer sums are associative, so the gate is
    * deterministic at any SF and partition count. avg_qty stays a
    * plain avg: the quantity sum is integer-exact in a double, and an
    * int/int quotient can never be a true decimal-ties-at-5 case.
    */
  def qcSummary(lineitem: DataFrame): DataFrame = {
    val priceCents =
      round(col("l_extendedprice") * 100, 0).cast("long")
    val revenueTenK =
      round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000, 0)
        .cast("long")
    val discCents = round(col("l_discount") * 100, 0).cast("long")
    lineitem
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity")).as("sum_qty"),
        (sum(priceCents) / 100.0).as("sum_price"),
        (sum(revenueTenK) / 10000.0).as("revenue"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        (round(sum(discCents) * 100.0 / count(lit(1)), 0) / 10000.0)
          .as("avg_disc"))
  }

  /** q02_trim_filter — stringency filter + record cleanup, the
    * trim_galore step (reference tools.py:145): drop short records,
    * emit trimmed lengths. Filter + projection reach the parquet scan.
    */
  def trimFilter(documents: DataFrame, minChars: Long = 100L): DataFrame =
    documents
      .filter(col("n_chars") >= minChars)
      .select(
        col("doc_id"),
        col("lang"),
        col("source"),
        length(trim(col("text"))).as("trimmed_len"))

  /** q03_align_join — enrichment of fact records against reference
    * dimensions, the alignment step (reference tools.py:336). Dims are
    * broadcast: no shuffle of the fact side.
    */
  def alignJoin(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("l_quantity")).as("sum_qty"),
        // exact integer ten-thousandths — see qcSummary
        (sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * 10000, 0).cast("long")) / 10000.0).as("revenue"))

  /** q04_pe_pair — mate pairing by shared identifier with order
    * normalization (reference tools.py:737 PE_check): join record 1
    * and record 2 of each group. Shuffles both sides on the shared
    * key; projections pruned before the exchange.
    */
  def pePair(lineitem: DataFrame): DataFrame = {
    // (l_orderkey, l_linenumber) is not unique in the synthetic data:
    // normalize each side to one deterministic representative record
    // first, exactly as PE_check normalizes mate order.
    def side(n: Int, tag: String): DataFrame = {
      val w = Window.partitionBy(col("l_orderkey"))
        .orderBy(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      lineitem.filter(col("l_linenumber") === n)
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
          col("l_extendedprice"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_orderkey"), col("l_partkey").as(s"${tag}_part"),
          col("l_quantity").as(s"${tag}_qty"))
    }
    side(1, "mate1").join(side(2, "mate2"), Seq("l_orderkey"))
      .select(col("l_orderkey"), col("mate1_part"), col("mate2_part"),
        (col("mate1_qty") + col("mate2_qty")).as("pair_qty"))
  }

  /** q05_anti_filter — blacklist removal, the `grep -v chrM` step
    * (reference tools.py:243): records with no match in the exclusion
    * set. left_anti join; only the key column of the exclusion side
    * crosses the exchange.
    */
  def antiFilter(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders
      .join(lineitem.select(col("l_orderkey")),
        col("o_orderkey") === col("l_orderkey"), "left_anti")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))

  /** q06_range_filter — numeric range predicate, the awk fragment-size
    * filter (reference tools.py:244-245). Both bounds land in parquet
    * PushedFilters.
    */
  def rangeFilter(lineitem: DataFrame, lo: Double = 10d, hi: Double = 40d)
      : DataFrame =
    lineitem
      .filter(col("l_quantity") >= lo && col("l_quantity") < hi)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"))

  /** q07_histogram — value histogram with frequency and density,
    * the fragment-length distribution (reference tools.py:294-311:
    * np.bincount → freq → density at 6dp). The window-over-() runs on
    * post-aggregation cardinality (#distinct values), not row count,
    * so the single-partition window is safe at any scale.
    */
  def histogram(lineitem: DataFrame): DataFrame = {
    val counts = lineitem.groupBy(col("l_quantity").as("flength"))
      .agg(count(lit(1)).as("freq"))
    counts.withColumn("density",
      round(col("freq") / sum(col("freq")).over(Window.partitionBy()), 6))
  }

  /** q08_dedup_pos — exact deduplication on a position key keeping a
    * deterministic representative, the samtools rmdup step (reference
    * tools.py:315-317). min aggregation instead of a row_number
    * window, so the shuffle carries one row per key instead of every
    * duplicate. The representative's ordering key (l_orderkey,
    * l_linenumber, l_quantity) is BIT-PACKED into one BIGINT rather
    * than min(struct(...)): a struct aggregation buffer forces
    * SortAggregate (per-partition sorts), while a primitive buffer
    * hash-aggregates — no sort anywhere in the plan. Order-preserving
    * because the low fields are range-bounded (l_linenumber ≤ 7 < 64,
    * integer l_quantity ≤ 50 < 128 — TPC-H invariants), leaving 50
    * bits of l_orderkey headroom.
    */
  def dedupPos(lineitem: DataFrame): DataFrame = {
    // The packing is only order-preserving inside the declared field
    // ranges — an out-of-range row (l_quantity 200, a fractional
    // quantity, a negative line number) would silently corrupt the
    // representative, so the invariant FAILS LOUDLY instead: the
    // guard is a handful of codegen'd comparisons per row, and
    // raise_error turns a bad input into a job error, not a wrong
    // answer.
    val inRange =
      col("l_linenumber") >= 0 && col("l_linenumber") < 64 &&
        col("l_quantity") >= 0 && col("l_quantity") < 128 &&
        col("l_quantity") === floor(col("l_quantity")) &&
        col("l_orderkey") >= 0 && col("l_orderkey") < (1L << 50)
    val packedRaw = shiftleft(col("l_orderkey"), 13)
      .bitwiseOR(shiftleft(col("l_linenumber").cast("long"), 7))
      .bitwiseOR(col("l_quantity").cast("long"))
    val packed = when(inRange, packedRaw).otherwise(raise_error(concat(
      lit("q08_dedup_pos: row outside packed ranges: orderkey="),
      col("l_orderkey").cast("string"),
      lit(" linenumber="), col("l_linenumber").cast("string"),
      lit(" quantity="), col("l_quantity").cast("string"))))
    lineitem
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(packed).as("rep"))
      .select(col("l_partkey"), col("l_suppkey"),
        shiftright(col("rep"), 13).as("l_orderkey"),
        shiftright(col("rep"), 7).bitwiseAND(lit(63L)).cast("int")
          .as("l_linenumber"),
        col("rep").bitwiseAND(lit(127L)).cast("double").as("l_quantity"))
  }

  /** q09_sort_limit — global sort by composite key + limit, the
    * sort-by-coordinate step (reference tools.py:247-248). Spark
    * range-partitions the sort; the limit collapses to a TakeOrdered
    * physical op (no full materialization).
    */
  def sortLimit(lineitem: DataFrame, n: Int = 100): DataFrame =
    lineitem
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
        col("l_linenumber").asc)
      .limit(n)

  /** q28_changelog_merge — MERGE INTO semantics without a table
    * format: apply an ordered changelog (upserts + deletes) to a
    * base snapshot, producing the next snapshot — the reference's
    * redo-a-step-then-update-the-record loop (/root/reference/
    * tools.py:28-56 rewrites a sample's status row per step) at
    * corpus scale, and the APPLY side of d11's diff.
    *
    * Two stages, both shuffle-minimal: (1) changelog COMPACTION —
    * latest change per key via `max_by(struct(...), seq)` partial
    * aggregation (no window, no sort; a key touched 1000× in one
    * day's log reduces map-side); (2) the MERGE — one full outer
    * join of base and compacted changes on the key; delete drops the
    * row, upsert replaces-or-inserts, absent keeps base. The struct
    * wrapper in max_by is load-bearing: a delete's null payload must
    * not make the aggregate skip it (both engines' arg-max ignore
    * null ARGUMENTS, never null struct FIELDS).
    */
  def changelogMerge(base: DataFrame, changes: DataFrame,
      key: String = "doc_id"): DataFrame = {
    val latest = changes
      .groupBy(col(key))
      .agg(max_by(struct(col("op"), col("new_text")), col("seq")).as("c"))
      .select(col(key), col("c.op").as("op"), col("c.new_text").as("nt"))
    base.select(col(key), col("text"))
      .join(latest, Seq(key), "full_outer")
      .filter(coalesce(col("op"), lit("keep")) =!= "delete")
      .select(col(key),
        when(col("op") === "upsert", lit("upsert")).otherwise(lit("base"))
          .as("origin"),
        length(when(col("op") === "upsert", col("nt"))
          .otherwise(col("text"))).cast("long").as("n_chars_out"))
  }

  /** Driver entry: base and changelog derived deterministically from
    * the documents table so the oracle rebuilds both — base is
    * missing `doc_id ≡ 7 (mod 10)`; every `doc_id ≡ 0 (mod 3)` gets
    * an upsert (text + " v2", seq 1) and every `doc_id ≡ 4 (mod 11)`
    * a LATER delete (seq 2), so keys hit by both prove latest-wins.
    */
  def changelogMergeDemo(documents: DataFrame): DataFrame = {
    val base = documents.filter(pmod(col("doc_id"), lit(10L)) =!= 7L)
    val upserts = documents.filter(pmod(col("doc_id"), lit(3L)) === 0L)
      .select(col("doc_id"), lit(1L).as("seq"), lit("upsert").as("op"),
        concat(col("text"), lit(" v2")).as("new_text"))
    val deletes = documents.filter(pmod(col("doc_id"), lit(11L)) === 4L)
      .select(col("doc_id"), lit(2L).as("seq"), lit("delete").as("op"),
        lit(null).cast("string").as("new_text"))
    changelogMerge(base, upserts.unionByName(deletes))
  }

  /** The SAM-style flag word, derived deterministically from row
    * attributes (the test tables carry no native bitfield; each bit
    * is an oracle-replicable integer/string predicate). Bit layout
    * mirrors the SAM flags the reference manipulates:
    * 0x1 paired, 0x2 proper-pair, 0x4 unmapped, 0x8 short-fragment,
    * 0x10 duplicate.
    */
  private[graft] def samFlag: org.apache.spark.sql.Column =
    when(col("l_linenumber") % 2 === 0, 1).otherwise(0) +
      when(col("l_linestatus") === "F", 2).otherwise(0) +
      when(col("l_returnflag") === "R", 4).otherwise(0) +
      when(col("l_quantity") < 10d, 8).otherwise(0) +
      when(col("l_orderkey") % 7 === 0, 16).otherwise(0)

  /** q35_flag_census — bitwise flag-mask filtering plus the flag
    * census, the `samtools view -F/-f` + flagstat semantics and the
    * last reference behavior without its own checklist row: the
    * reference drops unmapped reads with `view -F4` (tools.py:246)
    * and counts paired reads with `view -c -f 1` (tools.py:580). A
    * SAM flag is a BITFIELD — the predicates are masks (`flag & F =
    * 0` to exclude any of F's bits, `flag & f = f` to require all of
    * f's), which q05's anti-join and q06's range predicate cannot
    * express.
    *
    * Defaults exercise both mask directions at once (mapped AND
    * paired, samtools' commonest combination). The census groups by
    * the surviving flag WORD — one row per bit combination, each
    * decoded into its property columns (the flagstat report reads
    * off this directly as Σ n_reads over rows with the bit set).
    *
    * Scale: flag derivation and both mask tests are map-side codegen
    * (a handful of integer ops per row — the predicates push into
    * the scan stage), and the aggregation key space is 2^bits
    * COMBINATIONS, not rows, so partial aggs collapse everything
    * before the one tiny exchange. qty_sum is integer-valued doubles
    * cast to long — order-insensitive, oracle-exact.
    */
  def flagCensus(lineitem: DataFrame, excludeMask: Int = 4,
      requireMask: Int = 1): DataFrame = {
    // ONE pre-filter rollup serves both outputs: the -F/-f masks are
    // functions of the flag alone, so filter-then-aggregate equals
    // aggregate-then-filter on the ≤ 2^bits rollup rows — the census
    // is the mask-filtered slice of the rollup, and the BAMPE
    // auto-detect (tools.py:580's `view -c -f 1` mode switch: one
    // paired read anywhere PRE-filter flips the run to paired-end) is
    // a partition-less window max over the SAME rollup rows (the
    // q13/q07 post-aggregation-bounded pattern; a separate aggregate
    // branch would let Catalyst push the mask filter through the
    // census groupBy and split the scan in two). The base table is
    // scanned and the flag word derived exactly ONCE (spec-asserted),
    // and the mask filter cannot push below a partition-less window.
    import org.apache.spark.sql.expressions.Window
    val rollup = lineitem
      .withColumn("flag", samFlag)
      .groupBy(col("flag"))
      .agg(count(lit(1)).as("n_reads"),
        sum(col("l_quantity")).cast("long").as("qty_sum"))
    rollup
      .withColumn("run_mode",
        when(max(col("flag").bitwiseAND(lit(1)))
          .over(Window.partitionBy()) > 0, lit("BAMPE"))
          .otherwise(lit("BAM")))
      .filter(col("flag").bitwiseAND(lit(excludeMask)) === 0 &&
        col("flag").bitwiseAND(lit(requireMask)) === requireMask)
      .select(col("flag"), col("n_reads"), col("qty_sum"),
        col("flag").bitwiseAND(lit(1)).as("b_paired"),
        shiftright(col("flag"), 1).bitwiseAND(lit(1)).as("b_proper"),
        shiftright(col("flag"), 2).bitwiseAND(lit(1)).as("b_unmapped"),
        shiftright(col("flag"), 3).bitwiseAND(lit(1)).as("b_short"),
        shiftright(col("flag"), 4).bitwiseAND(lit(1)).as("b_dup"),
        col("run_mode"))
  }
}
