package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see SURVEY.md §2 for the operator inventory.
  * Each `queries` key has a DuckDB-runnable oracle in `oracleSql`
  * unless the operator is non-SQL-expressible (probabilistic
  * hashing, custom expressions) — those get rows-only checks and
  * ScalaTest semantics specs instead.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_qc_summary")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_qc_summary" -> ((s, d) =>
      Relational.qcSummary(Tables.lineitem(s, d))),
    "q02_trim_filter" -> ((s, d) =>
      Relational.trimFilter(Tables.documents(s, d))),
    "q03_align_join" -> ((s, d) =>
      Relational.alignJoin(Tables.lineitem(s, d), Tables.part(s, d))),
    "q04_pe_pair" -> ((s, d) =>
      Relational.pePair(Tables.lineitem(s, d))),
    "q05_anti_filter" -> ((s, d) =>
      Relational.antiFilter(Tables.orders(s, d), Tables.lineitem(s, d))),
    "q06_range_filter" -> ((s, d) =>
      Relational.rangeFilter(Tables.lineitem(s, d))),
    "q07_histogram" -> ((s, d) =>
      Relational.histogram(Tables.lineitem(s, d))),
    "q08_dedup_pos" -> ((s, d) =>
      Relational.dedupPos(Tables.lineitem(s, d))),
    "q09_sort_limit" -> ((s, d) =>
      Relational.sortLimit(Tables.lineitem(s, d))),
    "q10_bin_coverage" -> ((s, d) =>
      Pipeline.binCoverage(Tables.events(s, d))),
    "q11_interval_count" -> ((s, d) =>
      Pipeline.intervalCount(s, Tables.lineitem(s, d))),
    "q12_peak_detect" -> ((s, d) =>
      Pipeline.peakDetect(Tables.events(s, d))),
    "q13_metrics" -> ((s, d) =>
      Pipeline.metrics(Tables.orders(s, d))),
    "q14_status_pivot" -> ((s, d) =>
      Pipeline.statusPivot(Tables.orders(s, d))),
    "q15_topk" -> ((s, d) =>
      Pipeline.topk(Tables.orders(s, d), Tables.customer(s, d))),
    "q16_sessionize" -> ((s, d) =>
      Pipeline.sessionize(Tables.events(s, d))),
    "q17_running_window" -> ((s, d) =>
      Pipeline.runningWindow(Tables.orders(s, d))),
    "q18_rollup" -> ((s, d) =>
      Pipeline.rollupRegions(Tables.customer(s, d), Tables.nation(s, d),
        Tables.region(s, d))),
  )

  def oracleSql: Map[String, String] = Map(
    "q01_qc_summary" ->
      """SELECT l_returnflag, l_linestatus,
         count(*) AS n_rows,
         sum(l_quantity) AS sum_qty,
         round(sum(l_extendedprice), 4) AS sum_price,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
         round(avg(l_quantity), 4) AS avg_qty,
         round(avg(l_discount), 4) AS avg_disc
         FROM lineitem GROUP BY 1, 2""",
    "q02_trim_filter" ->
      """SELECT doc_id, lang, source, length(trim(text)) AS trimmed_len
         FROM documents WHERE n_chars >= 100""",
    "q03_align_join" ->
      """SELECT p_brand,
         count(*) AS n_items,
         sum(l_quantity) AS sum_qty,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY 1""",
    "q04_pe_pair" ->
      """WITH m1 AS (
           SELECT l_orderkey, l_partkey, l_quantity,
                  row_number() OVER (PARTITION BY l_orderkey
                    ORDER BY l_partkey, l_quantity, l_extendedprice) AS rn
           FROM lineitem WHERE l_linenumber = 1),
         m2 AS (
           SELECT l_orderkey, l_partkey, l_quantity,
                  row_number() OVER (PARTITION BY l_orderkey
                    ORDER BY l_partkey, l_quantity, l_extendedprice) AS rn
           FROM lineitem WHERE l_linenumber = 2)
         SELECT m1.l_orderkey,
                m1.l_partkey AS mate1_part, m2.l_partkey AS mate2_part,
                m1.l_quantity + m2.l_quantity AS pair_qty
         FROM m1 JOIN m2 ON m1.l_orderkey = m2.l_orderkey
         WHERE m1.rn = 1 AND m2.rn = 1""",
    "q05_anti_filter" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus
         FROM orders
         WHERE NOT EXISTS
           (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey)""",
    "q06_range_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
         FROM lineitem WHERE l_quantity >= 10 AND l_quantity < 40""",
    "q07_histogram" ->
      """SELECT l_quantity AS flength,
         count(*) AS freq,
         round(count(*) * 1.0 / sum(count(*)) OVER (), 6) AS density
         FROM lineitem GROUP BY 1""",
    "q08_dedup_pos" ->
      """SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber, l_quantity
         FROM (SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber,
                      l_quantity,
                      row_number() OVER (PARTITION BY l_partkey, l_suppkey
                        ORDER BY l_orderkey, l_linenumber, l_quantity) AS rn
               FROM lineitem) t
         WHERE rn = 1""",
    "q09_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
         FROM lineitem
         ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
         LIMIT 100""",
    "q10_bin_coverage" ->
      """SELECT CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS bin_id,
                event_type,
                count(*) AS n_events,
                round(sum(value), 4) AS sum_value
         FROM events GROUP BY 1, 2""",
    "q11_interval_count" ->
      s"""SELECT band_id, count(*) AS n_items, sum(l_quantity) AS sum_qty
          FROM lineitem JOIN ${graft.operators.Pipeline.priceBandsSql}
            ON l_extendedprice >= lo AND l_extendedprice < hi
          GROUP BY 1""",
    "q12_peak_detect" ->
      """WITH bins AS (
           SELECT CAST(floor(epoch_us(ts) / 3600000000) AS BIGINT) AS bin_id,
                  count(*) AS n
           FROM events GROUP BY 1),
         enriched AS (
           SELECT bin_id, n
           FROM (SELECT bin_id, n,
                        avg(n) OVER () + 2 * stddev_pop(n) OVER () AS thresh
                 FROM bins) t
           WHERE n > thresh),
         islands AS (
           SELECT bin_id, n,
                  bin_id - row_number() OVER (ORDER BY bin_id) AS island
           FROM enriched)
         SELECT min(bin_id) AS peak_start, max(bin_id) AS peak_end,
                count(*) AS n_bins, CAST(sum(n) AS BIGINT) AS total_events
         FROM islands GROUP BY island""",
    "q13_metrics" ->
      """SELECT o_orderstatus,
                count(*) AS n_orders,
                count(DISTINCT o_custkey) AS n_customers,
                round(sum(o_totalprice), 4) AS sum_price,
                round(avg(o_totalprice), 4) AS avg_price,
                round(count(*) * 100.0 /
                      sum(count(*)) OVER (), 4) AS pct_orders
         FROM orders GROUP BY 1""",
    "q14_status_pivot" ->
      """SELECT o_orderpriority,
                count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
                count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
                count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
         FROM orders GROUP BY 1""",
    "q15_topk" ->
      """SELECT o_custkey, c_name, count(*) AS n_orders,
                round(sum(o_totalprice), 4) AS revenue
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1, 2
         ORDER BY sum(o_totalprice) DESC, o_custkey ASC
         LIMIT 10""",
    "q16_sessionize" ->
      """WITH marked AS (
           SELECT user_id, event_id, value,
                  epoch_us(ts) AS ts_us,
                  CASE WHEN lag(epoch_us(ts)) OVER w IS NULL THEN 1
                       WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                            > 1800000000 THEN 1
                       ELSE 0 END AS new_session
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
         sessions AS (
           SELECT user_id, event_id, value, ts_us,
                  CAST(sum(new_session) OVER (PARTITION BY user_id
                    ORDER BY ts_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS session_idx
           FROM marked)
         SELECT user_id, session_idx,
                count(*) AS n_events,
                min(ts_us) AS session_start_us,
                max(ts_us) AS session_end_us,
                round(sum(value), 4) AS sum_value
         FROM sessions GROUP BY 1, 2""",
    "q17_running_window" ->
      """SELECT o_custkey, o_orderkey,
                epoch_us(o_orderdate) AS order_us,
                round(sum(o_totalprice) OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
                  AS running_total
         FROM orders""",
    "q18_rollup" ->
      """SELECT coalesce(r_name, 'ALL') AS region_name,
                coalesce(n_name, 'ALL') AS nation_name,
                count(*) AS n_customers,
                round(sum(c_acctbal), 4) AS sum_acctbal
         FROM customer
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP (r_name, n_name)""",
  )
}
