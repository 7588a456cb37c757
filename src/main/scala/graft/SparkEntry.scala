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
                        ORDER BY l_orderkey, l_linenumber) AS rn
               FROM lineitem) t
         WHERE rn = 1""",
    "q09_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice
         FROM lineitem
         ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
         LIMIT 100""",
  )
}
