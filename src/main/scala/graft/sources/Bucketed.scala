package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed source/sink surface: pre-shuffling fact tables into
  * bucket files at WRITE time so repeated joins and aggregations on
  * the bucket key read co-located data and skip the shuffle entirely
  * — the standard answer to "this 100 TB join runs nightly against
  * the same key". One bucketed write amortizes across every
  * downstream join — which is also why the driver-entry staging below
  * is memoized per (input, buckets): re-bucketing on every invocation
  * would both mis-measure the join and leak a temp tree per call.
  */
object Bucketed {

  /** Write `df` as a bucketed (+sorted) external table. Spark's
    * bucketing rides the catalog, so the table name is the handle;
    * the files land under `path` (external), not the warehouse.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int, path: String): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Bucketed staging memo: (cacheKey, buckets) → (ordersTable,
    * lineitemTable). Table names carry a per-JVM nonce so two
    * sessions sharing one metastore never collide on the fixed
    * `graft_*_b` names.
    */
  private val nonce = java.lang.Long.toHexString(System.nanoTime())
  private val staged =
    scala.collection.concurrent.TrieMap.empty[(String, Int), (String, String)]

  /** k02 driver entry — orders ⋈ lineitem on the order key, both
    * sides bucketed identically: the scan feeds SortMergeJoin with
    * NO exchange on either side (asserted by spec). `hint("merge")`
    * pins the join strategy so AQE's broadcast conversion doesn't
    * hide the bucket co-location being demonstrated.
    *
    * `cacheKey` (e.g. the input SF dir) memoizes the bucketed write:
    * the first call stages both tables, repeats reuse them — the
    * production shape, where bucketing is a one-time layout decision
    * and every nightly join reads it. Empty cacheKey = always restage.
    */
  def bucketedOrderJoin(spark: SparkSession, orders: DataFrame,
      lineitem: DataFrame, buckets: Int = 8,
      cacheKey: String = ""): DataFrame = {
    def stage(): (String, String) = {
      val base = graft.Staging.dir("graft_bucketed_")
      val suffix = s"${nonce}_${staged.size}"
      val to = s"graft_orders_b_$suffix"
      val tl = s"graft_lineitem_b_$suffix"
      writeBucketed(orders.select(col("o_orderkey"), col("o_orderstatus")),
        to, "o_orderkey", buckets, s"$base/orders")
      writeBucketed(lineitem.select(col("l_orderkey"), col("l_quantity")),
        tl, "l_orderkey", buckets, s"$base/lineitem")
      (to, tl)
    }
    val (to, tl) =
      if (cacheKey.isEmpty) stage()
      else staged.getOrElseUpdate((cacheKey, buckets), stage())
    spark.table(to).hint("merge")
      .join(spark.table(tl),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity")).as("sum_qty"))
  }
}
