package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed source/sink surface: pre-shuffling fact tables into
  * bucket files at WRITE time so repeated joins and aggregations on
  * the bucket key read co-located data and skip the shuffle entirely
  * — the standard answer to "this 100 TB join runs nightly against
  * the same key". One bucketed write amortizes across every
  * downstream join.
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

  /** k02 driver entry — orders ⋈ lineitem on the order key, both
    * sides bucketed identically: the scan feeds SortMergeJoin with
    * NO exchange on either side (asserted by spec). `hint("merge")`
    * pins the join strategy so AQE's broadcast conversion doesn't
    * hide the bucket co-location being demonstrated.
    */
  def bucketedOrderJoin(spark: SparkSession, orders: DataFrame,
      lineitem: DataFrame, buckets: Int = 8): DataFrame = {
    val base = Files.createTempDirectory("graft_bucketed_").toString
    writeBucketed(orders.select(col("o_orderkey"), col("o_orderstatus")),
      "graft_orders_b", "o_orderkey", buckets, s"$base/orders")
    writeBucketed(lineitem.select(col("l_orderkey"), col("l_quantity")),
      "graft_lineitem_b", "l_orderkey", buckets, s"$base/lineitem")
    spark.table("graft_orders_b").hint("merge")
      .join(spark.table("graft_lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity")).as("sum_qty"))
  }
}
