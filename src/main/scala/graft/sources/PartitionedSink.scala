package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Partitioned durable-store sink — the Spark-native analog of the
  * reference's cleanup/move step (/root/reference/tools.py:677-736:
  * rsync results into a durable tree laid out by sample). Instead of
  * copying files, the engine WRITES the dataset partitioned by the
  * grouping key, so downstream readers get partition pruning for
  * free (`WHERE part = x` never touches other directories).
  *
  * Scale posture: one `repartition(partitionCol)` before the write
  * gives one shuffle and one writer task per partition value —
  * without it every upstream task writes a file into every partition
  * directory (task-count × partition-count small files, the classic
  * 100 TB sink mistake). `maxRecordsPerFile` caps file size so a
  * skewed partition value splits into multiple files instead of one
  * giant one.
  */
object PartitionedSink {

  /** Write `df` partitioned by `partitionCol`, then read the tree
    * back and return a per-partition summary (row count + key
    * checksum) — the round trip IS the verification that the sink
    * preserved every row.
    */
  def writeAndSummarize(df: DataFrame, partitionCol: String,
      checksumCol: String, outDir: String,
      maxRecordsPerFile: Long = 5000000L): DataFrame = {
    df.repartition(col(partitionCol))
      .write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCol)
      .parquet(outDir)
    df.sparkSession.read.parquet(outDir)
      .groupBy(col(partitionCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(col(checksumCol)).cast("long").as("key_checksum"))
  }

  /** k01 driver entry: orders partitioned by priority into a temp
    * durable tree; summary compares against the source table.
    */
  def ordersByPriority(orders: DataFrame): DataFrame = {
    val out = Files.createTempDirectory("graft_sink_").toString
    writeAndSummarize(orders, "o_orderpriority", "o_orderkey", out)
  }
}
