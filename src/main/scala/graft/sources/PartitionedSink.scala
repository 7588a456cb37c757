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
  * Scale posture: the pre-write shuffle key is (partitionCol, salt)
  * where salt = hash(checksumCol) mod writersPerPartition — f writer
  * tasks per partition VALUE. A bare `repartition(partitionCol)`
  * collapses to one task per value (5 priorities → 5 tasks writing
  * everything; at 100 TB that is 20 TB per writer), while no
  * repartition at all gives task-count × partition-count small files.
  * The salt keeps the one-directory-per-value layout and bounds the
  * file count at f × values. `maxRecordsPerFile` additionally caps
  * file size so a skewed value splits into more files, not one giant
  * one.
  */
object PartitionedSink {

  /** Write `df` partitioned by `partitionCol`, then read the tree
    * back and return a per-partition summary (row count + key
    * checksum) — the round trip IS the verification that the sink
    * preserved every row.
    */
  def writeAndSummarize(df: DataFrame, partitionCol: String,
      checksumCol: String, outDir: String,
      maxRecordsPerFile: Long = 5000000L,
      writersPerPartition: Int = 4): DataFrame = {
    write(df, partitionCol, checksumCol, outDir, maxRecordsPerFile,
      writersPerPartition, SaveMode.Overwrite)
    summarize(df.sparkSession.read.parquet(outDir), partitionCol,
      checksumCol)
  }

  private def summarize(tree: DataFrame, partitionCol: String,
      checksumCol: String): DataFrame =
    tree.groupBy(col(partitionCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(col(checksumCol)).cast("long").as("key_checksum"))

  // AQE interaction: the salted repartition has no explicit partition
  // count, so AQE's partition coalescing may merge salt groups while
  // the data is small (one writer is CORRECT for a 10 MB partition
  // value) — but at scale each (value, salt) group exceeds the
  // advisory partition size and the f-way write parallelism holds.
  // The spec pins coalescing off to assert the mechanism.
  private def write(df: DataFrame, partitionCol: String,
      checksumCol: String, outDir: String, maxRecordsPerFile: Long,
      writersPerPartition: Int, mode: SaveMode): Unit =
    df.repartition(col(partitionCol),
        pmod(xxhash64(col(checksumCol)), lit(writersPerPartition)))
      .write
      .mode(mode)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCol)
      .parquet(outDir)

  /** q22_incremental — resume/skip orchestration, the Spark-native
    * analog of the reference's sqlite progress log
    * (/root/reference/tools.py:8-56, mainScript.py:340-363: completed
    * steps are skipped on rerun). The landed partition directories ARE
    * the progress state: values already present in the sink tree are
    * skipped, only the anti-joined delta is computed and appended, and
    * the returned summary covers the whole tree — bit-identical to a
    * full recompute, which is exactly what the oracle checks.
    *
    * The landed-value probe reads only the partition column — on a
    * partitioned tree that column comes from directory names, so the
    * distinct is a metadata-sized aggregation, not a data scan.
    */
  def resumeSummarize(pending: DataFrame, partitionCol: String,
      checksumCol: String, outDir: String,
      writersPerPartition: Int = 4): DataFrame = {
    val spark = pending.sparkSession
    val landed = spark.read.parquet(outDir)
      .select(col(partitionCol)).distinct()
    val delta = pending.join(landed, Seq(partitionCol), "left_anti")
    write(delta, partitionCol, checksumCol, outDir, 5000000L,
      writersPerPartition, SaveMode.Append)
    summarize(spark.read.parquet(outDir), partitionCol, checksumCol)
  }

  /** One durable tree per JVM (overwritten per run): repeated bench
    * reps reuse the directory instead of leaking a fresh temp dir
    * each invocation.
    */
  private lazy val sinkDir: String =
    Files.createTempDirectory("graft_sink_").toString
  private lazy val resumeDir: String =
    Files.createTempDirectory("graft_resume_").toString

  /** k01 driver entry: orders partitioned by priority into a temp
    * durable tree; summary compares against the source table.
    */
  def ordersByPriority(orders: DataFrame): DataFrame =
    writeAndSummarize(orders, "o_orderpriority", "o_orderkey", sinkDir)

  /** q22 driver entry: a prior partial run landed the first two
    * priority classes; the resume pass skips them, processes only the
    * remaining delta, and the summary over the tree must equal the
    * full-recompute summary (k01's oracle).
    */
  def ordersResume(orders: DataFrame): DataFrame = {
    val prior = orders.filter(col("o_orderpriority") < "3")
    write(prior, "o_orderpriority", "o_orderkey", resumeDir, 5000000L,
      4, SaveMode.Overwrite)
    resumeSummarize(orders, "o_orderpriority", "o_orderkey", resumeDir)
  }
}
