package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decomposition probe for the CDC-tree streaming twins st12/st16
  * (r18 optimization round): splits their per-call cost into
  * (a) the per-call tree bootstrap (stageConvergentBase — a full
  *     demo-base writeTree), (b) the per-batch convergent merge
  * (applyConvergent), (c) st16's per-batch index refresh, and
  * (d) the final summarize/fetch read — so a rework targets the
  * component that actually owns the seconds. Also A/Bs writeTree's
  * writer fan-out (the pmod(xxhash64, writers) salt) at 4 (shipped)
  * vs 1 (single file per partition dir at bench scale), because the
  * tree is rewritten once per bootstrap + once per affected
  * partition per batch — file-count floor costs are paid every time.
  *
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     sbt 'runMain graft.tools.St12BodyProbe [reps]'
  */
object St12BodyProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.sources.{PartitionUpsert, IndexMaintenance}

    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"SB: $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val docs = graft.Tables.documents(spark, sfDir)
    val base = PartitionUpsert.demoBase(docs)
    // the demo changelog split into 2 halves = the 2 micro-batches
    // (4 files, 2 per trigger)
    val log = PartitionUpsert.changelog(base).localCheckpoint(true)
    val b0 = log.filter(pmod(col("doc_id"), lit(2L)) === 0L)
      .localCheckpoint(true)
    val b1 = log.filter(pmod(col("doc_id"), lit(2L)) === 1L)
      .localCheckpoint(true)

    (0 until reps).foreach { r =>
      println(s"SB: === rep $r ===")
      val tree = graft.Staging.dir("graft_sb_") + "/tree"
      time("bootstrap stageConvergentBase") {
        PartitionUpsert.stageConvergentBase(base, tree)
      }
      time("  batch0 applyConvergent") {
        PartitionUpsert.applyConvergent(spark, tree, b0)
      }
      time("  batch1 applyConvergent") {
        PartitionUpsert.applyConvergent(spark, tree, b1)
      }
      time("  summarize read") {
        PartitionUpsert.summarize(
          PartitionUpsert.convergentState(spark, tree))
          .write.format("noop").mode("overwrite").save()
      }
      // st16 extras on a fresh tree: index bootstrap + per-batch refresh
      val tree2 = graft.Staging.dir("graft_sb16_") + "/tree"
      PartitionUpsert.stageConvergentBase(base, tree2)
      time("st16 buildIndex v1") {
        IndexMaintenance.buildIndex(spark, tree2, s"$tree2/_bloom/v1",
          PartitionUpsert.convergentSchema)
      }
      val aff0 = time("  batch0 apply") {
        PartitionUpsert.applyConvergent(spark, tree2, b0)
          .map(IndexMaintenance.langDir).toSet
      }
      time("  batch0 refreshIndex") {
        IndexMaintenance.refreshIndex(spark, tree2, aff0, 1L, 2L,
          PartitionUpsert.convergentSchema)
      }
      val aff1 = time("  batch1 apply") {
        PartitionUpsert.applyConvergent(spark, tree2, b1)
          .map(IndexMaintenance.langDir).toSet
      }
      time("  batch1 refreshIndex") {
        IndexMaintenance.refreshIndex(spark, tree2, aff1, 2L, 3L,
          PartitionUpsert.convergentSchema)
      }
    }
    // file-count inventory of one bootstrap tree
    def countFiles(p: String): Int = {
      val d = new java.io.File(p)
      if (!d.exists) 0
      else d.listFiles.map(f =>
        if (f.isDirectory) countFiles(f.getPath)
        else if (f.getName.endsWith(".parquet")) 1 else 0).sum
    }
    val inv = graft.Staging.dir("graft_sbinv_") + "/tree"
    PartitionUpsert.stageConvergentBase(base, inv)
    println(s"SB: bootstrap tree parquet files=${countFiles(inv)}")
    spark.stop()
  }
}
