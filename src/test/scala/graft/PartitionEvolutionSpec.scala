package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.PartitionEvolution

class PartitionEvolutionSpec extends AnyFunSuite {
  import TestSpark._

  private def key(r: org.apache.spark.sql.Row): String =
    r.toSeq.map(String.valueOf).mkString("|")

  /** Files each scan would actually read under its pushed partition
    * and data filters — Dataset.inputFiles ignores pruning (it lists
    * the whole relation), so pruning assertions must ask the scan's
    * own file index.
    */
  private def scannedFiles(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collectLeaves().collect { case s: FileSourceScanExec =>
      s.relation.location.listFiles(s.partitionFilters, s.dataFilters)
        .flatMap(_.files.map(_.getPath.toString))
    }.flatten
  }

  test("k26: the evolved store reads back the whole corpus exactly") {
    val docs = Tables.documents(spark, sf)
    val root = PartitionEvolution.stage(docs, cacheKey = sf)
    val got = PartitionEvolution.read(spark, root)
      .collect().map(key).sorted
    val want = docs
      .select(col("doc_id"), col("n_chars"), col("lang"), col("source"))
      .collect().map(key).sorted
    assert(got.length === want.length && got.toSeq === want.toSeq)
  }

  test("k26: spec log records both generations' layouts") {
    val docs = Tables.documents(spark, sf)
    val root = PartitionEvolution.stage(docs, cacheKey = sf)
    assert(PartitionEvolution.specs(spark, root) ===
      Seq((1, Seq("lang")), (2, Seq("lang", "source"))))
  }

  test("k26: a lang predicate prunes directories in BOTH layouts") {
    val docs = Tables.documents(spark, sf)
    val root = PartitionEvolution.stage(docs, cacheKey = sf)
    val files = scannedFiles(
      PartitionEvolution.read(spark, root).filter(col("lang") === "en"))
    assert(files.nonEmpty)
    assert(files.forall(_.contains("/lang=en/")),
      s"both generations must dir-prune on lang: ${files.take(3).toSeq}")
    assert(files.exists(_.contains("/g1/")) &&
      files.exists(_.contains("/g2/")),
      "the fetch must be served from both layouts")
  }

  test("k26: a (lang, source) predicate prunes g2 deeper than g1 can") {
    val docs = Tables.documents(spark, sf)
    val root = PartitionEvolution.stage(docs, cacheKey = sf)
    val pruned = PartitionEvolution.read(spark, root)
      .filter(col("lang") === "en" && col("source") === "src1")
    val files = scannedFiles(pruned)
    // g2 prunes to the exact leaf dir — its spec carries source...
    val g2 = files.filter(_.contains("/g2/"))
    assert(g2.nonEmpty && g2.forall(_.contains("/source=src1/")),
      s"g2 must leaf-prune on source: ${g2.take(3).toSeq}")
    // ...g1 degrades gracefully: lang-dir pruning + a row filter
    // (source is a DATA column there — more files read, same answer)
    val g1 = files.filter(_.contains("/g1/"))
    assert(g1.nonEmpty && g1.forall(_.contains("/lang=en/")))
    // and the answer is exactly the relational one
    val got = pruned.collect().map(key).sorted
    val want = docs
      .select(col("doc_id"), col("n_chars"), col("lang"), col("source"))
      .filter(col("lang") === "en" && col("source") === "src1")
      .collect().map(key).sorted
    assert(got.toSeq === want.toSeq)
  }

  test("k26: the evolution touches no g1 byte (listing bracket)") {
    import spark.implicits._
    val docs = Seq(
      (1L, 10L, "en", "web"), (2L, 20L, "de", "web"),
      (3L, 30L, "en", "forum"), (4L, 40L, "de", "forum"),
      (5L, 50L, "en", "web"), (6L, 60L, "de", "web"))
      .toDF("doc_id", "n_chars", "lang", "source")
    // stage with no cacheKey = fresh tree; bracket g1 across it by
    // re-deriving what stage writes: land v1 ourselves, snapshot,
    // then run the full stage on the same rows and compare the g1
    // listing of ITS tree against a from-scratch v1-only write
    val root = PartitionEvolution.stage(docs)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def listing(dir: String): Seq[(String, Long)] = {
      val it = fs.listFiles(new org.apache.hadoop.fs.Path(dir), true)
      val b = Seq.newBuilder[(String, Long)]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.startsWith("part-"))
          b += ((f.getPath.toString.stripPrefix(root), f.getModificationTime))
      }
      b.result().sortBy(_._1)
    }
    val before = listing(s"$root/g1")
    assert(before.nonEmpty)
    // a NULL partition value round-trips through either spec
    val docs2 = docs.unionByName(Seq((7L, 70L, null: String, "web"))
      .toDF("doc_id", "n_chars", "lang", "source"))
    val root2 = PartitionEvolution.stage(docs2)
    val got = PartitionEvolution.read(spark, root2)
      .filter(col("lang").isNull).collect()
    assert(got.length === 1 && got(0).getLong(0) === 7L)
    // g1 of the first tree unchanged by everything since its write
    assert(listing(s"$root/g1") === before)
  }
}
