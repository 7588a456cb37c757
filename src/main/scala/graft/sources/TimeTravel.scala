package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** k14_time_travel — a VERSIONED snapshot catalog over immutable
  * data files: every commit writes only its delta and a new manifest;
  * no commit ever rewrites or deletes a prior commit's files, so any
  * historical version stays readable byte-identical (the
  * Iceberg/Delta snapshot-isolation pattern). k12 answers "apply the
  * CDC feed to the lake" by dynamically OVERWRITING the affected
  * partition directories — correct and minimal for a single-version
  * store, but the pre-image is gone: yesterday's training snapshot
  * cannot be re-read for a repro run, an audit, or a d11-style
  * version diff. This operator is the sink that keeps it.
  *
  * Layout: `dir/c{N}/lang=.../part-*.parquet` — each commit's delta
  * as its own immutable partition tree — plus `dir/meta/v{N}`
  * manifests of (lang, commit) rows: which commit's tree serves each
  * partition at that version. Commit v2 merges the changelog into the
  * AFFECTED partitions only (k12's latestOps/mergeLatest — the SAME
  * shared code path, so the semantics cannot drift), writes the
  * merged result as the NEW commit's tree, and the v2 manifest points
  * affected langs at c2 while inheriting every other (lang -> c1)
  * row from v1's manifest verbatim.
  *
  * Scale shape: a commit costs the delta's partitions, never the
  * table (k12's bound) — plus a metadata-cardinality manifest write
  * (≤ #partitions rows). Reading AT a version enumerates the
  * manifest, not the directory tree: the manifest's (lang, commit)
  * rows become EXPLICIT partition-directory paths, so Spark's file
  * index lists only those directories — at 100 TB (millions of
  * files) the difference between a metadata read and an object-store
  * crawl. Old-version reads cost the same as they did when that
  * version was current. The spec brackets the v2 commit directly:
  * c1's file listing (paths + content digests) taken BEFORE the v2
  * commit equals the listing after it.
  *
  * Reference analog: the durable results tree (tools.py:677 rsync)
  * plus the sqlite progress log's implicit history (tools.py:8-56)
  * — the reference can say WHEN a sample was processed but cannot
  * reproduce WHAT the tree held then; this sink can.
  */
object TimeTravel {

  private val staged =
    scala.collection.concurrent.TrieMap.empty[String, String]

  private val HiveNull = PartitionUpsert.HiveNull

  private def langDir(lang: String): String =
    "lang=" + (if (lang == null) HiveNull else lang)

  private def fsOf(spark: SparkSession,
      dir: String): (org.apache.hadoop.fs.FileSystem,
        org.apache.hadoop.fs.Path) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Child directory names of `dir` matching `prefix`, via the Hadoop
    * FileSystem API — the catalog's own metadata walk must resolve
    * through the SAME filesystem the writers used (a java.io listing
    * silently returns empty on any non-local default FS, turning a
    * populated tree into an empty manifest instead of an error).
    */
  private def listDirs(spark: SparkSession, dir: String,
      prefix: String): Seq[String] = {
    val (fs, p) = fsOf(spark, dir)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .map(_.getPath.getName)
  }

  /** Partition values of a committed tree, from the DIRECTORY
    * listing partitionBy materialized — metadata cost, no data scan.
    */
  private def commitLangs(spark: SparkSession, dir: String): Seq[String] =
    listDirs(spark, dir, "lang=")
      .map(_.stripPrefix("lang="))
      .map(v => if (v == HiveNull) null else v)

  /** Manifest rows for one version: (lang, commit). NULL lang is a
    * legitimate partition value (hive default partition on disk) and
    * survives the round trip.
    */
  private def writeManifest(spark: SparkSession, dir: String,
      version: Int, rows: Seq[(String, Int)]): Unit = {
    import spark.implicits._
    rows.toDF("lang", "commit").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/meta/v$version")
  }

  private def readManifest(spark: SparkSession, dir: String,
      version: Int): Seq[(String, Int)] =
    spark.read.parquet(s"$dir/meta/v$version")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq

  /** Read the table AS OF `version`: the manifest's (lang, commit)
    * rows become explicit partition-directory paths (one pruned scan
    * per referenced commit, `basePath` recovers the lang column), so
    * the file index lists EXACTLY the manifest's directories — a
    * tree-wide read with partition filters would still crawl every
    * leaf of the commit to build its file index first.
    */
  def readAt(spark: SparkSession, dir: String,
      version: Int): DataFrame = {
    val manifest = readManifest(spark, dir, version)
    manifest.groupBy(_._2).toSeq.sortBy(_._1).map { case (commit, rows) =>
      val paths = rows.map(r => s"$dir/c$commit/${langDir(r._1)}")
      spark.read
        .option("basePath", s"$dir/c$commit")
        .schema(PartitionUpsert.treeSchema)
        .parquet(paths: _*)
    }.reduceOption(_.unionByName(_))
      // schema-correct empty frame so downstream summaries stay total
      .getOrElse(spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType.fromDDL(
          PartitionUpsert.treeSchema)))
  }

  /** Commit 1: the demo base tree (corpus + NULL-lang shadows, see
    * PartitionUpsert.demoBase) + its manifest.
    */
  private[graft] def stageBase(documents: DataFrame,
      dir: String): Unit = {
    val spark = documents.sparkSession
    val base = PartitionUpsert.demoBase(documents)
    PartitionUpsert.writeTree(base, s"$dir/c1")
    val langs = commitLangs(spark, s"$dir/c1")
    // a populated write that lists empty means the listing resolved
    // through the wrong filesystem — fail loudly, never an empty v1
    // (the isEmpty probe runs only on the empty-listing path)
    require(langs.nonEmpty || base.isEmpty,
      s"c1 wrote a non-empty tree but the listing of $dir/c1 is empty")
    writeManifest(spark, dir, 1, langs.map(_ -> 1))
  }

  /** Commit 2: k12's demo changelog merged into ONLY the affected
    * partitions (shared latestOps/mergeLatest code path, null-safe
    * prune + <=> keys), landed as a NEW tree + manifest — c1 is never
    * touched. The v2 manifest's c2 rows come from the partitions c2
    * ACTUALLY materialized, not the affected list: an affected
    * partition whose merge deleted every row writes no directory and
    * must simply be absent at v2 (falling back to v1 would resurrect
    * the deleted rows).
    */
  private[graft] def commitChanges(documents: DataFrame,
      dir: String): Unit = {
    val spark = documents.sparkSession
    val latest = PartitionUpsert.latestOps(
      PartitionUpsert.changelog(PartitionUpsert.demoBase(documents)))
    val affected = latest.select(col("lang")).distinct()
      .collect().map(_.getString(0)).toSeq
    val pruned = spark.read.schema(PartitionUpsert.treeSchema)
      .parquet(s"$dir/c1")
      .filter(PartitionUpsert.langIn(affected))
    PartitionUpsert.writeTree(
      PartitionUpsert.mergeLatest(pruned, latest), s"$dir/c2")
    val written = commitLangs(spark, s"$dir/c2")
    val v1Langs = readManifest(spark, dir, 1).map(_._1)
    writeManifest(spark, dir, 2,
      written.map(_ -> 2) ++
        v1Langs.filterNot(affected.contains).map(_ -> 1))
  }

  /** Stage the two-commit demo; memoized per sfDir like every
    * staged sink.
    */
  def stageVersions(documents: DataFrame,
      cacheKey: String = ""): String = {
    def fresh(): String = {
      val dir = graft.Staging.dir("graft_k14_")
      stageBase(documents, dir)
      commitChanges(documents, dir)
      dir
    }
    if (cacheKey.isEmpty) fresh()
    else staged.getOrElseUpdate(cacheKey, fresh())
  }

  /** Registered query: BOTH versions read back through their
    * manifests and summarized per (version, lang) — proving v1 is
    * still exactly the pre-image after v2 landed. Shares k12's
    * summary columns; the oracle rebuilds both states relationally.
    */
  def timeTravelSummary(documents: DataFrame,
      cacheKey: String = ""): DataFrame = {
    val spark = documents.sparkSession
    val dir = stageVersions(documents, cacheKey)
    Seq(1, 2).map { v =>
      PartitionUpsert.summarize(readAt(spark, dir, v))
        .withColumn("version", lit(v.toLong))
    }.reduce(_.unionByName(_))
      .select(col("version"), col("lang"), col("n_docs"),
        col("key_checksum"), col("chars_checksum"), col("n_upserted"))
  }

  // ---- retention: snapshot expiry + orphan vacuum -----------------

  /** Versions with a manifest in the catalog. */
  private[graft] def versions(spark: SparkSession,
      dir: String): Seq[Int] =
    listDirs(spark, s"$dir/meta", "v")
      .map(_.stripPrefix("v").toInt).sorted

  /** Expire every version `< retainFrom`: delete their manifests,
    * then VACUUM every commit partition directory no RETAINED
    * manifest references — the lifecycle half of the snapshot
    * pattern (a catalog that keeps every commit forever is a
    * disk-leak, not a table). Immutability is preserved for what
    * survives: a (commit, lang) directory referenced by ANY retained
    * manifest is untouched, so every retained version still reads
    * byte-identical (spec brackets this with content digests). The
    * walk is metadata-cardinality: #manifest rows + one listing per
    * commit tree, through the Hadoop FS API. Reference analog: the
    * `clean` step (tools.py:677-736) that deletes intermediates once
    * the durable result is landed.
    */
  def expire(spark: SparkSession, dir: String,
      retainFrom: Int): Unit = {
    val all = versions(spark, dir)
    val (dead, live) = all.partition(_ < retainFrom)
    require(live.nonEmpty,
      s"expire(retainFrom=$retainFrom) would retain no version of $dir")
    if (dead.isEmpty) return
    val liveRefs: Set[(Int, String)] = live.flatMap { v =>
      readManifest(spark, dir, v).map { case (l, c) => (c, langDir(l)) }
    }.toSet
    val (fs, _) = fsOf(spark, dir)
    listDirs(spark, dir, "c").filter(_.matches("c\\d+")).foreach { cName =>
      val commit = cName.stripPrefix("c").toInt
      listDirs(spark, s"$dir/$cName", "lang=").foreach { ld =>
        if (!liveRefs.contains((commit, ld)))
          fs.delete(new org.apache.hadoop.fs.Path(s"$dir/$cName/$ld"),
            true)
      }
      // drop a commit tree no retained manifest references at all
      if (!liveRefs.exists(_._1 == commit))
        fs.delete(new org.apache.hadoop.fs.Path(s"$dir/$cName"), true)
    }
    dead.foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(s"$dir/meta/v$v"), true)
    }
  }
}
