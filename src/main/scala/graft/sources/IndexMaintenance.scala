package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** k18_index_maintenance — INCREMENTAL secondary-index refresh under
  * partition upsert: the lifecycle composition k12 + k17 leave open.
  * k17's per-file bloom manifest is built once over a static store;
  * a real lake MUTATES — k12's nightly CDC apply rewrites the
  * affected partition directories, which invalidates exactly those
  * directories' index rows (their files are replaced wholesale by
  * dynamic overwrite) and no others. Rebuilding the whole manifest
  * per delta re-couples index cost to CORPUS size; at 100 TB the
  * index refresh must cost what the merge cost — proportional to the
  * DELTA's partitions, not the tree. This is the Iceberg/Delta
  * metadata-maintenance contract (puffin blobs rewritten per
  * rewritten data file) and the `samtools index` re-run after a
  * re-sorted sample (tools.py:499-530) — done incrementally.
  *
  * Mechanics: index versions live under `<tree>/_bloom/v{N}`
  * (underscore-hidden from data reads, k14's immutable-version
  * convention — a reader mid-flight on v1 is never yanked). Refresh
  * = v1 rows whose file is OUTSIDE the affected partition dirs (kept
  * verbatim — metadata-scale filter, no data scan) ∪ blooms rebuilt
  * from ONLY the affected directories' post-merge files (the scan is
  * constructed from the affected paths, so unaffected partitions are
  * not even listed — spec-asserted on the rebuild's inputFiles).
  * Affected-set discovery is the changelog's partition values,
  * null-safe: the NULL partition (`lang=__HIVE_DEFAULT_PARTITION__`)
  * is a first-class index citizen exactly as it is a first-class
  * merge citizen (k12's langIn discipline, on-disk dir name here).
  *
  * The registered query is the consumer's view: a point fetch
  * (k17's shape) through the REFRESHED index against the
  * POST-MERGE store — no false negatives (spec: v2 ≡ a from-scratch
  * rebuild of the merged tree, row-identical), exact post-filter, so
  * the DuckDB oracle is k12's relational merge replay filtered by
  * the same arithmetic fetch list.
  */
object IndexMaintenance {

  private val staged =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** The fetch list's arithmetic is k17's — one definition (mod 97,
    * residue 7, coprime to the demo's changelog moduli 3/11/13 so
    * the list mixes kept, upserted, deleted, and NULL-partition
    * keys), shared so the two oracles' hard-coded predicates track
    * one Scala source of truth.
    */
  private[graft] val LookupMod = FileBloomIndex.LookupMod
  private[graft] val LookupRes = FileBloomIndex.LookupRes

  private def treeSchema = PartitionUpsert.treeSchema

  /** Build a full bloom manifest over every file of a partitioned
    * tree (the v1 bootstrap — paid once, like the store itself).
    * The fold is k17's `indexRowsFor` — the static and the
    * maintained store share one index shape by construction.
    * `schema` lets st16 index the CONVERGENT tree (seq + tombstone
    * columns): blooms only hash doc_id, so any tree schema carrying
    * it indexes identically — a tombstone's file is indexed like a
    * live row's, and the fetch's liveness post-filter keeps
    * exactness.
    */
  private[graft] def buildIndex(spark: SparkSession, treeDir: String,
      indexDir: String, schema: String = PartitionUpsert.treeSchema): Unit =
    FileBloomIndex
      .indexRowsFor(spark.read.schema(schema).parquet(treeDir))
      .write.mode(SaveMode.Overwrite).parquet(indexDir)

  /** TRUE iff `file` lies under one of the affected partition dirs
    * (on-disk names, e.g. `lang=en` / `lang=__HIVE_DEFAULT_PARTITION__`).
    * An EMPTY affected set means nothing is affected (an empty
    * micro-batch in st16) — constant false, so a refresh against it
    * keeps every row and rebuilds nothing.
    */
  private[graft] def underAffected(file: Column,
      affectedDirs: Set[String]): Column =
    if (affectedDirs.isEmpty) lit(false)
    else affectedDirs.toSeq.sorted
      .map(d => file.contains(s"/$d/"))
      .reduce(_ || _)

  /** The rebuild slice: blooms recomputed from ONLY the affected
    * directories' current files. The scan is constructed from the
    * affected paths — unaffected partitions are not listed, let
    * alone read (the incremental contract; spec asserts it on
    * inputFiles). An affected dir may not EXIST (a sparse corpus
    * never materialized the partition, or a delete-everything merge
    * left none) — existence-filter through the Hadoop FS rather
    * than letting the reader throw PATH_NOT_FOUND, and degrade to
    * an empty slice when nothing remains (operators yield empty,
    * not errors). Exposed for the spec.
    */
  private[graft] def rebuiltSlice(spark: SparkSession, treeDir: String,
      affectedDirs: Set[String],
      schema: String = PartitionUpsert.treeSchema): DataFrame = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val paths = affectedDirs.toSeq.sorted
      .map(d => new org.apache.hadoop.fs.Path(s"$treeDir/$d"))
      .filter(p => p.getFileSystem(hconf).exists(p))
      .map(_.toString)
    val slice =
      if (paths.isEmpty)
        spark.read.schema(schema).parquet(treeDir).filter(lit(false))
      else
        spark.read.option("basePath", treeDir)
          .schema(schema).parquet(paths: _*)
    FileBloomIndex.indexRowsFor(slice)
  }

  /** v(from) → v(to): kept rows verbatim for unaffected files +
    * rebuilt rows for the affected directories.
    */
  private[graft] def refreshIndex(spark: SparkSession, treeDir: String,
      affectedDirs: Set[String], fromV: Long, toV: Long,
      schema: String = PartitionUpsert.treeSchema): Unit = {
    val kept = FileBloomIndex
      .readIndex(spark, s"$treeDir/_bloom/v$fromV")
      .filter(!underAffected(col("file"), affectedDirs))
    kept.unionByName(rebuiltSlice(spark, treeDir, affectedDirs, schema))
      .repartition(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$treeDir/_bloom/v$toV")
  }

  /** On-disk partition dir name for a lang value (NULL is the hive
    * default partition) — the bridge from a changelog's affected
    * VALUES to the tree's affected DIRECTORIES.
    */
  private[graft] def langDir(lang: String): String =
    if (lang == null) s"lang=${PartitionUpsert.HiveNull}" else s"lang=$lang"

  /** Stage the full demo: base tree (corpus + NULL-lang shadows,
    * k12's demoBase) → v1 index bootstrap → k12's CDC apply →
    * incremental refresh to v2. Memoized per cacheKey.
    */
  def stageMaintained(documents: DataFrame,
      cacheKey: String = ""): String = {
    def fresh(): String = {
      val spark = documents.sparkSession
      val dir = graft.Staging.dir("graft_k18_") + "/tree"
      val base = PartitionUpsert.demoBase(documents)
      PartitionUpsert.writeTree(base, dir)
      buildIndex(spark, dir, s"$dir/_bloom/v1")
      PartitionUpsert.applyChanges(spark, dir,
        PartitionUpsert.changelog(base))
      refreshIndex(spark, dir, PartitionUpsert.ChangedPartitionDirs,
        fromV = 1, toV = 2)
      dir
    }
    if (cacheKey.isEmpty) fresh()
    else staged.getOrElseUpdate(cacheKey, fresh())
  }

  /** The registered query: the arithmetic fetch list resolved
    * through the v2 (post-merge) index — probe, read ONLY candidate
    * files (basePath keeps the partition column on a leaf-file
    * read), post-filter exactly. Upserted rows surface their new
    * length; deleted keys are simply absent: the index answers for
    * the store as it IS, which is the whole point of maintaining it.
    */
  def maintainedLookup(documents: DataFrame,
      cacheKey: String = ""): DataFrame = {
    val spark = documents.sparkSession
    val dir = stageMaintained(documents, cacheKey)
    val wanted = PartitionUpsert.demoBase(documents)
      .filter(pmod(col("doc_id"), lit(LookupMod)) === LookupRes)
      .select(col("doc_id")).distinct()
    FileBloomIndex.fetchCandidates(spark, dir, s"$dir/_bloom/v2",
      treeSchema, wanted)
      .filter(pmod(col("doc_id"), lit(LookupMod)) === LookupRes)
      .select(col("doc_id"), col("lang"),
        length(col("text")).cast("long").as("n_chars"))
  }
}
