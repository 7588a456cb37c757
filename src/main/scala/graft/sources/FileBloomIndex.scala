package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** k17_bloom_point_lookup — file-level bloom index for POINT lookups
  * on the landed document store: the Iceberg-puffin / Delta
  * file-bloom pattern. Range layouts (k08 sort, k16 z-order) prune
  * on footer min/max, which is useless for a membership probe on a
  * high-cardinality key scattered across the tree: "fetch these 40
  * doc_ids" (a takedown list, a contamination verdict, a sample
  * inspection) would otherwise scan every file at 100 TB. A bloom
  * per FILE — bits in a manifest, never in the data path — turns the
  * fetch into: probe the metadata-scale index, read only the
  * candidate files, post-filter exactly.
  *
  * The index is built with plain DataFrame ops, no custom aggregate:
  * each doc_id explodes to `Hashes` bit positions
  * (xxhash64(doc_id, seed) mod bits), positions group to
  * (file, word_idx) rows folded with bit_or — the manifest is
  * `files × Words` longs. A lookup replays the same hashes for the
  * query ids, joins the manifest on word_idx (an equi-join on
  * metadata rows), and keeps files where ALL `Hashes` bits hit; the
  * candidate file list is a bounded collect (|queries| × (1 + fp)
  * entries — dial-bounded, not corpus-bounded), and the final scan
  * reads exactly those paths. Blooms have NO false negatives by
  * construction (spec-pinned: candidates ⊇ true files), so the
  * post-filtered answer is exact and the DuckDB oracle is just the
  * direct predicate on documents.
  *
  * Sizing: Words·64 bits serve ~Words·6 keys/file at ≲1% false
  * positives (the standard ~10 bits/key rule, k=3 near-optimal
  * there); the default 64 words covers the test tree's ~150
  * keys/file with margin, and a 100 TB deployment raises the ONE
  * dial with its file row-count. Reference analog: the `samtools
  * index` + per-sample sqlite ledger pair (tools.py:8-56, 499-530) —
  * the artifact you consult so you don't re-read the data.
  */
object FileBloomIndex {

  private val staged =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** The store's on-disk schema — ONE definition shared by the
    * staged write's projection, readStore, and the candidate-file
    * fetch, so a column addition can't silently diverge the paths.
    */
  private[graft] val StoreSchema =
    "doc_id BIGINT, lang STRING, source STRING, n_chars BIGINT"

  /** 64-bit words per file bloom (64 words = 4096 bits). The
    * config-reachable sizing dials (JobSpec `words`/`hashes`): a
    * deployment re-sizes the index to its file row-count by editing
    * a job spec, not recompiling. EXACTNESS is dial-independent —
    * blooms have no false negatives at any sizing and the fetch
    * post-filters, so an undersized index costs extra candidate
    * reads, never a wrong answer (spec-pinned at words=4).
    */
  val Words = 64

  val Hashes = 3

  /** The registered fetch list: doc_id ≡ 7 (mod 97) — arithmetic, so
    * the oracle replays it; ~1% of the corpus, scattered uniformly
    * across files (the hostile case for min/max pruning).
    */
  private[graft] val LookupMod = 97L
  private[graft] val LookupRes = 7L

  /** Land the store as a multi-file tree hashed on doc_id (point
    * lookups don't care about order; hash spreads write skew), then
    * build the per-file bloom manifest beside it. Memoized per
    * cacheKey like every staged sink.
    */
  /** Index dir for a sizing, beside the store. Underscore-prefixed
    * (any `_bloom*` name is invisible to data reads); suffixed by
    * the dials because the bits on disk are sized by them — two
    * sizings are two artifacts.
    */
  private[graft] def indexDirFor(dir: String, words: Int = Words,
      hashes: Int = Hashes): String = s"$dir/_bloom_w${words}_h$hashes"

  /** Land the store ONCE per corpus cut — the data tree is
    * dial-independent; only the manifest is sized by (words, hashes).
    * A bloom-sizing sweep must rebuild files×words longs per sizing,
    * never re-land the corpus.
    */
  def stageStore(documents: DataFrame, writers: Int = 32,
      cacheKey: String = ""): String = {
    def fresh(): String = {
      val dir = graft.Staging.dir("graft_k17_") + "/store"
      documents
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .repartition(writers, col("doc_id"))
        .write.mode(SaveMode.Overwrite).parquet(dir)
      dir
    }
    if (cacheKey.isEmpty) fresh()
    else staged.getOrElseUpdate(cacheKey, fresh())
  }

  private val stagedIndexes =
    scala.collection.concurrent.TrieMap.empty[(String, Int, Int), String]

  /** Build (memoized per (store, sizing)) the per-file bloom
    * manifest at the sizing's own dir and return that dir.
    */
  private[graft] def ensureIndex(spark: SparkSession, dir: String,
      words: Int = Words, hashes: Int = Hashes): String =
    stagedIndexes.getOrElseUpdate((dir, words, hashes), {
      val idx = indexDirFor(dir, words, hashes)
      indexRowsFor(readStore(spark, dir), words, hashes)
        .write.mode(SaveMode.Overwrite).parquet(idx)
      idx
    })

  /** The manifest build fold — ONE definition shared by k17's build
    * and k18's bootstrap/refresh, so the index shape cannot drift
    * between the static and the maintained store.
    */
  private[graft] def indexRowsFor(tree: DataFrame, words: Int = Words,
      hashes: Int = Hashes): DataFrame =
    bloomBits(
      tree.select(col("doc_id"), col("_metadata.file_path").as("file")),
      words, hashes)
      .groupBy(col("file"), col("word_idx"))
      .agg(bit_or(col("word")).as("word"))
      .repartition(1)

  private[graft] def readStore(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(StoreSchema).parquet(dir)

  /** Read a bloom manifest by ITS OWN dir (k17 keeps one per sizing
    * at `<store>/_bloom_w{W}_h{H}`; k18's maintenance keeps versions
    * under `<store>/_bloom/v{N}`) — the probe machinery is
    * index-location agnostic.
    */
  private[graft] def readIndex(spark: SparkSession,
      indexDir: String): DataFrame =
    spark.read.schema("file STRING, word_idx INT, word BIGINT")
      .parquet(indexDir)

  /** Explode ids to their `hashes` bloom coordinates: one
    * (…, word_idx, word) row per hash with exactly that bit set.
    * Build and probe MUST agree on (words, hashes) — both replay
    * this one definition.
    */
  private[graft] def bloomBits(ids: DataFrame, words: Int = Words,
      hashes: Int = Hashes): DataFrame = {
    // dial floor: hashes=0 would probe nothing and words=0 would
    // pmod by zero — both degrade to a silently EMPTY (wrong) fetch,
    // the one failure mode the exactness contract forbids
    require(words > 0 && hashes > 0,
      s"bloom sizing must be positive: words=$words, hashes=$hashes")
    ids
      .withColumn("seed", explode(lit((0 until hashes).toArray)))
      .withColumn("bitpos",
        pmod(xxhash64(col("doc_id"), col("seed")), lit(words * 64L)))
      .withColumn("word_idx", (col("bitpos") / 64L).cast("int"))
      .withColumn("word",
        expr("shiftleft(CAST(1 AS BIGINT), CAST(bitpos % 64 AS INT))"))
      .drop("seed", "bitpos")
  }

  /** Files that MAY contain any of `ids` (no false negatives by
    * bloom construction): a file qualifies for an id when ALL
    * `Hashes` probed bits are set. Bounded collect: |ids| × (1 + fp)
    * paths — dial-bounded (the fetch list's size), not
    * corpus-bounded.
    */
  private[graft] def candidateFiles(spark: SparkSession, indexDir: String,
      ids: DataFrame, words: Int = Words,
      hashes: Int = Hashes): Seq[String] =
    bloomBits(ids.select(col("doc_id")).distinct(), words, hashes)
      .withColumnRenamed("word", "probe")
      .join(readIndex(spark, indexDir), Seq("word_idx"))
      .filter((col("word").bitwiseAND(col("probe"))) === col("probe"))
      .groupBy(col("doc_id"), col("file"))
      .agg(count(lit(1)).as("hits"))
      .filter(col("hits") === hashes)
      .select(col("file")).distinct()
      .collect().map(_.getString(0)).toSeq

  /** The probe-and-read half of every indexed fetch — ONE
    * definition serving k17, k18, and st16 (their stores differ in
    * schema and index location, not in shape): resolve candidate
    * files through the manifest, read ONLY those paths (basePath
    * keeps partition columns on a leaf-file read; harmless on an
    * unpartitioned store), degrade to a typed empty frame when no
    * file can hold any wanted id. Callers post-filter exactly —
    * predicate, liveness — and project.
    */
  private[graft] def fetchCandidates(spark: SparkSession, treeDir: String,
      indexDir: String, schema: String, wanted: DataFrame,
      words: Int = Words, hashes: Int = Hashes): DataFrame = {
    val candidates = candidateFiles(spark, indexDir, wanted, words, hashes)
    if (candidates.isEmpty)
      spark.read.schema(schema).parquet(treeDir).filter(lit(false))
    else
      spark.read.option("basePath", treeDir).schema(schema)
        .parquet(candidates: _*)
  }

  /** The registered query: fetch the arithmetic lookup list through
    * the bloom manifest — probe, read ONLY candidate files,
    * post-filter exactly — and return the fetched rows.
    */
  def pointLookup(documents: DataFrame,
      cacheKey: String = "", words: Int = Words,
      hashes: Int = Hashes): DataFrame = {
    val spark = documents.sparkSession
    val dir = stageStore(documents, cacheKey = cacheKey)
    val indexDir = ensureIndex(spark, dir, words, hashes)
    val wanted = documents
      .filter(col("doc_id").isNotNull &&
        pmod(col("doc_id"), lit(LookupMod)) === LookupRes)
      .select(col("doc_id")).distinct()
    fetchCandidates(spark, dir, indexDir, StoreSchema, wanted,
      words, hashes)
      .filter(pmod(col("doc_id"), lit(LookupMod)) === LookupRes)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
  }
}
