package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Config-driven operator parameterization — the reference's entire
  * entry point is a parsed job form (parserTools.py:13-92
  * parseForm/extractLines/unpack; pipelineParser.py:22), and its
  * thresholds are caller-settable per run (macs2 q='0.01',
  * tools.py:555). Graft's operators expose the same dials as Scala
  * default arguments; this layer makes them DATA: a job spec is a
  * JSONL file of {"op": ..., "params": {...}} rows read through the
  * Spark JSON source, and `run` dispatches each row to its operator
  * with the spec's dials overriding the compiled defaults — so
  * re-running an analysis at a different threshold is an edit to a
  * text file, not a recompile.
  *
  * Params are a MAP<STRING,STRING> (every value written as a string,
  * like the reference's form fields) and are coerced at the dispatch
  * site, so one schema serves every operator and an unknown dial is
  * a loud error, never a silent default. The spec file is
  * human-authored and job-cardinality (rows = jobs, not data), so
  * the collect is bounded by construction.
  */
object JobSpec {

  final case class Job(op: String, params: Map[String, String]) {
    private def get[T](key: String, default: T)(parse: String => T): T =
      params.get(key).map(parse).getOrElse(default)
    def str(key: String, default: String): String = get(key, default)(identity)
    def int(key: String, default: Int): Int = get(key, default)(_.toInt)
    def long(key: String, default: Long): Long = get(key, default)(_.toLong)
    def double(key: String, default: Double): Double =
      get(key, default)(_.toDouble)
  }

  /** Parse a JSONL job spec. Columns beyond (op, params) are ignored;
    * a row without `op` is rejected.
    */
  def load(spark: SparkSession, path: String): Seq[Job] = {
    val rows = spark.read
      .schema("op STRING, params MAP<STRING, STRING>")
      .json(path)
      .collect()
    rows.toSeq.map { r =>
      require(!r.isNullAt(0), s"job spec row without an `op`: $r")
      val p =
        if (r.isNullAt(1)) Map.empty[String, String]
        else r.getMap[String, String](1).toMap
      Job(r.getString(0), p)
    }
  }

  /** Dial-reachable operators: op key -> (session, sfDir, job) =>
    * result. Defaults here MIRROR the operator signatures' default
    * arguments — the no-params job must equal the registered query.
    * Unknown params fail loudly (see `checked`).
    */
  private val dispatch: Map[String,
      (SparkSession, String, Job) => DataFrame] = Map(
    "q12_peak_detect" -> ((s, d, j) =>
      checked(j, "binSeconds")(operators.Pipeline.peakDetect(
        Tables.events(s, d),
        binSeconds = j.long("binSeconds", 3600L)))),
    "q21_peak_local" -> ((s, d, j) =>
      checked(j, "binSeconds", "k", "z")(operators.Pipeline.peakDetectLocal(
        Tables.events(s, d),
        binSeconds = j.long("binSeconds", 3600L),
        k = j.int("k", 12), z = j.double("z", 2.0)))),
    // the macs2-q analog: the FDR ceiling is the headline dial
    "q24_peak_fdr" -> ((s, d, j) =>
      checked(j, "binSeconds", "k", "qMax")(operators.Pipeline.peakFdr(
        Tables.events(s, d),
        binSeconds = j.long("binSeconds", 3600L),
        k = j.int("k", 12), qMax = j.double("qMax", 0.01)))),
    "q06_range_filter" -> ((s, d, j) =>
      checked(j, "lo", "hi")(operators.Relational.rangeFilter(
        Tables.lineitem(s, d),
        lo = j.double("lo", 10d), hi = j.double("hi", 40d)))),
    "q43_heavy_hitters" -> ((s, d, j) =>
      checked(j, "shareDenom", "k")(operators.TextAnalysis.heavyHitterTokens(
        Tables.documents(s, d),
        shareDenom = j.int("shareDenom",
          operators.TextAnalysis.HeavyShareDenom),
        k = j.int("k", operators.TextAnalysis.HeavyK)))),
    "d02_dedup_minhash" -> ((s, d, j) =>
      checked(j, "n", "numHashes", "bands", "tau", "maxBucket")(
        operators.Dedup.dedupMinhash(Tables.documents(s, d),
          n = j.int("n", 3), numHashes = j.int("numHashes", 64),
          bands = j.int("bands", 16), tau = j.double("tau", 0.6),
          maxBucket = j.int("maxBucket", 256)))),
    "d04_ngram_jaccard" -> ((s, d, j) =>
      checked(j, "n", "tau", "maxDf")(operators.Dedup.ngramJaccard(
        Tables.documents(s, d),
        n = j.int("n", 3), tau = j.double("tau", 0.6),
        maxDf = j.int("maxDf", 128)))),
    "p09_quality_sample" -> ((s, d, j) =>
      checked(j, "basePermille", "stepPermille", "salt")(
        operators.Corpus.qualitySample(Tables.documents(s, d),
          basePermille = j.int("basePermille", 100),
          stepPermille = j.int("stepPermille", 100),
          salt = j.long("salt", 577L)))),
    "s01_ann_bruteforce" -> ((s, d, j) =>
      checked(j, "k", "queryStride")(operators.Similarity.annBruteForce(
        Tables.embeddings(s, d),
        k = j.int("k", 5), queryStride = j.int("queryStride", 50))))
  )

  /** Op keys whose dials are reachable from a job spec. */
  def configurable: Set[String] = dispatch.keySet

  /** A typo'd dial must not silently run the defaults. */
  private def checked(job: Job, known: String*)(df: => DataFrame): DataFrame = {
    val unknown = job.params.keySet -- known.toSet
    require(unknown.isEmpty,
      s"unknown dial(s) ${unknown.mkString(", ")} for ${job.op}; " +
        s"known: ${known.mkString(", ")}")
    df
  }

  /** Run one job against the tables in `sfDir`. */
  def run(spark: SparkSession, sfDir: String, job: Job): DataFrame =
    dispatch.getOrElse(job.op,
      throw new IllegalArgumentException(
        s"op ${job.op} is not config-dispatchable; " +
          s"known: ${dispatch.keys.toSeq.sorted.mkString(", ")}")
    )(spark, sfDir, job)

  /** Load a spec file and run every job in order, returning
    * (op, result) pairs — the batch analog of the reference's
    * form-driven pipeline run.
    */
  def runAll(spark: SparkSession, sfDir: String,
      specPath: String): Seq[(String, DataFrame)] =
    load(spark, specPath).map(j => j.op -> run(spark, sfDir, j))
}
