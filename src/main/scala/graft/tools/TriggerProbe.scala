package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Micro-batch cost decomposition probe (optimization round r18).
  * Runs selected streaming harness queries with a
  * StreamingQueryListener and prints each progress event's
  * durationMs map (triggerExecution, queryPlanning, getBatch,
  * addBatch, walCommit, commitOffsets, stateCommit...) — the direct
  * answer to "what composes the ~0.8 s/trigger floor" that the
  * St14Probe/HarnessFloorProbe affine fits established but could
  * not attribute.
  *
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     sbt 'runMain graft.tools.TriggerProbe st18,st14'
  */
/** Conf-registered listener (spark.sql.streaming.streamingQueryListeners)
  * so it attaches to EVERY session's StreamingQueryManager — the harness
  * runs its streams on child sessions (runSizedStream), which a listener
  * added to the parent's `spark.streams` never sees.
  */
class TriggerPrintListener extends StreamingQueryListener {
  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit =
    println(s"TRIGGER: started name=${e.name}")
  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    val dur = p.durationMs
    import scala.jdk.CollectionConverters._
    val parts = dur.asScala.toSeq.sortBy(-_._2)
      .map { case (k, v) => s"$k=$v" }.mkString(" ")
    val state = Option(p.stateOperators).map(_.toSeq).getOrElse(Nil)
      .map(s => s"op rows=${s.numRowsTotal} commit=${s.commitTimeMs}ms")
      .mkString("; ")
    println(s"TRIGGER: batch=${p.batchId} rows=${p.numInputRows} " +
      s"$parts  [$state]")
  }
  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
}

object TriggerProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val which = args.headOption.getOrElse("st18").split(",").toSeq
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.streaming.streamingQueryListeners",
        "graft.tools.TriggerPrintListener")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val fns: Map[String, () => Unit] = Map(
      "st18" -> (() => { graft.streaming.StreamOps
        .streamStreamJoin(spark, sfDir).count(); () }),
      "st19" -> (() => { graft.streaming.StreamOps
        .streamStreamOuterJoin(spark, sfDir).count(); () }),
      "st14" -> (() => { graft.SparkEntry.queries("st14_stream_ledger")(
        spark, sfDir).count(); () }),
      "st16" -> (() => { graft.SparkEntry.queries("st16_stream_index")(
        spark, sfDir).count(); () }),
      "st13" -> (() => { graft.SparkEntry.queries("st13_stream_heavy")(
        spark, sfDir).count(); () }),
      "st22" -> (() => { graft.SparkEntry.queries("st22_stream_blob_ingest")(
        spark, sfDir).count(); () }),
      "st15" -> (() => { graft.SparkEntry.queries("st15_stream_select")(
        spark, sfDir).count(); () }),
      "st02" -> (() => { graft.SparkEntry.queries("st02_stream_session")(
        spark, sfDir).count(); () }),
      "st23" -> (() => { graft.SparkEntry.queries("st23_stream_session_timers")(
        spark, sfDir).count(); () }),
      "st01" -> (() => { graft.SparkEntry.queries("st01_stream_window")(
        spark, sfDir).count(); () })
    )
    which.foreach { name =>
      println(s"TRIGGER: === $name warmup ===")
      fns(name)()
      println(s"TRIGGER: === $name timed ===")
      val t0 = System.nanoTime()
      fns(name)()
      println(f"TRIGGER: === $name total=${(System.nanoTime() - t0) / 1e9}%.3f ===")
    }
    spark.stop()
  }
}
