package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B probe for the stream-stream join twins' remaining per-batch
  * floor (r18 optimization round, after the r13 state-partition
  * sizing): times the FULL st18/st19 harness call under candidate
  * child-session configurations, interleaved and min-of-reps so
  * sandbox contention cannot masquerade as a win. Configs ride the
  * parent session (runSizedStream's childSession copies modifiable
  * confs), so the probe exercises the exact registered code path.
  *
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     sbt 'runMain graft.tools.St18ConfProbe [reps]'
  */
object St18ConfProbe {
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

    val shmRoot = "/dev/shm/graft_st18_probe_ckpt"

    // (label, confs to set on the parent before the run)
    val configs: Seq[(String, Map[String, String])] = Seq(
      "base" -> Map.empty,
      "nodata_off" -> Map(
        "spark.sql.streaming.noDataMicroBatches.enabled" -> "false"),
      "ckpt_shm" -> Map(
        "spark.sql.streaming.checkpointLocation" -> shmRoot),
      "rocksdb" -> Map(
        "spark.sql.streaming.stateStore.providerClass" ->
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"),
      "nodata_off+shm" -> Map(
        "spark.sql.streaming.noDataMicroBatches.enabled" -> "false",
        "spark.sql.streaming.checkpointLocation" -> shmRoot)
    )

    def runOnce(which: String): Double = {
      val t0 = System.nanoTime()
      val df = which match {
        case "st18" => graft.streaming.StreamOps.streamStreamJoin(spark, sfDir)
        case "st19" => graft.streaming.StreamOps.streamStreamOuterJoin(spark, sfDir)
      }
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    def withConfs[A](confs: Map[String, String])(body: => A): A = {
      val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body
      finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    // warmup (stages the slices + JIT)
    runOnce("st18"); runOnce("st19")

    val times = collection.mutable.Map.empty[(String, String), List[Double]]
      .withDefaultValue(Nil)
    (0 until reps).foreach { r =>
      configs.foreach { case (label, confs) =>
        Seq("st18", "st19").foreach { q =>
          val t = try withConfs(confs)(runOnce(q)) catch {
            case e: Throwable =>
              println(s"PROBE: $q/$label FAILED ${e.getClass.getSimpleName}: ${e.getMessage.take(120)}")
              Double.NaN
          }
          times((q, label)) = t :: times((q, label))
          println(f"PROBE: rep=$r $q%s $label%s ${t}%.3f")
        }
      }
    }
    println("PROBE: === mins ===")
    Seq("st18", "st19").foreach { q =>
      configs.foreach { case (label, _) =>
        val ts = times((q, label)).filterNot(_.isNaN)
        val m = if (ts.isEmpty) Double.NaN else ts.min
        println(f"PROBE: MIN $q%s $label%-15s $m%.3f")
      }
    }
    // row-count sanity: results must not change under any config
    configs.foreach { case (label, confs) =>
      val n18 = withConfs(confs)(
        graft.streaming.StreamOps.streamStreamJoin(spark, sfDir).count())
      val n19 = withConfs(confs)(
        graft.streaming.StreamOps.streamStreamOuterJoin(spark, sfDir).count())
      println(s"PROBE: ROWS $label st18=$n18 st19=$n19")
    }
    spark.stop()
  }
}
