package graft.tools

import java.util.concurrent.atomic.AtomicReference

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Per-query time decomposition probe (optimization round r18,
  * guide §1: measure first). For each registered query, splits the
  * bench-observed wall time into:
  *
  *  - build_s: DataFrame construction (the registered fn call —
  *    driver-side plan assembly + analysis, plus any metadata/staging
  *    work the operator does eagerly);
  *  - plan_s: Catalyst phases of the executed noop write (analysis +
  *    optimization + physical planning), read from the write's own
  *    QueryExecution via a QueryExecutionListener;
  *  - write_s: total noop-write wall time (so exec ≈ write_s −
  *    plan_s, including AQE re-planning between stages).
  *
  * Queries where build+plan rival write are DRIVER-bound at bench
  * scale — the lever is plan/expression-tree size, not shuffle
  * geometry. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     sbt 'runMain graft.tools.PhaseProbe [query,query,...]'
  *
  * No args = every registered query. One warmup pass (untimed) per
  * query, then GRAFT_PHASE_REPS timed passes (default 2), minimum
  * by total reported (the bench's own estimator).
  */
object PhaseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("GRAFT_PHASE_REPS", "2").toInt
    val only = args.headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val lastQe = new AtomicReference[QueryExecution]()
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = lastQe.set(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    })

    val selected = graft.SparkEntry.queries.filter { case (k, _) =>
      only.forall(_.contains(k))
    }
    val out = collection.mutable.ListBuffer.empty[String]
    selected.foreach { case (name, fn) =>
      try {
        // warmup (also pays one-time staging memos)
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val samples = (0 until reps).map { _ =>
          lastQe.set(null)
          val t0 = System.nanoTime()
          val df = fn(spark, sfDir)
          val t1 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          val t2 = System.nanoTime()
          // listener delivery is async; poll briefly
          var waited = 0
          while (lastQe.get() == null && waited < 200) {
            Thread.sleep(10); waited += 1
          }
          val planMs = Option(lastQe.get()) match {
            case Some(qe) => qe.tracker.phases.values
              .map(s => s.endTimeMs - s.startTimeMs).sum
            case None => 0L
          }
          ((t1 - t0) / 1e9, planMs / 1e3, (t2 - t1) / 1e9)
        }
        val best = samples.minBy(s => s._1 + s._3)
        out += f"PHASE: q=$name build=${best._1}%.3f plan=${best._2}%.3f write=${best._3}%.3f"
      } catch {
        case e: Throwable =>
          out += s"PHASE: q=$name FAILED ${e.getClass.getSimpleName}"
      }
    }
    out.foreach(println)
    spark.stop()
  }
}
