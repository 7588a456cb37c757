package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r11 item 4 — runtime bloom-filter join pruning. At 100 TB
  * the selective fact⋈dim joins (q03's align shape with a dim
  * predicate, d06's posting⋈benchmark) stop broadcasting their dim
  * and shuffle; the probe-side scan then wants a RUNTIME filter built
  * from the dim's surviving keys so fact rows drop BEFORE the
  * exchange. Spark's `InjectRuntimeFilter` covers exactly this shape
  * (inner equi-join + a likely-selective creation-side predicate +
  * a shuffle on the application side), gated by two size thresholds
  * that are tuned for cluster scale:
  *
  *   spark.sql.optimizer.runtime.bloomFilter.enabled  (default true)
  *   ...bloomFilter.creationSideThreshold   (creation side < 10 MB)
  *   ...bloomFilter.applicationSideScanSizeThreshold (scan > 10 GB)
  *
  * At sf0.1 the application side is far below 10 GB, so the rule is
  * correctly dormant locally — the production plan's behavior can't
  * be read off a default local run. This spec lowers the application
  * threshold to zero and pins that, under our engine session config
  * (AQE on, InferFiltersFromGenerate excluded), the rule still
  * FIRES on our join shape and the filter lands on the fact side
  * BEFORE the join — i.e. nothing in the session surface disables
  * the 100 TB pruning path — and that the filter never changes
  * answers (k02/k08's layout-never-changes-answers precedent).
  */
class RuntimeFilterSpec extends AnyFunSuite {
  import TestSpark._

  /** The at-scale align shape: dim too big to broadcast (forced via
    * threshold -1), with the selective dim predicate a real
    * alignment run has (one genome build / one brand).
    */
  private def selectiveAlign(): DataFrame = {
    val li = Tables.lineitem(spark, sf)
    val part = Tables.part(spark, sf).filter(col("p_brand") === "Brand#1")
    li.join(part, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity")).as("sum_qty"))
  }

  private def withConfs(confs: (String, String)*)(body: => Unit): Unit = {
    val prev = confs.map { case (k, _) =>
      k -> spark.conf.getOption(k)
    }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("InjectRuntimeFilter fires on the selective fact-dim shuffle join") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val plan = selectiveAlign().queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter_agg") ||
        plan.toLowerCase.contains("mightcontain"),
        s"expected a runtime bloom filter in the optimized plan:\n$plan")
    }
  }

  test("the runtime filter sits on the fact side, before the join") {
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val qe = selectiveAlign().queryExecution
      // The physical plan must evaluate might_contain in the scan
      // stage of the FACT side (a Filter over the lineitem relation),
      // not post-join: that is the row-drop-before-exchange property
      // the 100 TB posture wants.
      val phys = qe.executedPlan.toString
      val joinIdx = phys.indexOf("SortMergeJoin")
      val mcIdx = phys.toLowerCase.indexOf("might_contain")
      assert(joinIdx >= 0, s"expected a shuffle join:\n$phys")
      assert(mcIdx > joinIdx,
        s"expected might_contain below (printed after) the join:\n$phys")
      assert(phys.toLowerCase.contains("lineitem") ||
        phys.contains("l_partkey"),
        s"expected the filter on the fact side:\n$phys")
    }
  }

  test("pruning never changes answers") {
    def rows(bloom: Boolean): Seq[(String, Long)] = {
      withConfsResult(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.optimizer.runtime.bloomFilter.enabled" -> bloom.toString,
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
        selectiveAlign().collect()
          .map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
      }
    }
    val on = rows(bloom = true)
    val off = rows(bloom = false)
    assert(on === off && on.nonEmpty)
  }

  private def withConfsResult[T](confs: (String, String)*)(body: => T): T = {
    var out: Option[T] = None
    withConfs(confs: _*) { out = Some(body) }
    out.get
  }
}
