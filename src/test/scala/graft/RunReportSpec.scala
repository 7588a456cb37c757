package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pipeline

/** q39: the rendered completion report must stay an exact VIEW of
  * q37's decisions — counts reconcile, heads are the sorted bounded
  * prefix of each verdict's roster, and the body is a pure rendering
  * of the row's own fields (no independent computation that could
  * drift from what the gate decided).
  */
class RunReportSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val customer = Tables.customer(spark, sf)
  private lazy val orders = Tables.orders(spark, sf)
  private lazy val report =
    Pipeline.runReport(customer, orders).cache()

  test("q39: one row per market segment, counts reconcile") {
    val segs = customer.select("c_mktsegment").distinct().count()
    assert(report.count() == segs)
    report.collect().foreach { r =>
      assert(r.getAs[Long]("n_completed") + r.getAs[Long]("n_failed")
        == r.getAs[Long]("n_samples"))
    }
  }

  test("q39: counts equal the gate's verdicts per segment") {
    val gate = Pipeline.qcGate(customer, orders)
      .join(customer.select(col("c_custkey").as("ck"),
        col("c_mktsegment")), col("c_custkey") === col("ck"))
      .groupBy("c_mktsegment")
      .agg(sum("qc_pass").cast("long").as("pass"),
        count(lit(1)).cast("long").as("n"))
      .collect()
      .map(r => r.getAs[String]("c_mktsegment") ->
        (r.getAs[Long]("pass"), r.getAs[Long]("n")))
      .toMap
    report.collect().foreach { r =>
      val (pass, n) = gate(r.getAs[String]("c_mktsegment"))
      assert(r.getAs[Long]("n_completed") == pass)
      assert(r.getAs[Long]("n_samples") == n)
    }
  }

  test("q39: heads are the sorted bounded prefix of each roster") {
    val gate = Pipeline.qcGate(customer, orders)
      .join(customer.select(col("c_custkey").as("ck"),
        col("c_mktsegment")), col("c_custkey") === col("ck"))
      .select("c_mktsegment", "c_custkey", "qc_pass").collect()
    val bySeg = gate.groupBy(_.getAs[String]("c_mktsegment"))
    report.collect().foreach { r =>
      val seg = r.getAs[String]("c_mktsegment")
      def expectHead(pass: Int): String =
        bySeg(seg).filter(_.getAs[Int]("qc_pass") == pass)
          .map(_.getAs[Long]("c_custkey")).sorted.take(10)
          .mkString(" ")
      assert(r.getAs[String]("completed_head") == expectHead(1),
        s"$seg completed head")
      assert(r.getAs[String]("failed_head") == expectHead(0),
        s"$seg failed head")
    }
  }

  test("q39: body is a pure rendering of the row's fields") {
    report.collect().foreach { r =>
      val expected = s"processed ${r.getAs[Long]("n_completed")}/" +
        s"${r.getAs[Long]("n_samples")} | completed(head): " +
        s"[${r.getAs[String]("completed_head")}] | failed(head): " +
        s"[${r.getAs[String]("failed_head")}]"
      assert(r.getAs[String]("body") == expected)
    }
  }
}
