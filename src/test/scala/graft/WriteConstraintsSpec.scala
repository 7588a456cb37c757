package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.WriteConstraints
import graft.sources.WriteConstraints.Rule

class WriteConstraintsSpec extends AnyFunSuite {
  import TestSpark._

  test("k27: table ∪ quarantine conserves the landing slice exactly") {
    val docs = Tables.documents(spark, sf)
    val root = WriteConstraints.land(docs, cacheKey = sf)
    val table = WriteConstraints.readTable(spark, root)
    val quarantined = WriteConstraints.readQuarantine(spark, root)
      .select("doc_id").distinct()
    assert(table.count() + quarantined.count() === docs.count())
    // nothing admitted violates, everything quarantined does
    assert(table.filter(col("n_chars") < 100 ||
      col("doc_id").isNull).count() === 0L)
    assert(quarantined.count() > 0, "the corpus must exercise the gate")
  }

  test("k27: a row breaking two rules is evidenced under both") {
    import spark.implicits._
    val rows = Seq(
      (Option(1L), "en", "web", Option(5L)),    // breaks min_len only
      (Option.empty[Long], "en", "web", Option(5L)), // breaks both
      (Option(3L), "en", "web", Option(500L)))  // clean
      .toDF("doc_id", "lang", "source", "n_chars")
    val root = WriteConstraints.land(rows, maxRejectPermille = 1000)
    val q = WriteConstraints.readQuarantine(spark, root)
      .select(col("doc_id"), col("rule")).collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0), r.getString(1)))
      .sortBy(t => (t._1, t._2))
    assert(q.toSeq === Seq((-1L, "id_known"), (-1L, "min_len"),
      (1L, "min_len")))
    assert(WriteConstraints.readTable(spark, root).count() === 1L)
  }

  test("k27: NULL rule evaluation is a violation, never a pass") {
    import spark.implicits._
    val rows = Seq((Option(1L), "en", "web", Option.empty[Long]))
      .toDF("doc_id", "lang", "source", "n_chars")
    // n_chars NULL: `n_chars >= 100` evaluates NULL — must quarantine
    val root = WriteConstraints.land(rows, maxRejectPermille = 1000)
    assert(WriteConstraints.readTable(spark, root).count() === 0L)
    assert(WriteConstraints.readQuarantine(spark, root)
      .filter(col("rule") === "min_len").count() === 1L)
  }

  test("k27: a feed over tolerance REFUSES the commit, landing nothing") {
    import spark.implicits._
    val rows = Seq(
      (Option(1L), "en", "web", Option(5L)),
      (Option(2L), "en", "web", Option(500L)))
      .toDF("doc_id", "lang", "source", "n_chars")
    // 50% violations against a 10% tolerance
    val e = intercept[IllegalArgumentException] {
      WriteConstraints.land(rows, maxRejectPermille = 100)
    }
    assert(e.getMessage.contains("REFUSED"))
  }

  test("k27: rules are data — a custom rule set dispatches") {
    import spark.implicits._
    val rows = Seq(
      (Option(1L), "en", "web", Option(500L)),
      (Option(2L), null: String, "web", Option(500L)))
      .toDF("doc_id", "lang", "source", "n_chars")
    val root = WriteConstraints.land(rows, maxRejectPermille = 1000,
      rules = Seq(Rule("lang_known", "lang IS NOT NULL")))
    assert(WriteConstraints.readTable(spark, root).count() === 1L)
    assert(WriteConstraints.readQuarantine(spark, root)
      .select("rule").collect().map(_.getString(0)).toSeq ===
      Seq("lang_known"))
  }
}
