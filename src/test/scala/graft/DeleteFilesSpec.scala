package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.DeleteFiles

class DeleteFilesSpec extends AnyFunSuite {
  import TestSpark._

  private def key(r: org.apache.spark.sql.Row): String =
    r.toSeq.map(String.valueOf).mkString("|")

  test("k25: merge-on-read equals base minus the delete keys") {
    val docs = Tables.documents(spark, sf)
    val root = DeleteFiles.stage(docs, cacheKey = sf)
    val got = DeleteFiles.mergeOnRead(spark, root).collect().map(key).sorted
    val want = docs
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .filter(col("doc_id").isNull ||
        !(pmod(col("doc_id"), lit(97L)) === 11L ||
          pmod(col("doc_id"), lit(101L)) === 13L))
      .collect().map(key).sorted
    assert(got.nonEmpty)
    assert(got.length < docs.count()) // the deletes actually deleted
    assert(got.toSeq === want.toSeq)
  }

  test("k25: the delete side broadcasts — no base-side shuffle") {
    val docs = Tables.documents(spark, sf)
    val root = DeleteFiles.stage(docs, cacheKey = sf)
    val plan = DeleteFiles.mergeOnRead(spark, root)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"merge-on-read must anti-join against a broadcast delete set:\n$plan")
  }

  test("k25: a NULL-key base row matches no delete and survives") {
    // the k12 lesson as a design-time contract: anti-join null
    // semantics keep the NULL row through EVERY delete commit
    import spark.implicits._
    val base = Seq(
      (Option(11L), "en", "web", 10L), // doc_id%97=11 -> deleted by d1
      (Option(13L), "en", "web", 10L), // doc_id%101=13 -> deleted by d2
      (Option(5L), "de", "web", 10L),
      (Option.empty[Long], "en", "web", 10L))
      .toDF("doc_id", "lang", "source", "n_chars")
    val root = DeleteFiles.stage(base) // no cacheKey: fresh tree
    val got = DeleteFiles.mergeOnRead(spark, root)
      .select(col("doc_id")).collect().map(r =>
        if (r.isNullAt(0)) "null" else r.getLong(0).toString).sorted
    assert(got.toSeq === Seq("5", "null"))
  }

  test("k25: purge lands an equal generation with an empty delete set") {
    val docs = Tables.documents(spark, sf)
    val root = DeleteFiles.stage(docs, cacheKey = sf)
    val before = DeleteFiles.mergeOnRead(spark, root)
      .collect().map(key).sorted
    val gen = DeleteFiles.purge(spark, root)
    // the new generation carries no delete debt...
    assert(DeleteFiles.readDeletes(spark, gen).count() === 0L)
    // ...and reads byte-identically, with and without the anti-join
    val after = DeleteFiles.mergeOnRead(spark, gen)
      .collect().map(key).sorted
    val raw = DeleteFiles.readBase(spark, gen).collect().map(key).sorted
    assert(after.toSeq === before.toSeq)
    assert(raw.toSeq === before.toSeq)
  }

  test("k25: a delete commit AFTER purge composes on the new generation") {
    val docs = Tables.documents(spark, sf)
    val root = DeleteFiles.stage(docs, cacheKey = sf)
    val gen = DeleteFiles.purge(spark, root)
    DeleteFiles.commitDelete(
      DeleteFiles.readBase(spark, gen)
        .filter(pmod(col("doc_id"), lit(103L)) === 7L),
      s"$gen/_deletes/d1")
    val got = DeleteFiles.mergeOnRead(spark, gen).count()
    val want = DeleteFiles.readBase(spark, gen)
      .filter(col("doc_id").isNull ||
        !(pmod(col("doc_id"), lit(103L)) === 7L))
      .count()
    assert(got === want && got < DeleteFiles.readBase(spark, gen).count())
  }
}
