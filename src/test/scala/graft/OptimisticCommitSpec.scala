package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{OptimisticCommit, PartitionUpsert, TimeTravel}
import graft.sources.TimeTravel.ManifestRow

/** k23_concurrent_commit — optimistic concurrency for the versioned
  * catalog: genuinely concurrent writers, CAS claims, rebase on
  * disjoint partitions, re-merge on overlap; the serialized result
  * must equal the serial application (which is commutative for the
  * disjoint and disjoint-key demos, so the assertion is exact).
  */
class OptimisticCommitSpec extends AnyFunSuite {
  import TestSpark._

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.select(col("doc_id"), col("source"), col("text"), col("lang"))
      .collect().map(_.toSeq).toSet

  private def concurrently(dir: String,
      a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Seq[Int] = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val fa = scala.concurrent.Future(
      OptimisticCommit.commitOptimistic(spark, dir, a, writerId = 1))
    val fb = scala.concurrent.Future(
      OptimisticCommit.commitOptimistic(spark, dir, b, writerId = 2))
    import scala.concurrent.duration._
    val got = scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(Seq(fa, fb)), 10.minutes)
    pool.shutdown()
    got
  }

  test("k23: concurrent disjoint-partition writers serialize to the serial result") {
    val docs = Tables.documents(spark, sf)
    val base = PartitionUpsert.demoBase(docs).localCheckpoint(true)
    // concurrent run
    val dir = graft.Staging.dir("graft_k23spec_")
    TimeTravel.stageBase(docs, dir)
    val versions = concurrently(dir,
      OptimisticCommit.changelogA(base), OptimisticCommit.changelogB(base))
    assert(versions.toSet === Set(2, 3),
      "both writers must land, at consecutive versions")
    // both CAS claims must exist — publication went through the lock
    assert(Files.exists(Paths.get(s"$dir/meta/_claim_v2")))
    assert(Files.exists(Paths.get(s"$dir/meta/_claim_v3")))
    // serial control: same changelogs through the plain commit path
    val ctl = graft.Staging.dir("graft_k23ctl_")
    TimeTravel.stageBase(docs, ctl)
    TimeTravel.commitVersion(spark, ctl,
      OptimisticCommit.changelogA(base), "a")
    TimeTravel.commitVersion(spark, ctl,
      OptimisticCommit.changelogB(base), "b")
    assert(rows(TimeTravel.readAt(spark, dir, 3)) ===
      rows(TimeTravel.readAt(spark, ctl, 3)),
      "the serialized concurrent head must equal the serial result")
    // the NULL partition was contended by writer A and survived
    assert(rows(TimeTravel.readAt(spark, dir, 3)).exists(_.last == null))
  }

  test("k23: overlapping-partition writers conflict, re-merge, and still converge") {
    val docs = Tables.documents(spark, sf)
    val base = PartitionUpsert.demoBase(docs).localCheckpoint(true)
    // both writers hit lang=en with DISJOINT keys — a rebase is
    // unsafe (same partition), so the loser must re-merge; disjoint
    // keys keep the converged state order-invariant and assertable
    def up(rem: Long, suffix: String) = {
      val changed = base.filter(col("lang") === "en" &&
        pmod(col("doc_id"), lit(5L)) === rem)
      changed.select(col("doc_id"), col("lang"), lit(1L).as("seq"),
        lit("upsert").as("op"),
        concat(col("text"), lit(suffix)).as("new_text"))
    }
    val dir = graft.Staging.dir("graft_k23ovl_")
    TimeTravel.stageBase(docs, dir)
    val versions = concurrently(dir, up(3L, " vC"), up(4L, " vD"))
    assert(versions.toSet === Set(2, 3))
    val head = rows(TimeTravel.readAt(spark, dir, 3))
    val ctl = graft.Staging.dir("graft_k23octl_")
    TimeTravel.stageBase(docs, ctl)
    TimeTravel.commitVersion(spark, ctl, up(3L, " vC"), "c")
    TimeTravel.commitVersion(spark, ctl, up(4L, " vD"), "d")
    assert(head === rows(TimeTravel.readAt(spark, ctl, 3)),
      "conflict handling must not lose either writer's update")
    assert(head.exists(_(2).toString.endsWith(" vC")))
    assert(head.exists(_(2).toString.endsWith(" vD")))
  }

  test("k23: changedLangs diffs manifests null-safely") {
    val prev = Seq(ManifestRow("en", "c1", null),
      ManifestRow(null, "c1", null), ManifestRow("de", "c1", null))
    val next = Seq(ManifestRow("en", "c2", null),
      ManifestRow(null, "c1", null))
    // en moved, de dropped, NULL unchanged
    assert(OptimisticCommit.changedLangs(prev, next) === Set("en", "de"))
    // a base change (clone repoint) is a change even at equal names
    val repointed = Seq(ManifestRow("en", "c1", "/elsewhere"),
      ManifestRow(null, "c1", null), ManifestRow("de", "c1", null))
    assert(OptimisticCommit.changedLangs(prev, repointed) === Set("en"))
  }

  test("k23: registered query equals the relational both-applied state") {
    val out = SparkEntry.queries("k23_concurrent_commit")(spark, sf)
      .collect()
    val byLang = out.map(r => r.getAs[String]("lang") ->
      (r.getAs[Long]("n_docs"), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"))).toMap
    assert(byLang.contains("en") && byLang.contains("de"))
    assert(byLang("en")._2 > 0L, "writer A's upserts must be visible")
    assert(byLang("de")._3 > 0L, "writer B's upserts must be visible")
    assert(byLang("de")._2 === 0L && byLang("en")._3 === 0L,
      "writers stay confined to their own partitions")
    // the NULL partition (writer A's second slice) came through
    assert(out.exists(r => r.getAs[String]("lang") == null &&
      r.getAs[Long]("n_a") > 0L))
  }
}
