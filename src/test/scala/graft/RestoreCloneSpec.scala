package graft

import java.nio.file.{Files, Paths}
import java.security.MessageDigest
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{PartitionUpsert, TimeTravel}

/** k21_restore + k22_shallow_clone — the manifest-pointer half of the
  * catalog lifecycle: rollback must be METADATA-ONLY, a clone must be
  * ZERO-COPY, and neither may ever touch bytes it does not own.
  */
class RestoreCloneSpec extends AnyFunSuite {
  import TestSpark._

  /** Relative path -> md5 of content for every parquet DATA file
    * under `dir` (manifests under meta/ excluded — those are the
    * pointers being exercised).
    */
  private def dataDigests(dir: String): Map[String, String] = {
    val root = Paths.get(dir)
    if (!Files.exists(root)) Map.empty
    else Files.walk(root).iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet") &&
        !root.relativize(p).toString.startsWith("meta/"))
      .map { p =>
        val md = MessageDigest.getInstance("MD5")
        root.relativize(p).toString ->
          md.digest(Files.readAllBytes(p)).map("%02x".format(_)).mkString
      }.toMap
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.select(col("doc_id"), col("source"), col("text"), col("lang"))
      .collect().map(_.toSeq).toSet

  test("k21: restore is metadata-only and reads as the restored version") {
    val docs = Tables.documents(spark, sf)
    val dir = graft.Staging.dir("graft_k21spec_")
    TimeTravel.stageBase(docs, dir)
    TimeTravel.commitChanges(docs, dir)
    val v1Rows = rows(TimeTravel.readAt(spark, dir, 1))
    val v2Rows = rows(TimeTravel.readAt(spark, dir, 2))
    val dataBefore = dataDigests(dir)
    val v = TimeTravel.restore(spark, dir, 1)
    assert(v === 3)
    // zero data files written, read-modified, or deleted
    assert(dataDigests(dir) === dataBefore,
      "restore must not touch a single data file")
    // the restore reads as the pre-image; the bad commit stays
    // readable for a post-mortem
    assert(rows(TimeTravel.readAt(spark, dir, 3)) === v1Rows)
    assert(rows(TimeTravel.readAt(spark, dir, 2)) === v2Rows)
    // restoring to a version that does not exist is refused
    intercept[IllegalArgumentException] {
      TimeTravel.restore(spark, dir, 99)
    }
  }

  test("k21: restore composes with expire — the bad commit is vacuumed, the restored read survives byte-identical") {
    val docs = Tables.documents(spark, sf)
    val dir = graft.Staging.dir("graft_k21exp_")
    TimeTravel.stageBase(docs, dir)
    TimeTravel.commitChanges(docs, dir)
    TimeTravel.restore(spark, dir, 1)
    val v3Rows = rows(TimeTravel.readAt(spark, dir, 3))
    val c1Before = dataDigests(dir).filter(_._1.startsWith("c1/"))
    TimeTravel.expire(spark, dir, retainFrom = 3)
    // only v3 retained; it references ONLY c1, so the bad commit's
    // tree is reclaimed wholesale and c1 survives untouched
    assert(!Files.exists(Paths.get(s"$dir/c2")),
      "the rolled-back commit's tree must be vacuumed")
    assert(dataDigests(dir).filter(_._1.startsWith("c1/")) === c1Before,
      "the restored version's files must survive the vacuum untouched")
    assert(rows(TimeTravel.readAt(spark, dir, 3)) === v3Rows)
  }

  test("k22: clone is zero-copy; divergence lands locally; the source never moves") {
    val docs = Tables.documents(spark, sf)
    val src = graft.Staging.dir("graft_k22src_")
    TimeTravel.stageBase(docs, src)
    TimeTravel.commitChanges(docs, src)
    val srcV2 = rows(TimeTravel.readAt(spark, src, 2))
    val srcBytes = dataDigests(src)
    val dst = graft.Staging.dir("graft_k22dst_")
    TimeTravel.cloneAt(spark, src, dst, 2)
    // ZERO-COPY: the clone holds no data files at all, yet reads the
    // source's v2 row-for-row through its own manifest
    assert(dataDigests(dst).isEmpty, "a shallow clone copies no data")
    assert(rows(TimeTravel.readAt(spark, dst, 1)) === srcV2)
    // diverge the clone
    TimeTravel.commitVersion(spark, dst,
      TimeTravel.cloneChangelog(TimeTravel.readAt(spark, dst, 1)), "c1")
    val cloneV2 = rows(TimeTravel.readAt(spark, dst, 2))
    assert(cloneV2 !== srcV2, "the divergent commit must change the clone")
    assert(cloneV2.exists(_(2).toString.endsWith(" v3")),
      "divergent upserts must be visible at the clone head")
    // the source is untouched by the clone's whole life — bytes AND
    // read-back
    assert(dataDigests(src) === srcBytes,
      "the clone's commits must never touch source files")
    assert(rows(TimeTravel.readAt(spark, src, 2)) === srcV2)
    assert(!srcV2.exists(_(2).toString.endsWith(" v3")),
      "no ' v3' text may leak into the source")
    // the clone's local tree holds ONLY the changed partitions
    val localLangs = dataDigests(dst).keys
      .flatMap(_.split("/").find(_.startsWith("lang="))).toSet
    val expected = (TimeTravel.CloneLangs.map("lang=" + _) :+
      ("lang=" + "__HIVE_DEFAULT_PARTITION__")).toSet
    assert(localLangs.subsetOf(expected),
      s"clone may only materialize its changed partitions, got $localLangs")
  }

  test("k22: the clone's expire vacuums only LOCAL trees — source files are never candidates") {
    val docs = Tables.documents(spark, sf)
    val src = graft.Staging.dir("graft_k22vsrc_")
    TimeTravel.stageBase(docs, src)
    TimeTravel.commitChanges(docs, src)
    val srcBytes = dataDigests(src)
    val dst = graft.Staging.dir("graft_k22vdst_")
    TimeTravel.cloneAt(spark, src, dst, 2)
    TimeTravel.commitVersion(spark, dst,
      TimeTravel.cloneChangelog(TimeTravel.readAt(spark, dst, 1)), "c1")
    val headRows = rows(TimeTravel.readAt(spark, dst, 2))
    TimeTravel.expire(spark, dst, retainFrom = 2)
    assert(!Files.exists(Paths.get(s"$dst/meta/v1")))
    // source bytes intact even though the clone's v1 referenced them
    // and was just expired
    assert(dataDigests(src) === srcBytes,
      "a clone's expire must never delete source-owned files")
    assert(rows(TimeTravel.readAt(spark, dst, 2)) === headRows)
  }

  test("k21/k22: registered queries match their in-engine recomputation") {
    val k21 = SparkEntry.queries("k21_restore")(spark, sf)
    val byVersion = k21.collect()
      .groupBy(_.getAs[Long]("version"))
      .view.mapValues(_.map(r => (r.getAs[String]("lang"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("key_checksum"),
        r.getAs[Long]("chars_checksum"), r.getAs[Long]("n_upserted")))
        .toSet).toMap
    assert(byVersion.keySet === Set(1L, 2L, 3L))
    assert(byVersion(3L) === byVersion(1L),
      "the restore must summarize identically to the pre-image")
    assert(byVersion(2L) !== byVersion(1L))
    val k22 = SparkEntry.queries("k22_shallow_clone")(spark, sf)
    val bySide = k22.collect().groupBy(_.getAs[String]("side"))
    assert(bySide.keySet === Set("src", "clone"))
    assert(bySide("src").map(_.getAs[Long]("n_v3")).sum === 0L,
      "the source head must contain no divergent rows")
    assert(bySide("clone").map(_.getAs[Long]("n_v3")).sum > 0L,
      "the clone head must contain the divergent upserts")
  }
}
