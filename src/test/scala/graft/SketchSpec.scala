package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SchkTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.MisraGriesOps
import graft.operators.{Dedup, TextAnalysis}

/** Round-11 sketch family: q43 heavy hitters (Misra–Gries candidates
  * + exact recount), d14 snapshot-overlap estimation (HLL
  * inclusion–exclusion), and the MG kernel's guarantees under
  * ScalaCheck — the properties run the EXACT code the executor runs
  * (MisraGriesOps is shared by the aggregate's update/merge paths).
  */
class SketchSpec extends AnyFunSuite {
  import TestSpark._

  private def check(name: String, prop: Prop, n: Int = 200): Unit = {
    val res = SchkTest.check(
      SchkTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"$name: $res")
  }

  // ---- MG kernel properties ----------------------------------------

  /** Skewed stream gen: a small hot vocabulary + a long random tail,
    * shuffled — the shape heavy-hitter monitoring exists for.
    */
  private val streamGen: Gen[List[String]] = for {
    hotN <- Gen.choose(1, 5)
    hotRep <- Gen.choose(10, 80)
    tail <- Gen.listOfN(200, Gen.choose(0, 5000).map(i => s"t$i"))
    hot = (0 until hotN).flatMap(h => List.fill(hotRep)(s"hot$h")).toList
    mixed <- Gen.const(scala.util.Random.shuffle(hot ++ tail))
  } yield mixed

  private def runMg(items: Seq[String], k: Int): MisraGriesOps.Buf = {
    val buf = scala.collection.mutable.HashMap.empty[String, Long]
    items.foreach(MisraGriesOps.update(buf, _, k))
    buf
  }

  private def trueHeavy(items: Seq[String], k: Int): Set[String] = {
    val n = items.size
    items.groupBy(identity).collect {
      case (item, occ) if occ.size.toLong * (k + 1) > n => item
    }.toSet
  }

  test("MG superset guarantee: every item with count > n/(k+1) survives") {
    check("mg-superset", Prop.forAll(streamGen, Gen.choose(8, 64)) {
      (items, k) =>
        val cand = runMg(items, k).keySet
        trueHeavy(items, k).subsetOf(cand)
    })
  }

  test("MG estimate bound: true - est <= n/(k+1), est never over") {
    check("mg-bound", Prop.forAll(streamGen, Gen.choose(8, 64)) {
      (items, k) =>
      val buf = runMg(items, k)
      val counts = items.groupBy(identity).map { case (i, o) =>
        (i, o.size.toLong) }
      buf.forall { case (item, est) =>
        val t = counts(item)
        est <= t && t - est <= items.size.toLong / (k + 1)
      }
    })
  }

  test("MG mergeability: arbitrary split+merge keeps the superset") {
    check("mg-merge", Prop.forAll(streamGen, Gen.choose(8, 32),
      Gen.choose(1, 6)) { (items, k, parts) =>
      val chunks = if (items.isEmpty) List(items)
        else items.grouped(math.max(1, items.size / parts)).toList
      val merged = chunks.map(runMg(_, k))
        .reduce((a, b) => MisraGriesOps.merge(a, b, k))
      merged.size <= k && trueHeavy(items, k).subsetOf(merged.keySet)
    })
  }

  // ---- q43: sketch+recount ≡ exact (the oracle-checkability claim) --

  /** The exact answer computed the way q43's DuckDB oracle does —
    * plain explode → count → HAVING, no sketch anywhere.
    */
  private def exactHeavy(denom: Int) = {
    val toks = Tables.documents(spark, sf)
      .filter(col("text").isNotNull)
      .select(col("lang"),
        explode(split(lower(trim(col("text"))), "\\s+")).as("token"))
      .filter(col("token") =!= "")
    val tot = toks.groupBy(col("lang")).agg(count(lit(1)).as("n_total"))
    toks.groupBy(col("lang"), col("token")).agg(count(lit(1)).as("n_occ"))
      .join(tot, Seq("lang"))
      .filter(col("n_occ") * denom > col("n_total"))
      .select(col("lang"), col("token"), col("n_occ"))
  }

  test("q43 equals the plain exact groupBy-HAVING answer (sf0.001)") {
    val got = SparkEntry.queries("q43_heavy_hitters")(spark, sf)
      .select(col("lang"), col("token"), col("n_occ"))
    val want = exactHeavy(32)
    assert(got.count() > 0)
    assert(got.exceptAll(want).count() === 0)
    assert(want.exceptAll(got).count() === 0)
  }

  test("q43 plan: MG partials in ObjectHashAggregate, broadcast recount") {
    val plan = SparkEntry.queries("q43_heavy_hitters")(spark, sf)
      .queryExecution.executedPlan.toString
    // TypedImperativeAggregate runs in ObjectHashAggregate with a
    // partial_misra_gries map side — the k-entry-buffers-only
    // exchange the operator exists for — and the candidate recount
    // joins broadcast, never shuffling the token stream by key.
    assert(plan.contains("ObjectHashAggregate"))
    assert(plan.contains("misra_gries"))
    assert(plan.contains("BroadcastHashJoin"))
  }

  test("q43 on planted skew: hot tokens found with exact counts") {
    import spark.implicits._
    val docs = ((0 until 50).map(i => (i.toLong, "en",
      "spam " * 20 + s"unique$i noise$i")) ++
      (50 until 60).map(i => (i.toLong, "de", s"w$i x$i y$i z$i")))
      .toDF("doc_id", "lang", "text")
    val out = TextAnalysis.heavyHitterTokens(docs, shareDenom = 4, k = 8)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2))).toSet
    // en: 1000 'spam' of 1100 tokens (share .909 > 1/4); every other
    // en token appears once. de: each token 1/40 of its stratum.
    assert(out.contains(("en", "spam", 1000L)))
    assert(out.count(_._1 == "en") === 1)
    assert(out.count(_._1 == "de") === 0)
  }

  // ---- d14: estimates vs the exact overlap ------------------------

  test("d14 estimates track the exact snapshot overlap (sf0.001)") {
    val docs = Tables.documents(spark, sf)
    val r = SparkEntry.queries("d14_snapshot_overlap")(spark, sf)
      .collect().head
    // exact sides, replaying the demo's derivation arithmetic
    val nOld = docs.filter("doc_id % 11 != 3").count()
    val nNew = docs.filter("doc_id % 13 != 5").count()
    // common = docs in both cuts and NOT re-edited (content equal)
    val nCommon = docs
      .filter("doc_id % 11 != 3 AND doc_id % 13 != 5 AND doc_id % 7 != 0")
      .count()
    val nUnion = nOld + nNew - nCommon
    // Error budgets propagate: a DIRECT estimate carries z·rsd·n; the
    // derived quantities are sums/differences of sketches, so their
    // bounds ADD (est_common combines three sketches, est_only_* two).
    // z = 3 keeps the gate about gross regressions (wrong key, wrong
    // side filter — O(n) errors), not sketch noise.
    val rsd = 0.02
    def within(est: Long, exact: Long, budget: Long, tag: String): Unit = {
      val slack = math.max(3.0, 3 * rsd * budget)
      assert(math.abs(est - exact) <= slack,
        s"$tag: est=$est exact=$exact slack=$slack")
    }
    within(r.getAs[Long]("est_old"), nOld, nOld, "est_old")
    within(r.getAs[Long]("est_new"), nNew, nNew, "est_new")
    within(r.getAs[Long]("est_union"), nUnion, nUnion, "est_union")
    within(r.getAs[Long]("est_common"), nCommon,
      nOld + nNew + nUnion, "est_common")
    within(r.getAs[Long]("est_only_old"), nOld - nCommon,
      nUnion + nNew, "est_only_old")
    within(r.getAs[Long]("est_only_new"), nNew - nCommon,
      nUnion + nOld, "est_only_new")
  }

  test("d14 on empty snapshots: zero estimates, no errors") {
    val empty = Tables.documents(spark, sf).filter("doc_id < 0")
    val r = Dedup.snapshotOverlap(empty, empty).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("est_union") === 0L)
  }
}
