package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Decomposition probe for the dedupGroups (d07/p03/p14) eager loop
  * (optimization round r18). Measurement-only; nothing registered
  * changes. Splits the operator's bench cost into
  *   (a) pair generation (the edges localCheckpoint dedupGroups
  *       forces first),
  *   (b) the label-propagation loop itself, per round,
  * and A/B-compares the shipped 3-join round (propagate, least-with-
  * own, pointer-jump) against a 2-join round that folds the
  * least(own, nbrMin) join away by adding self-loop edges (x, x) —
  * min over the CLOSED neighborhood — checking the outputs are
  * row-identical before any rework ships.
  */
object GroupsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("GRAFT_PHASE_REPS", "3").toInt
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

    val docs = graft.Tables.documents(spark, sfDir)

    def time[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"GP: $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    def sumOf(labels: DataFrame): java.math.BigDecimal =
      Option(labels.agg(sum(col("lbl").cast("decimal(38,0)")))
        .head.getDecimal(0)).getOrElse(java.math.BigDecimal.ZERO)

    // shipped 3-join round
    def loopAsIs(edges: DataFrame): DataFrame = {
      var labels = time("  init labels") {
        edges.groupBy(col("src"))
          .agg(least(col("src"), min(col("dst"))).as("lbl"))
          .select(col("src").as("node"), col("lbl"))
          .localCheckpoint(true)
      }
      var prevSum = sumOf(labels)
      var converged = false
      var iter = 0
      while (!converged && iter < 16) {
        val jumped = time(f"  round $iter chk") {
          val nbrMin = edges.join(labels, edges("dst") === labels("node"))
            .groupBy(col("src")).agg(min(col("lbl")).as("nlbl"))
          val prop = labels.join(nbrMin, labels("node") === nbrMin("src"))
            .select(col("node"), least(col("lbl"), col("nlbl")).as("lbl"))
          prop.as("m").join(prop.as("p"), col("m.lbl") === col("p.node"))
            .select(col("m.node").as("node"), col("p.lbl").as("lbl"))
            .localCheckpoint(true)
        }
        val s = time(f"  round $iter sum") { sumOf(jumped) }
        converged = s.compareTo(prevSum) == 0
        prevSum = s
        labels = jumped
        iter += 1
      }
      println(s"GP:   rounds=$iter")
      labels
    }

    // candidate 2-join round: self-loops make the nbr-min CLOSED
    def loopSelfLoop(edgesNoSelf: DataFrame): DataFrame = {
      val edges = time("  self-loop edges chk") {
        edgesNoSelf.union(
          edgesNoSelf.select(col("src")).distinct()
            .select(col("src"), col("src").as("dst")))
          .localCheckpoint(true)
      }
      var labels = time("  init labels") {
        edges.groupBy(col("src")).agg(min(col("dst")).as("lbl"))
          .select(col("src").as("node"), col("lbl"))
          .localCheckpoint(true)
      }
      var prevSum = sumOf(labels)
      var converged = false
      var iter = 0
      while (!converged && iter < 16) {
        val jumped = time(f"  round $iter chk") {
          val prop = edges.join(labels, edges("dst") === labels("node"))
            .groupBy(col("src")).agg(min(col("lbl")).as("lbl"))
            .select(col("src").as("node"), col("lbl"))
          prop.as("m").join(prop.as("p"), col("m.lbl") === col("p.node"))
            .select(col("m.node").as("node"), col("p.lbl").as("lbl"))
            .localCheckpoint(true)
        }
        val s = time(f"  round $iter sum") { sumOf(jumped) }
        converged = s.compareTo(prevSum) == 0
        prevSum = s
        labels = jumped
        iter += 1
      }
      println(s"GP:   rounds=$iter")
      labels
    }

    // candidate union-fold round: closed-neighborhood min by UNIONING
    // the labels table into the propagate agg (no self-loop edges, no
    // least-join); the pointer jump is skipped on the round that
    // proves convergence (labels constant per component there, so
    // label(label) is the identity).
    def loopUnionFold(edges: DataFrame): DataFrame = {
      var labels = time("  init labels") {
        edges.groupBy(col("src"))
          .agg(least(col("src"), min(col("dst"))).as("lbl"))
          .select(col("src").as("node"), col("lbl"))
          .localCheckpoint(true)
      }
      var prevSum = sumOf(labels)
      var converged = false
      var iter = 0
      while (!converged && iter < 16) {
        val prop = time(f"  round $iter prop chk") {
          // the own-label arm re-aliases (fresh exprIds): a verbatim
          // `labels` here shares attributes with the join arm's inner
          // `labels`, which trips Union's constraint rewriting
          edges.join(labels, edges("dst") === labels("node"))
            .select(edges("src").as("node"), col("lbl"))
            .unionByName(labels.select(col("node").as("node"),
              col("lbl").as("lbl")))
            .groupBy(col("node")).agg(min(col("lbl")).as("lbl"))
            .localCheckpoint(true)
        }
        val s = time(f"  round $iter sum") { sumOf(prop) }
        if (s.compareTo(prevSum) == 0) {
          converged = true
          labels = prop
        } else {
          val jumped = time(f"  round $iter jump chk") {
            prop.as("m").join(prop.as("p"), col("m.lbl") === col("p.node"))
              .select(col("m.node").as("node"), col("p.lbl").as("lbl"))
              .localCheckpoint(true)
          }
          prevSum = time(f"  round $iter jsum") { sumOf(jumped) }
          labels = jumped
        }
        iter += 1
      }
      println(s"GP:   rounds=$iter")
      labels
    }

    // candidate lazy-self-loop round: self-loop arm is a PROJECTION
    // of the checkpointed init labels (one row per node — no distinct,
    // no extra materialization), unioned lazily into the edge list;
    // each round is then ONE closed-neighborhood join+agg plus the
    // pointer jump (2 joins, vs the shipped 3).
    def loopLazySelf(edgesNoSelf: DataFrame): DataFrame = {
      var labels = time("  init labels") {
        edgesNoSelf.groupBy(col("src"))
          .agg(least(col("src"), min(col("dst"))).as("lbl"))
          .select(col("src").as("node"), col("lbl"))
          .localCheckpoint(true)
      }
      val edges = edgesNoSelf.union(
        labels.select(col("node").as("src"), col("node").as("dst")))
      var prevSum = sumOf(labels)
      var converged = false
      var iter = 0
      while (!converged && iter < 16) {
        val jumped = time(f"  round $iter chk") {
          val prop = edges.join(labels, edges("dst") === labels("node"))
            .groupBy(edges("src")).agg(min(col("lbl")).as("lbl"))
            .select(col("src").as("node"), col("lbl"))
          prop.as("m").join(prop.as("p"), col("m.lbl") === col("p.node"))
            .select(col("m.node").as("node"), col("p.lbl").as("lbl"))
            .localCheckpoint(true)
        }
        val s = time(f"  round $iter sum") { sumOf(jumped) }
        converged = s.compareTo(prevSum) == 0
        prevSum = s
        labels = jumped
        iter += 1
      }
      println(s"GP:   rounds=$iter")
      labels
    }

    // the r18.2 shipped round: closedEdges materialized PRE-PARTITIONED
    // on dst (no edge-side exchange per round) + observe()-folded
    // convergence sum (one action per round, not two)
    def loopNew(edgesNoSelf: DataFrame): DataFrame = {
      var labels = time("  init labels") {
        edgesNoSelf.groupBy(col("src"))
          .agg(least(col("src"), min(col("dst"))).as("lbl"))
          .select(col("src").as("node"), col("lbl"))
          .localCheckpoint(true)
      }
      val edges = time("  closed-edges dst-part chk") {
        edgesNoSelf.union(
          labels.select(col("node").as("src"), col("node").as("dst")))
          .repartition(col("dst"))
          .localCheckpoint(true)
      }
      var prevSum = sumOf(labels)
      var converged = false
      var iter = 0
      while (!converged && iter < 16) {
        val obs = new org.apache.spark.sql.Observation()
        val jumped = time(f"  round $iter chk+sum") {
          val prop = edges.join(labels, edges("dst") === labels("node"))
            .groupBy(edges("src")).agg(min(col("lbl")).as("lbl"))
            .select(col("src").as("node"), col("lbl"))
          prop.as("m").join(prop.as("p"), col("m.lbl") === col("p.node"))
            .select(col("m.node").as("node"), col("p.lbl").as("lbl"))
            .observe(obs, sum(col("lbl").cast("decimal(38,0)")).as("s"))
            .localCheckpoint(true)
        }
        val s = Option(obs.get("s").asInstanceOf[java.math.BigDecimal])
          .getOrElse(java.math.BigDecimal.ZERO)
        converged = s.compareTo(prevSum) == 0
        prevSum = s
        labels = jumped
        iter += 1
      }
      println(s"GP:   rounds=$iter")
      labels
    }

    (0 until reps).foreach { r =>
      println(s"GP: === rep $r ===")
      val pairs = time("pairs localCheckpoint (pair gen)") {
        graft.operators.Dedup.ngramJaccard(docs).localCheckpoint(true)
      }
      val edges = time("edges sym chk") {
        pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
          .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
          .localCheckpoint(true)
      }
      println("GP: -- as-is loop --")
      val a = time("loop total (as-is)") { loopAsIs(edges) }
      println("GP: -- self-loop variant --")
      val b = time("loop total (self-loop)") { loopSelfLoop(edges) }
      println("GP: -- lazy-self-loop variant --")
      val c = time("loop total (lazy-self)") { loopLazySelf(edges) }
      println("GP: -- r18.2 shipped (dst-part + observe) --")
      val d = time("loop total (new)") { loopNew(edges) }
      def diffOf(x: DataFrame, y: DataFrame): Long =
        x.select(col("node"), col("lbl"))
          .exceptAll(y.select(col("node"), col("lbl"))).count() +
          y.select(col("node"), col("lbl"))
            .exceptAll(x.select(col("node"), col("lbl"))).count()
      println(s"GP: diff(asis,selfloop)=${diffOf(a, b)} " +
        s"diff(asis,unionfold)=${diffOf(a, c)} " +
        s"diff(asis,new)=${diffOf(a, d)} (must be 0); " +
        s"nodes=${a.count()}")

      // multi-round equivalence on a planted deep graph: a 2048-node
      // path (diameter 2047 forces ~10 pointer-jump rounds) plus a
      // reversed-id star, so convergence takes several rounds in both
      // variants and the jump path is exercised, not just round 0.
      if (r == 0) {
        import spark.implicits._
        val chain = (0L until 2047L).map(i => (i, i + 1)) ++
          (1L to 64L).map(i => (5000L - i, 5000L))
        val cp = chain.toDF("doc_a", "doc_b")
        val ce = cp.select(col("doc_a").as("src"), col("doc_b").as("dst"))
          .union(cp.select(col("doc_b").as("src"), col("doc_a").as("dst")))
          .localCheckpoint(true)
        println("GP: -- planted chain: as-is --")
        val ca = loopAsIs(ce)
        println("GP: -- planted chain: lazy-self-loop --")
        val cc = loopLazySelf(ce)
        println("GP: -- planted chain: r18.2 shipped --")
        val cd = loopNew(ce)
        println(s"GP: chain diff(asis,unionfold)=${diffOf(ca, cc)} " +
          s"diff(asis,new)=${diffOf(ca, cd)} " +
          s"(must be 0); nodes=${ca.count()}")
      }
    }
  }
}
