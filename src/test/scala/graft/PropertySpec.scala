package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SchkTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Asof, Dedup, Relational}

/** Generative correctness: the newest relational/graph operators
  * checked against independent in-memory reference implementations
  * over random inputs — the cases a planted fixture can't enumerate
  * (random tie patterns, chains of upserts/deletes, odd component
  * shapes). Few iterations per property (each runs a Spark job), but
  * each iteration covers hundreds of random rows.
  */
class PropertySpec extends AnyFunSuite {
  import TestSpark._

  private def check(name: String, prop: Prop, n: Int = 8): Unit = {
    val res = SchkTest.check(
      SchkTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, s"$name: $res")
  }

  test("q28 property: merge equals an in-memory replay of the changelog") {
    import spark.implicits._
    val genChange = for {
      key <- Gen.choose(0L, 30L)
      seq <- Gen.choose(1L, 5L)
      op <- Gen.oneOf("upsert", "delete")
      payload <- Gen.alphaStr.map(_.take(8))
    } yield (key, seq, op, if (op == "delete") null else payload)
    val genCase = for {
      baseKeys <- Gen.listOfN(20, Gen.choose(0L, 30L)).map(_.distinct)
      changes <- Gen.listOfN(40, genChange)
    } yield (baseKeys, changes)
    check("q28", Prop.forAll(genCase) { case (baseKeys, changes) =>
      // dedupe (key, seq) collisions: a real changelog has unique
      // sequence numbers per key
      val log = changes.groupBy(c => (c._1, c._2)).map(_._2.head).toSeq
      val base = baseKeys.map(k => (k, s"base$k")).toDF("doc_id", "text")
      val out = Relational.changelogMerge(base,
        log.toDF("doc_id", "seq", "op", "new_text"))
        .collect()
        .map(r => r.getLong(0) -> (r.getString(1),
          Option(r.get(2)).map(_.asInstanceOf[Long]))).toMap
      // reference: replay per key in seq order over a map
      val expected = {
        val m = scala.collection.mutable.Map[Long, (String, Option[Long])]()
        baseKeys.foreach(k => m(k) = ("base", Some(s"base$k".length.toLong)))
        log.groupBy(_._1).foreach { case (k, cs) =>
          cs.maxBy(_._2) match {
            case (_, _, "delete", _) => m.remove(k)
            case (_, _, "upsert", p) =>
              m(k) = ("upsert", Option(p).map(_.length.toLong))
            case _ =>
          }
        }
        m.toMap
      }
      out == expected
    }, n = 6)
  }

  test("q25 property: as-of join equals per-row brute force") {
    import spark.implicits._
    val genRows = for {
      facts <- Gen.listOfN(60, Gen.zip(Gen.choose(0L, 5L),
        Gen.choose(0L, 50L)))
      anchors <- Gen.listOfN(12, Gen.zip(Gen.choose(0L, 5L),
        Gen.choose(0L, 50L)))
    } yield (facts.zipWithIndex.map { case ((k, t), i) =>
      (k, t, i.toLong)
    }, anchors)
    check("q25", Prop.forAll(genRows) { case (facts, anchors) =>
      val f = facts.toDF("k", "t", "id")
      val a = anchors.toDF("k", "t")
      val out = Asof.asofJoin(f, a, "k", "t", "a_ts").collect()
        .map(r => r.getLong(2) ->
          Option(r.getAs[java.lang.Long]("a_ts")).map(_.longValue)).toMap
      val byKey = anchors.groupBy(_._1)
        .map { case (k, ts) => k -> ts.map(_._2).sorted }
      facts.forall { case (k, t, id) =>
        out(id) == byKey.getOrElse(k, Nil).takeWhile(_ <= t).lastOption
      }
    }, n = 6)
  }

  test("d07 property: components equal an in-memory union-find") {
    import spark.implicits._
    val genEdges = Gen.listOfN(25,
      Gen.zip(Gen.choose(0L, 25L), Gen.choose(0L, 25L)))
      .map(_.filter(e => e._1 != e._2))
      .suchThat(_.nonEmpty)
    check("d07", Prop.forAll(genEdges) { edges =>
      val out = Dedup.dedupGroups(edges.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
      // reference union-find with min-id representative
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      def union(a: Long, b: Long): Unit = {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) {
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      edges.foreach { case (a, b) => union(a, b) }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      nodes.forall(n => out(n) == find(n))
    }, n = 6)
  }

  test("d11 property: diff equals an in-memory map comparison") {
    import spark.implicits._
    val genDoc = Gen.zip(Gen.choose(0L, 25L),
      Gen.option(Gen.oneOf("alpha", "beta", "gamma", "delta")))
    val genCase = for {
      o <- Gen.listOfN(18, genDoc)
      n <- Gen.listOfN(18, genDoc)
    } yield (o.distinctBy(_._1), n.distinctBy(_._1))
    check("d11", Prop.forAll(genCase) { case (o, n) =>
      val out = Dedup.snapshotDiff(
        o.map { case (k, t) => (k, t.orNull) }.toDF("doc_id", "text"),
        n.map { case (k, t) => (k, t.orNull) }.toDF("doc_id", "text"))
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val om = o.toMap
      val nm = n.toMap
      val expected = (om.keySet ++ nm.keySet).flatMap { k =>
        (om.get(k), nm.get(k)) match {
          case (None, Some(_)) => Some(k -> "added")
          case (Some(_), None) => Some(k -> "removed")
          case (Some(a), Some(b)) if a != b => Some(k -> "changed")
          case _ => None
        }
      }.toMap
      out == expected
    }, n = 6)
  }

  test("t07 property: packing equals an in-memory cumulative layout") {
    import spark.implicits._
    val genDocs = Gen.listOfN(20, Gen.zip(
      Gen.oneOf("A", "B"), Gen.choose(1, 7))).map(_.zipWithIndex.map {
      case ((src, ntok), i) =>
        (i.toLong, src, Seq.fill(ntok)("w").mkString(" "))
    })
    check("t07", Prop.forAll(genDocs) { docs =>
      val budget = 8L
      val out = graft.operators.Corpus.seqPack(
        docs.toDF("doc_id", "source", "text"), budgetTokens = budget)
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) ->
          (r.getAs[Long]("n_docs"), r.getAs[Long]("seq_tokens"))).toMap
      val expected = docs.groupBy(_._2).flatMap { case (src, ds) =>
        var cum = 0L
        ds.sortBy(_._1).map { case (_, _, text) =>
          val ntok = text.split(" ").length.toLong
          val seq = cum / budget
          cum += ntok
          (src, seq) -> ntok
        }.groupBy(_._1).map { case (k, vs) =>
          k -> (vs.size.toLong, vs.map(_._2).sum)
        }
      }
      out == expected
    }, n = 6)
  }

  test("p07 property: source cap equals an in-memory priority sort") {
    import spark.implicits._
    val genDocs = Gen.listOfN(40, Gen.zip(
      Gen.choose(0L, 500L), Gen.oneOf("sa", "sb", "sc")))
      .map(_.distinctBy(_._1))
    check("p07", Prop.forAll(genDocs) { docs =>
      val cap = 4
      val out = graft.operators.Corpus.sourceCap(
        docs.toDF("doc_id", "source"), cap = cap, saltBuckets = 4)
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getAs[Long]("rnk")))
        .toSet
      def pri(id: Long): Long =
        (id % 1000000007L + 271L) % 1000000007L * 2654435761L %
          1000000007L * 2654435761L % 1000000L
      val expected = docs.groupBy(_._2).flatMap { case (src, ds) =>
        ds.sortBy(d => (pri(d._1), d._1)).take(cap).zipWithIndex
          .map { case ((id, _), i) => (id, src, i.toLong + 1) }
      }.toSet
      out == expected
    }, n = 6)
  }

  test("t08 property: vocab equals an in-memory frequency table") {
    import spark.implicits._
    val genDocs = Gen.listOfN(12,
      Gen.listOfN(10, Gen.oneOf("x", "y", "z", "w", "v")).map(_.mkString(" ")))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    check("t08", Prop.forAll(genDocs) { docs =>
      val topN = 3
      val out = graft.operators.TextAnalysis.vocab(
        docs.toDF("doc_id", "text"), topN = topN)
        .collect()
        .map(r => (r.getString(0), r.getAs[Long]("n_occurrences"),
          r.getAs[Long]("rnk"), r.getAs[Double]("cum_share")))
        .sortBy(_._3).toSeq
      val freq = docs.flatMap(_._2.split("\\s+")).filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.length.toLong).toSeq
        .sortBy { case (t, c) => (-c, t) }
      val total = freq.map(_._2).sum.toDouble
      val expected = freq.take(topN).zipWithIndex.map { case ((t, c), i) =>
        val cum = freq.take(i + 1).map(_._2).sum
        // same rounding path as Spark's round(): valueOf (canonical
        // string) then HALF_UP — BigDecimal(double) would round the
        // exact binary expansion instead and can differ at ties.
        (t, c, i.toLong + 1,
          java.math.BigDecimal.valueOf(cum / total)
            .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
      }
      out == expected
    }, n = 6)
  }

  test("d12 property: scrub equals an in-memory span-removal replay") {
    import spark.implicits._
    val genDoc = Gen.listOfN(14, Gen.oneOf("a", "b")).map(_.mkString(" "))
    val genDocs = Gen.listOfN(3, genDoc)
    val L = 4
    check("d12", Prop.forAll(genDocs) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val out = Dedup.spanScrub(docs.toDF("doc_id", "text"),
        spanTokens = L, maxDf = Int.MaxValue)
        .collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2),
          r.getLong(3))).toMap
      // reference: brute-force maximal runs >= L, removal union on
      // the HIGHER doc of each pair, reassemble remaining tokens
      val toks = docs.map { case (_, t) => t.split("\\s+") }
      val removed = scala.collection.mutable
        .Map[Long, scala.collection.mutable.Set[Int]]()
      for {
        i <- docs.indices; j <- docs.indices if i < j
        d <- -(toks(j).length) to toks(i).length
      } {
        var p = math.max(0, d)
        while (p < toks(i).length) {
          if (p - d >= 0 && p - d < toks(j).length &&
            toks(i)(p) == toks(j)(p - d)) {
            val start = p
            while (p < toks(i).length && p - d < toks(j).length &&
              toks(i)(p) == toks(j)(p - d)) p += 1
            if (p - start >= L) {
              val s = removed.getOrElseUpdate(j.toLong,
                scala.collection.mutable.Set[Int]())
              ((start - d) until (p - d)).foreach(s.add)
            }
          } else p += 1
        }
      }
      val expected = removed.map { case (docId, poss) =>
        val tk = toks(docId.toInt)
        docId -> ((tk.indices.filterNot(poss).map(tk).mkString(" "),
          poss.size.toLong, tk.length.toLong))
      }.toMap
      out == expected
    }, n = 5)
  }

  test("d09 property: spans equal a brute-force common-run scan") {
    import spark.implicits._
    // tiny vocabulary forces coincidental shared runs
    val genDoc = Gen.listOfN(18, Gen.oneOf("a", "b", "c")).map(_.mkString(" "))
    val genDocs = Gen.listOfN(3, genDoc)
    check("d09", Prop.forAll(genDocs) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val L = 4
      val out = Dedup.dupSpans(docs.toDF("doc_id", "text"),
        spanTokens = L, maxDf = Int.MaxValue)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet
      // brute force: maximal equal runs >= L along every diagonal
      val toks = docs.map { case (_, t) => t.split("\\s+") }
      val expected = (for {
        i <- docs.indices; j <- docs.indices if i < j
        d <- -(toks(j).length) to toks(i).length
      } yield {
        val runs = scala.collection.mutable.Buffer[(Long, Long, Long, Long, Long)]()
        var p = math.max(0, d)
        while (p < toks(i).length) {
          if (p - d >= 0 && p - d < toks(j).length &&
            toks(i)(p) == toks(j)(p - d)) {
            val start = p
            while (p < toks(i).length && p - d < toks(j).length &&
              toks(i)(p) == toks(j)(p - d)) p += 1
            val len = p - start
            if (len >= L) runs += ((i.toLong, j.toLong, start.toLong,
              (start - d).toLong, len.toLong))
          } else p += 1
        }
        runs
      }).flatten.toSet
      out == expected
    }, n = 5)
  }

  test("q32 property: online flags equal an in-memory prefix-moment replay") {
    import spark.implicits._
    // a small ts range forces timestamp collisions, exercising the
    // event_id tie-break that makes the prefix order total
    val genEvents = Gen.listOfN(50, Gen.zip(
      Gen.choose(0L, 3L), Gen.choose(0L, 20L), Gen.choose(0L, 2000L)))
      .map(_.zipWithIndex.map { case ((u, t, c), i) =>
        (u, i.toLong, t, c / 100.0)
      })
    check("q32", Prop.forAll(genEvents) { evs =>
      val df = evs.toDF("user_id", "event_id", "ts_us", "value")
        .select(col("user_id"), col("event_id"),
          expr("timestamp_micros(ts_us)").as("ts"), col("value"))
      val out = graft.operators.Pipeline.onlineOutliers(df, minPrior = 3L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val expected = evs.groupBy(_._1).flatMap { case (u, es) =>
        var n = BigInt(0); var s = BigInt(0); var q = BigInt(0)
        es.sortBy(e => (e._3, e._2)).flatMap { case (_, id, _, v) =>
          val c = BigDecimal(v * 100)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
          val d = n * c - s
          val flag = n >= 3 && d * d * (n - 1) > 9 * n * (n * q - s * s)
          val res = if (flag) Some((u, id, c, n.toLong)) else None
          n += 1; s += c; q += BigInt(c) * c
          res
        }
      }.toSet
      out == expected
    }, n = 6)
  }

  test("q35 property: census equals an in-memory bit derivation + mask filter") {
    import spark.implicits._
    val genRow = for {
      ok <- Gen.choose(1L, 40L)
      ln <- Gen.choose(1, 7)
      qty <- Gen.choose(1, 50).map(_.toDouble)
      rf <- Gen.oneOf("A", "N", "R")
      ls <- Gen.oneOf("O", "F")
    } yield (ok, ln, qty, rf, ls)
    val genCase = for {
      rows <- Gen.listOfN(120, genRow)
      excl <- Gen.choose(0, 31)
      req <- Gen.choose(0, 31)
    } yield (rows, excl, req)
    check("q35", Prop.forAll(genCase) { case (rows, excl, req) =>
      def flagOf(r: (Long, Int, Double, String, String)): Int =
        (if (r._2 % 2 == 0) 1 else 0) + (if (r._5 == "F") 2 else 0) +
          (if (r._4 == "R") 4 else 0) + (if (r._3 < 10d) 8 else 0) +
          (if (r._1 % 7 == 0) 16 else 0)
      val expected = rows.map(r => (flagOf(r), r._3))
        .filter { case (f, _) => (f & excl) == 0 && (f & req) == req }
        .groupBy(_._1)
        .map { case (f, g) =>
          f -> ((g.size.toLong, g.map(_._2).sum.toLong,
            f & 1, (f >> 1) & 1, (f >> 2) & 1, (f >> 3) & 1, (f >> 4) & 1))
        }
      val out = Relational.flagCensus(
        rows.toDF("l_orderkey", "l_linenumber", "l_quantity",
          "l_returnflag", "l_linestatus"), excl, req)
        .collect()
        .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getInt(3),
          r.getInt(4), r.getInt(5), r.getInt(6), r.getInt(7)))).toMap
      out == expected
    }, n = 6)
  }

  test("p10 property: splits equal rep-hash of an in-memory cluster model") {
    import spark.implicits._
    // Random corpora of singleton docs (unique token vocab each) plus
    // planted identical-text groups (shared vocab per group): the
    // in-memory model resolves clusters by text equality, takes the
    // min-id rep, and replays p08's hash arithmetic on it.
    val genCase = for {
      nSingle <- Gen.choose(5, 20)
      groups <- Gen.listOfN(4, Gen.zip(Gen.choose(0, 9), Gen.choose(2, 4)))
    } yield (nSingle, groups)
    def p08Split(id: Long): String = {
      val P = 1000000007L; val K = 2654435761L
      def pm(a: Long, m: Long) = ((a % m) + m) % m
      val h = pm(pm(pm(pm(id, P) + 9176L, P) * K, P) * K, 1000L)
      if (h < 10) "test" else if (h < 60) "val" else "train"
    }
    check("p10", Prop.forAll(genCase) { case (nSingle, groups) =>
      var nextId = 0L
      def id(): Long = { nextId += 1; nextId * 3L } // sparse ids
      val singles = (1 to nSingle).map { _ =>
        val i = id(); (i, s"u${i}a u${i}b u${i}c u${i}d")
      }
      val grouped = groups.zipWithIndex.flatMap { case ((g, size), gi) =>
        (1 to size).map { _ => (id(), s"g${gi}x$g g${gi}y g${gi}z g${gi}w") }
      }
      val docs = (singles ++ grouped)
        .toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      val out = graft.operators.Corpus.leakSafeSplit(docs).collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(4)))).toMap
      val expected = {
        val byText = (singles ++ grouped).groupBy(_._2)
        byText.values.flatMap { ds =>
          val rep = ds.map(_._1).min
          ds.map(d => d._1 -> ((rep, p08Split(rep))))
        }.toMap
      }
      out == expected
    }, n = 6)
  }

  test("t13 property: distributed BPE equals the in-memory reference") {
    import spark.implicits._
    // random corpora over a tiny alphabet force dense pair collisions
    // and ties — the ranking tiebreak and the greedy fuse both get
    // exercised hard
    val genWord = Gen.choose(1, 5)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c")).map(_.mkString))
    val genCorpus = Gen.listOfN(30, genWord)
    check("t13", Prop.forAll(genCorpus) { ws =>
      val docs = ws.grouped(5).map(_.mkString(" ")).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toSeq
        .toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
      val words = ws.groupBy(identity).view
        .mapValues(_.length.toLong).toSeq
      val want = BpeRef.merges(words, 6)
      val got = graft.operators.TextAnalysis.bpeMerges(docs, nMerges = 6)
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq.sortBy(_._1)
      got == want
    }, n = 5)
  }

  test("q36 property: islands + summit equal an in-memory caller") {
    import spark.implicits._
    // random sparse bin counts; the in-memory reference recomputes the
    // mean+2σ threshold, the island merge, and the leftmost-argmax
    // summit from scratch
    val genBins = Gen.listOfN(60,
      for {
        bin <- Gen.choose(1000L, 1080L)
        cnt <- Gen.frequency(8 -> Gen.choose(1, 3), 2 -> Gen.choose(8, 20))
      } yield (bin, cnt)).map(_.groupBy(_._1).map { case (b, g) =>
        b -> g.map(_._2).sum }.toSeq)
    check("q36", Prop.forAll(genBins) { bins =>
      val ev = bins.flatMap { case (b, n) => Seq.fill(n)(b) }
        .toDF("bin")
        .select(timestamp_micros(col("bin") * 3600L * 1000000L).as("ts"))
      val out = graft.operators.Pipeline.peakSummits(ev).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6))).toSet
      // in-memory reference
      val counts = bins.sortBy(_._1)
      val m = counts.size.toDouble
      val mean = counts.map(_._2).sum / m
      val variance = counts.map(c => (c._2 - mean) * (c._2 - mean)).sum / m
      val thresh = mean + 2 * math.sqrt(variance)
      val enr = counts.filter(_._2 > thresh)
      val expected = scala.collection.mutable.Set.empty[(Long, Long, Long,
        Long, Long, Long, Long)]
      var island = List.empty[(Long, Int)]
      def close(): Unit = if (island.nonEmpty) {
        val is = island.reverse
        val (smB, smN) = is.maxBy { case (b, n) => (n, -b) }
        expected += ((is.head._1, is.last._1, is.size.toLong,
          is.map(_._2.toLong).sum, smB, smN.toLong, smB - is.head._1))
        island = Nil
      }
      enr.foreach { case (b, n) =>
        if (island.nonEmpty && island.head._1 + 1 != b) close()
        island = (b, n) :: island
      }
      close()
      out == expected.toSet
    }, n = 6)
  }

  test("t15 property: scrub equals the brute-force removal closure") {
    import spark.implicits._
    // Tiny vocab + short docs force repeats (incl. periodic overlap);
    // lengths stay far under the maxRep=64 per-(doc, gram) cap so the
    // cap is inert and the reference need not model it.
    val genDoc = for {
      len <- Gen.choose(0, 40)
      toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d"))
    } yield toks
    val genCase = Gen.listOfN(6, genDoc)
    check("t15", Prop.forAll(genCase) { docsToks =>
      val L = 3
      // reference: removal set = union over ALL matched pairs
      // (pa < pb, equal L-grams) of [pb, pb+L) — identical to the
      // islands construction because consecutive-diagonal matches
      // union to exactly the island's b-side span.
      val expected = docsToks.zipWithIndex.flatMap { case (t, id) =>
        val grams = t.sliding(L).toVector.filter(_.size == L)
        val removed = (for {
          a <- grams.indices; b <- grams.indices
          if a < b && grams(a) == grams(b)
          p <- b until b + L
        } yield p).toSet
        if (removed.isEmpty) None
        else Some((id.toLong,
          t.indices.filterNot(removed).map(t).mkString(" "),
          removed.size.toLong, t.size.toLong))
      }.toSet
      val df = docsToks.zipWithIndex
        .map { case (t, id) => (id.toLong, t.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = Dedup.repetitionScrub(df).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3))).toSet
      got == expected
    }, n = 8)
  }

  test("q43 property: sketch+recount equals exact on random skewed docs") {
    import spark.implicits._
    val genDoc = for {
      lang <- Gen.oneOf("en", "de")
      hot <- Gen.choose(0, 20)
      tail <- Gen.listOfN(10, Gen.choose(0, 50).map(i => s"w$i"))
    } yield (lang, (List.fill(hot)("hot") ++ tail).mkString(" "))
    check("q43", Prop.forAll(Gen.listOfN(25, genDoc)) { docs =>
      val df = docs.zipWithIndex
        .map { case ((l, t), i) => (i.toLong, l, t) }
        .toDF("doc_id", "lang", "text")
      val got = graft.operators.TextAnalysis
        .heavyHitterTokens(df, shareDenom = 8, k = 16)
        .select("lang", "token", "n_occ").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      // reference: plain in-memory count + threshold
      val want = docs.groupBy(_._1).flatMap { case (lang, ds) =>
        val toks = ds.flatMap(_._2.split("\\s+").filter(_.nonEmpty))
        val n = toks.size
        toks.groupBy(identity).collect {
          case (t, o) if o.size.toLong * 8 > n =>
            (lang, t, o.size.toLong)
        }
      }.toSet
      got == want
    }, n = 8)
  }

  test("d15 property: bloom decontamination equals an in-memory intersect") {
    import spark.implicits._
    // tiny alphabet → dense 5-gram overlap between bench and corpus
    val genDoc = Gen.listOfN(12, Gen.oneOf("a", "b", "c", "d"))
      .map(_.mkString(" "))
    check("d15", Prop.forAll(Gen.listOfN(14, genDoc)) { docs =>
      // ids 0,3,…,39: the <25 boundary splits them into 9 bench docs
      // and 5 corpus docs
      val df = docs.zipWithIndex
        .map { case (t, i) => (i.toLong * 3, t) }.toDF("doc_id", "text")
      val got = Dedup.bloomDecontaminate(df).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      def grams(t: String): Set[Seq[String]] = {
        val tk = t.trim.toLowerCase.split("\\s+").toSeq
          .filter(_.nonEmpty)
        if (tk.length < 5) Set.empty else tk.sliding(5).map(_.toSeq).toSet
      }
      val bench = docs.zipWithIndex.filter(_._2 * 3 < 25)
        .flatMap(d => grams(d._1)).toSet
      val want = docs.zipWithIndex.filter(_._2 * 3 >= 25)
        .flatMap { case (t, i) =>
          val g = grams(t)
          val hits = g.intersect(bench).size
          if (hits >= 1) Some((i.toLong * 3, g.size.toLong, hits.toLong))
          else None
        }.toSet
      got == want
    }, n = 8)
  }

  test("d16 property: line dedup equals an in-memory df-threshold replay") {
    import spark.implicits._
    // tiny vocab → segments recur across docs at random df; doc
    // lengths straddle the segment width so short tails are covered
    val genDoc = for {
      n <- Gen.choose(1, 30)
      ws <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
    } yield ws.mkString(" ")
    val w = Dedup.BoilerSegTokens
    check("d16", Prop.forAll(Gen.listOfN(12, genDoc)) { docs =>
      val df = docs.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = Dedup.lineDedup(df).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      val segd = docs.zipWithIndex.map { case (t, i) =>
        i.toLong -> t.trim.toLowerCase.split("\\s+", -1).toSeq
          .grouped(w).map(g => (g.mkString(" "), g.size.toLong)).toSeq
      }
      val dfc = segd.flatMap { case (id, ss) => ss.map(_._1 -> id) }
        .distinct.groupBy(_._1).map { case (g, xs) => g -> xs.size }
      val want = segd.map { case (id, ss) =>
        val (rem, kept) = ss.partition(s => dfc(s._1) >= Dedup.BoilerMinDf)
        (id, kept.map(_._1).mkString(" "), ss.size.toLong,
          rem.size.toLong, rem.map(_._2).sum)
      }.toSet
      got == want
    }, n = 8)
  }

  test("t17 property: hierarchical bucket equals ntile on random corpora") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // random doc counts per language hit every cnt mod 3 residue and
    // the cnt < nBuckets degenerate case; null lang is a partition
    val genDoc = for {
      lang <- Gen.oneOf("en", "de", null)
      n <- Gen.choose(2, 12)
      ws <- Gen.listOfN(n, Gen.oneOf("x", "y", "z"))
    } yield (lang, ws.mkString(" "))
    val genCase = Gen.choose(1, 25)
      .flatMap(k => Gen.listOfN(k, genDoc))
    check("t17", Prop.forAll(genCase) { docs =>
      val df = docs.zipWithIndex
        .map { case ((l, t), i) => (i.toLong, t, l) }
        .toDF("doc_id", "text", "lang")
      val got = graft.operators.TextAnalysis.pplBuckets(df).collect()
        .map(r => (Option(r.getString(0)), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("avg_typ").desc, col("doc_id"))
      val ref = graft.operators.TextAnalysis.bigramLm(df)
        .join(df.select(col("doc_id"), col("lang")), "doc_id")
        .withColumn("bucket",
          ntile(graft.operators.TextAnalysis.PplBuckets).over(w)
            .cast("long"))
        .groupBy(col("lang"), col("bucket"))
        .agg(count(lit(1)).as("n"), sum(col("n_bigrams")).as("nb"))
        .collect()
        .map(r => (Option(r.getString(0)), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      got == ref
    }, n = 6)
  }

  test("p16 property: permutation replays in-memory and stays shuffle-grade") {
    import spark.implicits._
    val P = 1000000007L
    val K = BigInt(2654435761L)
    def mix(id: Long, salt: Long): Long = {
      val h = ((BigInt(id).mod(P) + salt).mod(P) * K).mod(P)
      ((h * h).mod(P) + h).mod(P).toLong
    }
    val genIds = for {
      start <- Gen.choose(0L, 1000000L)
      n <- Gen.choose(120, 400)
      stride <- Gen.oneOf(1L, 1L, 7L) // mostly contiguous — the
      // ingest-order case the decorrelation claim is about
    } yield (0 until n).map(i => start + i * stride)
    check("p16", Prop.forAll(genIds) { ids =>
      val docs = ids.map(id => (id, "x", "s", 1L))
        .toDF("doc_id", "text", "source", "n_chars")
      val got = graft.operators.Corpus.shardShuffle(docs)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // in-memory replay: shard + rank under the same arithmetic
      val ref = ids
        .map(id => (mix(id, 5711L) % 8, mix(id, 8231L), id))
        .groupBy(_._1)
        .flatMap { case (shard, rows) =>
          rows.sortBy(r => (r._2, r._3)).zipWithIndex
            .map { case ((_, _, id), i) => (shard, i + 1L, id) }
        }.toSet
      val exact = got.toSet == ref && got.length == ids.length
      // shuffle-grade on contiguous ids: adjacent ascents near 1/2
      // (bound loose: small shards are noisy; the affine chain this
      // replaced measured 0.17)
      val (asc, tot) = got.groupBy(_._1).values.map { sh =>
        val seq = sh.sortBy(_._2).map(_._3)
        val pairs = seq.sliding(2).filter(_.length == 2).toSeq
        (pairs.count(p => p(1) > p(0)), pairs.length)
      }.foldLeft((0, 0))((a, b) => (a._1 + b._1, a._2 + b._2))
      val frac = if (tot == 0) 0.5 else asc.toDouble / tot
      exact && frac > 0.30 && frac < 0.70
    }, n = 6)
  }
}
