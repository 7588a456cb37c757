package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  test("m01: metadata is a pure function of the payload bytes") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).limit(20)
    val meta = Multimodal.multimodalMeta(docs)
      .as[(Long, Long, String, Long, Long, Long)].collect()
      .map(t => t._1 -> t).toMap
    val raw = docs.select("doc_id", "text").as[(Long, String)]
      .collect().toMap
    assert(meta.size === raw.size)
    raw.foreach { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val (_, nBytes, magic, w, h, f) = meta(id)
      assert(nBytes === bytes.length.toLong)
      assert(magic ===
        bytes.take(4).map(b => f"${b & 0xff}%02x").mkString)
      assert(w === 16L + nBytes % 624L)
      assert(h === 16L + (nBytes * 7L) % 464L)
      assert(f === 1L + nBytes % 9L)
    }
  }

  test("m02: feature vectors are 16-wide normalized histograms") {
    import spark.implicits._
    val out = Multimodal.imageFeatures(Tables.documents(spark, sf).limit(50))
      .as[(Long, Seq[Double])].collect()
    assert(out.length === 50)
    out.foreach { case (_, feats) =>
      assert(feats.length === 16)
      assert(feats.forall(v => v >= 0.0 && v <= 1.0))
      // rounded to 1e-6 per bin -> sum within 16 ulps of 1
      assert(math.abs(feats.sum - 1.0) < 1e-4)
    }
  }

  test("m03: thumbnail is bounded and checksums match a direct fold") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).limit(20)
    val out = Multimodal.resize(docs, target = 64)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(t => t._1 -> t).toMap
    val raw = docs.select("doc_id", "text").as[(Long, String)]
      .collect().toMap
    assert(out.size === raw.size)
    raw.foreach { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val stride = math.max(1L, (bytes.length + 63L) / 64L)
      val picked = bytes.indices.filter(_ % stride == 0)
      val expect = picked.zipWithIndex.map { case (t, i) =>
        (i + 1L) * (bytes(t) & 0xff)
      }.sum % 1000000007L
      val (_, n, s, nr, ck) = out(id)
      assert(n === bytes.length.toLong)
      assert(s === stride)
      assert(nr === picked.length.toLong)
      assert(nr <= 64L)
      assert(ck === expect)
    }
  }

  test("m04: every 4th 32-byte frame is kept with a per-frame checksum") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).limit(20)
    val out = Multimodal.frameSample(docs)
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1)
    val raw = docs.select("doc_id", "text").as[(Long, String)]
      .collect().toMap
    raw.foreach { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val nFrames = (bytes.length + 31) / 32
      val kept = (0 until nFrames by 4)
      val got = out(id).map(r => r._2 -> (r._3, r._4)).toMap
      assert(got.keySet === kept.map(_.toLong).toSet)
      kept.foreach { f =>
        val lo = f * 32
        val hi = math.min(lo + 32, bytes.length)
        val expect = (lo until hi).map(j =>
          (j - lo + 1L) * (bytes(j) & 0xff)).sum % 1000000007L
        assert(got(f.toLong) === ((hi - lo).toLong, expect))
      }
    }
  }

  test("m02: features are deterministic across runs") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).limit(10)
    val a = Multimodal.imageFeatures(docs).as[(Long, Seq[Double])]
      .collect().toMap
    val b = Multimodal.imageFeatures(docs).as[(Long, Seq[Double])]
      .collect().toMap
    assert(a === b)
  }

  test("m05: byte-identical payloads collapse to the min-id representative") {
    import spark.implicits._
    val docs = Seq(
      (7L, "same bytes"), (3L, "same bytes"), (9L, "same bytes"),
      (5L, "unique"), (6L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = Multimodal.mediaDedup(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    assert(out.size === 2, "null payload dropped; two distinct contents")
    val dup = out.values.find(_._2 == 3L).get
    assert(dup._1 === 3L, "representative must be the min doc_id")
    assert(dup._3 === "same bytes".getBytes("UTF-8").length.toLong)
    assert(out.values.exists(v => v._2 == 1L && v._1 == 5L))
    // md5 here is the REAL digest — no xxhash engine/oracle gap
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest("same bytes".getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    assert(out.contains(md))
  }

  // independent in-memory replay of the m06 pipeline, for planted data
  private def refChunks(bytes: Array[Byte]): Option[Seq[Long]] = {
    val n = bytes.length
    if (n < 64) None
    else {
      val sums = new Array[Long](64); val cnts = new Array[Long](64)
      var total = 0L
      bytes.indices.foreach { i =>
        val j = ((i.toLong * 64L) / n).toInt
        sums(j) += (bytes(i) & 0xff).toLong; cnts(j) += 1
        total += (bytes(i) & 0xff).toLong
      }
      val cs = new Array[Long](8)
      (0 until 64).foreach { j =>
        if (sums(j) * n > total * cnts(j)) cs(j >> 3) |= (1L << (j & 7))
      }
      Some(cs.toIndexedSeq)
    }
  }

  private def refPairs(docs: Map[Long, Array[Byte]], maxH: Int,
      maxBucket: Int): Set[(Long, Long, Long)] = {
    val ch = docs.flatMap { case (id, b) => refChunks(b).map(id -> _) }
    val bucketN = ch.toSeq
      .flatMap { case (_, cs) => cs.zipWithIndex.map(_.swap) }
      .groupBy(identity).view.mapValues(_.size).toMap
    (for {
      (a, ca) <- ch; (b, cb) <- ch if a < b
      shared = (0 until 8).exists(k =>
        ca(k) == cb(k) && bucketN((k, ca(k))) <= maxBucket)
      if shared
      h = (0 until 8).map(k =>
        java.lang.Long.bitCount(ca(k) ^ cb(k)).toLong).sum
      if h <= maxH
    } yield (a, b, h)).toSet
  }

  test("m06: planted near payloads pair with exact hammings; far ones don't") {
    import spark.implicits._
    // 64 blocks x 4 chars; block j's mean is exactly 'a'+j%26, so the
    // bit pattern is hand-checkable: bit j = (j%26 >= 12). Rewriting
    // block 0 (the lowest mean) to 'z' flips ONLY bit 0 — the new
    // global mean (+100/256) crosses no other block's margin (blocks
    // sit >= 1 full byte from the threshold, the shift is 0.39).
    val base = (0 until 64)
      .flatMap(j => Seq.fill(4)(('a' + j % 26).toChar)).mkString
    val oneBlockEdit = "zzzz" + base.drop(4)
    val far = (0 until 64)
      .flatMap(j => Seq.fill(4)(('a' + (25 - j % 26)).toChar)).mkString
    val docs = Seq(
      1L -> base, 2L -> base, 3L -> oneBlockEdit, 4L -> far,
      5L -> "short", 6L -> null.asInstanceOf[String])
    val df = docs.toDF("doc_id", "text")
    val got = Multimodal.phashDedup(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = refPairs(
      docs.collect { case (id, t) if t != null => id -> t.getBytes("UTF-8") }
        .toMap, maxH = 6, maxBucket = 256)
    assert(got === want, "engine pairs must equal the in-memory replay")
    assert(got.contains((1L, 2L, 0L)), "identical payloads pair at hamming 0")
    assert(got.contains((1L, 3L, 1L)),
      "the one-block edit pairs at exactly hamming 1")
    assert(!got.exists { case (a, b, _) => a == 4L || b == 4L },
      "the far payload pairs with nothing")
    assert(!got.exists { case (a, b, _) => a == 5L || b == 5L },
      "sub-grid payloads are not fingerprintable")
    // the bucket guard is a real knob: at maxBucket=1 every shared
    // bucket is 'hot' (the identical docs share all 8), so no
    // candidates survive
    assert(Multimodal.phashDedup(df, maxBucket = 1).collect().isEmpty)
    // the band self-join must probe ONE decoded-postings exchange
    // twice — the batch decode runs once, not per join side. AQE's
    // toString prints final then initial plan; only the final
    // section reflects stage reuse (checked on this NON-empty result
    // — an empty one collapses to EmptyRelation and erases the
    // evidence)
    val executed = Multimodal.phashDedup(df)
    assert(executed.collect().nonEmpty)
    val finalPlan = executed.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(finalPlan.contains("ReusedExchange"),
      "band join sides must share the postings exchange")
    assert(finalPlan.split("SerializeFromObject").length == 2,
      "the mapPartitions decode must appear exactly once in the final plan")
  }

  test("m06: random payload mixes equal the in-memory replay (seeded)") {
    import spark.implicits._
    // deterministic pseudorandom corpus: long randoms, exact copies,
    // single-byte edits, short rejects — the tie/bucket shapes a
    // planted fixture can't enumerate
    val rnd = new scala.util.Random(42)
    def randText(n: Int) =
      (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val base = (0 until 12).map(i => (i.toLong, randText(80 + rnd.nextInt(120))))
    val copies = (0 until 4).map(i =>
      (100L + i, base(rnd.nextInt(base.length))._2))
    val edits = (0 until 4).map { i =>
      val t = base(rnd.nextInt(base.length))._2
      val p = rnd.nextInt(t.length)
      (200L + i, t.updated(p, if (t(p) == 'z') 'a' else 'z'))
    }
    val shorts = (0 until 3).map(i => (300L + i, randText(1 + rnd.nextInt(60))))
    val docs = base ++ copies ++ edits ++ shorts
    val got = Multimodal.phashDedup(docs.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = refPairs(
      docs.map { case (id, t) => id -> t.getBytes("UTF-8") }.toMap,
      maxH = 6, maxBucket = 256)
    assert(got === want)
    assert(got.nonEmpty, "the copies must pair at hamming 0")
  }

  test("m06: corpus fingerprints cover every eligible payload; empty is correct") {
    val docs = Tables.documents(spark, sf)
    val ph = Multimodal.phashChunks(docs).collect()
    val eligible = docs.filter(
      org.apache.spark.sql.functions.col("text").isNotNull &&
      org.apache.spark.sql.functions
        .octet_length(org.apache.spark.sql.functions.col("text")) >= 64)
      .count()
    assert(ph.length.toLong === eligible)
    ph.foreach { r =>
      val cs = r.getAs[scala.collection.Seq[Long]]("chunks")
      assert(cs.length === 8 && cs.forall(c => c >= 0L && c <= 255L))
    }
    // this corpus's near-dups are word-level edits — >7/64 block bits
    // apart, correctly NOT phash-near (the oracle independently
    // derives the same empty set through the full hash pipeline)
    assert(Multimodal.phashDedup(docs).collect().isEmpty)
  }

  test("m07: CDC chunks partition every payload exactly") {
    val rnd = new scala.util.Random(11)
    val texts = (0 until 30).map { i =>
      (i.toLong, (0 until (1 + rnd.nextInt(400)))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString + "é€") // multibyte tail
    }
    texts.foreach { case (_, t) =>
      val bytes = t.getBytes("UTF-8")
      val arr = graft.functions.CdcChunks.compute(bytes, 8, 31L,
        1000000007L, 5)
      val chunks = (0 until arr.numElements()).map { k =>
        val r = arr.getStruct(k, 2); (r.getLong(0), r.getLong(1))
      }
      // exact cover: starts chain, lengths positive, total = n
      assert(chunks.nonEmpty)
      assert(chunks.head._1 === 0L)
      chunks.sliding(2).foreach {
        case Seq((s1, l1), (s2, _)) => assert(s1 + l1 === s2)
        case _ =>
      }
      assert(chunks.forall(_._2 > 0))
      assert(chunks.map(_._2).sum === bytes.length.toLong)
    }
    // empty payload → no chunks
    assert(graft.functions.CdcChunks
      .compute(Array.emptyByteArray, 8, 31L, 1000000007L, 5)
      .numElements() === 0)
  }

  test("m07: boundaries re-sync after an insertion (the CDC property)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val a = (0 until 3000)
      .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val b = "PREPENDED-HEADER-" + a // shifted by 17 bytes
    val out = Multimodal.cdcDedup(
      Seq((1L, a), (2L, b)).toDF("doc_id", "text")).collect()
    val shared = out.filter(_.getAs[Long]("n_copies") >= 2L)
    val aChunks = graft.functions.CdcChunks
      .compute(a.getBytes("UTF-8"), 8, 31L, 1000000007L, 5)
      .numElements()
    // most of A's chunks must reappear verbatim inside B despite the
    // 17-byte shift — fixed-size blocks would share NOTHING
    assert(shared.length >= aChunks / 2,
      s"only ${shared.length} of $aChunks chunks re-synced")
    // and the reclaimed bytes are most of A's length
    val saved = shared.map(_.getAs[Long]("saved_bytes")).sum
    assert(saved >= a.length / 2)
  }
}
