package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{MinHashSigs, RollingMinHash, SimHash64}
import graft.operators.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {
  import TestSpark._

  test("t01: planted texts in each language are identified") {
    import spark.implicits._
    val planted = Seq(
      (1L, "de", "der hund und die katze ist nicht da"),
      (2L, "en", "the cat is of the dog and a bird"),
      (3L, "es", "el perro y la casa es un gato"),
      (4L, "fr", "le chien et la maison est un chat"),
      (5L, "zh", "的 是 在 了 不 和"),
      (6L, "und", "zzz qqq www")
    ).toDF("doc_id", "lang", "text")
    val pred = TextAnalysis.langId(planted).collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[String]("pred_lang"))
    pred.foreach { case (want, got) => assert(got === want) }
  }

  test("t01: prediction equals a driver-side recomputation of the argmax") {
    // The testdata text is language-agnostic gibberish, so agreement
    // with the lang LABEL is meaningless; what must hold is that the
    // distributed argmax matches an independent reimplementation.
    val out = TextAnalysis.langId(Tables.documents(spark, sf)).collect()
    assert(out.length > 0)
    val texts = Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val lists = TextAnalysis.stopwords.toMap
    out.foreach { r =>
      val toks = texts(r.getAs[Long]("doc_id")).trim.toLowerCase
        .split("\\s+").toSeq
      val h = Seq("de", "en", "es", "fr", "zh")
        .map(l => l -> toks.count(lists(l).contains(_)).toLong)
      h.foreach { case (l, n) => assert(r.getAs[Long](s"hits_$l") === n) }
      val want =
        if (h.forall(_._2 == 0)) "und"
        else h.maxBy(x => (x._2, x._1))(
          Ordering.Tuple2(Ordering.Long, Ordering.String.reverse))._1
      assert(r.getAs[String]("pred_lang") === want)
    }
  }

  test("t02: ratios and composite score stay in [0, 1]") {
    val rows = TextAnalysis.qualityScore(Tables.documents(spark, sf)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("alpha_ratio", "punct_ratio", "stop_ratio", "quality_score")
        .foreach { c =>
          val v = r.getAs[Double](c)
          assert(v >= 0.0 && v <= 1.0, s"$c = $v out of range")
        }
    }
  }

  test("t03: BPE-ish tokens at least as fine as whitespace tokens") {
    val rows = TextAnalysis.tokenCount(Tables.documents(spark, sf)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_bpe_tokens") >= r.getAs[Long]("n_ws_tokens"))
      assert(r.getAs[Double]("chars_per_token") > 0.0)
    }
  }

  test("t05: repetition math on planted repeated text") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam"),          // bigrams: 3x "spam spam"
      (2L, "all words here are different")  // 4 distinct bigrams
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetition(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_grams") === 3L)
    assert(out(1L).getAs[Long]("n_distinct") === 1L)
    assert(out(1L).getAs[Double]("dup_ratio") === 0.6667)
    assert(out(1L).getAs[Double]("top_gram_ratio") === 1.0)
    assert(out(2L).getAs[Double]("dup_ratio") === 0.0)
    assert(out(2L).getAs[Double]("top_gram_ratio") === 0.25)
  }

  test("t06: planted PII is scrubbed and counted") {
    import spark.implicits._
    val docs = Seq(
      (1L, "mail me at jane.doe+x@example.org or call 12345678 now"),
      (2L, "clean text with short 123 number")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.redact(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_emails") === 1L)
    assert(out(1L).getAs[Long]("n_longnums") === 1L)
    assert(out(1L).getAs[String]("redacted") ===
      "mail me at <EMAIL> or call <NUM> now")
    assert(out(2L).getAs[Long]("n_emails") === 0L)
    assert(out(2L).getAs[String]("redacted") ===
      "clean text with short 123 number")
  }

  test("t18: checksums accept real instruments and reject neighbors") {
    import spark.implicits._
    val docs = Seq(
      // 4111111111111111 is the canonical Luhn-valid test PAN; the
      // trailing-digit neighbor must fail; GB82WEST... is the ISO
      // 13616 example IBAN, its neighbor fails mod-97
      (1L, "pay 4111111111111111 or 4111111111111112 now"),
      (2L, "wire GB82WEST12345698765432 not GB82WEST12345698765431"),
      (3L, "also valid: DE89370400440532013000 and card 79927398713x"),
      (4L, null.asInstanceOf[String]),
      (5L, "timestamps 1706657176220708 and ids 99999999999999 only")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.piiValidate(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_cards") === 2L)
    assert(out(1L).getAs[Long]("n_cards_valid") === 1L)
    assert(out(2L).getAs[Long]("n_ibans") === 2L)
    assert(out(2L).getAs[Long]("n_ibans_valid") === 1L)
    assert(out(3L).getAs[Long]("n_ibans_valid") === 1L)
    // 79927398713 is Luhn-valid but 11 digits — below the card
    // length floor, so it is not even a candidate; the IBAN's own
    // 20-digit tail DOES yield a (greedy 19-digit) card candidate,
    // and Luhn correctly rejects it (checksum 8)
    assert(out(3L).getAs[Long]("n_cards") === 1L)
    assert(out(3L).getAs[Long]("n_cards_valid") === 0L)
    // NULL text is zero candidates, never a null row
    assert(out(4L).getAs[Long]("n_cards") === 0L &&
      out(4L).getAs[Long]("n_ibans") === 0L)
    // the point of validation: t06 would flag both of doc 5's digit
    // runs; the checksum drops the ones that are not instruments
    assert(out(5L).getAs[Long]("n_cards") === 2L)
    assert(out(5L).getAs[Long]("n_cards_valid") === 0L)
  }

  test("t18: demo legs are non-vacuous and distribution-sane") {
    val rows = SparkEntry.queries("t18_pii_validate")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val n = rows.length.toDouble
    val cardOk = rows.count(_.getAs[Long]("card_demo_ok") == 1L) / n
    // Luhn accepts ~1/10 random numbers; allow a wide band
    assert(cardOk > 0.02 && cardOk < 0.25, s"card_demo_ok rate $cardOk")
    val rems = rows.map(_.getAs[Long]("iban_demo_rem")).distinct
    assert(rems.forall(r => r >= 0 && r <= 96))
    assert(rems.length > 20, "mod-97 remainders should spread")
    // ok flags are exactly the rem==1 rows
    rows.foreach { r =>
      assert((r.getAs[Long]("iban_demo_rem") == 1L) ===
        (r.getAs[Long]("iban_demo_ok") == 1L))
    }
  }

  test("t18: demo legs survive a doc_id beyond the int64 multiply " +
      "range") {
    import spark.implicits._
    // 2654435761 * anything above ~3.47e9 overflows long; ANSI mode
    // would abort the query — the reduced-key demo legs must stay in
    // range for ANY doc_id (r15 ADVICE regression)
    val docs = Seq((Long.MaxValue, "big id"), (9000000000L, "mid id"),
      (7L, "small id")).toDF("doc_id", "text")
    val out = TextAnalysis.piiValidate(docs).collect()
    assert(out.length === 3)
    out.foreach { r =>
      val rem = r.getAs[Long]("iban_demo_rem")
      assert(rem >= 0 && rem <= 96)
      assert(Set(0L, 1L).contains(r.getAs[Long]("card_demo_ok")))
    }
  }

  test("t04: codegen output equals the interpreted kernel") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf).limit(50)
    val viaExpr = TextAnalysis.fingerprint(docs).as[(Long, Long)]
      .collect().toMap
    val direct = docs.select("doc_id", "text").as[(Long, String)]
      .collect().map { case (id, text) =>
        id -> RollingMinHash.compute(
          text.getBytes("UTF-8"), 16, 31L, 1000000007L)
      }.toMap
    assert(viaExpr === direct)
    assert(viaExpr.values.toSet.size > 1, "fingerprints must discriminate")
  }

  test("t04: rolling update equals naive window re-hash") {
    val bytes = "the quick brown fox jumps over the lazy dog".getBytes("UTF-8")
    val w = 16
    val naive = bytes.sliding(w).map { win =>
      win.foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % 1000000007L)
    }.min
    assert(RollingMinHash.compute(bytes, w, 31L, 1000000007L) === naive)
  }

  test("minhash/simhash kernels equal the HOF formulation they replaced") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f g a b c"), (2L, "x y z")).toDF("doc_id", "text")
    val toks = split(lower(trim(col("text"))), "\\s+")
    // reference: the original Column-level expressions
    val hofSig = docs.select(col("doc_id"),
      transform(sequence(lit(0), lit(7)),
        i => array_min(transform(toks, s => xxhash64(s, i)))).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val kernelSig = docs.select(col("doc_id"),
      graft.functions.HashExprs.minhashSigs(toks, 8).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(kernelSig === hofSig)

    val hofSim = docs.select(col("doc_id"),
      aggregate(sequence(lit(0), lit(63)), lit(0L),
        (acc, j) => acc + when(
          aggregate(toks, lit(0L),
            (s, t) => s + when(call_function("shiftright", xxhash64(t), j)
              .bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L)) > 0L,
          call_function("shiftleft", lit(1L), j)).otherwise(lit(0L))).as("sh"))
      .as[(Long, Long)].collect().toMap
    val kernelSim = docs.select(col("doc_id"),
      graft.functions.HashExprs.simhash64(toks).as("sh"))
      .as[(Long, Long)].collect().toMap
    assert(kernelSim === hofSim)
  }

  test("stopword_hits kernel equals the HOF formulation it replaced") {
    import org.apache.spark.sql.functions._
    import TestSpark.spark.implicits._
    val docs = Tables.documents(spark, sf).limit(200)
    val words = graft.operators.TextAnalysis.stopwords.toMap.apply("en")
    val toks = split(lower(trim(col("text"))), "\\s+")
    val hof = docs.select(col("doc_id"),
      size(filter(toks, t => array_contains(array(words.map(lit): _*), t)))
        .cast("long").as("h"))
      .as[(Long, Long)].collect().toMap
    val kernel = docs.select(col("doc_id"),
      graft.functions.StopwordExprs.stopwordHits(toks, words).as("h"))
      .as[(Long, Long)].collect().toMap
    assert(kernel === hof)
    // multiset + null-token semantics on a crafted array
    val crafted = Seq((1L, Seq("the", "the", "xx", null, "of")))
      .toDF("doc_id", "toks")
    val got = crafted.select(
      graft.functions.StopwordExprs.stopwordHits(col("toks"), words))
      .head.getLong(0)
    assert(got === 3L, "every occurrence counts; nulls don't")
  }

  test("t08: vocab ranks, shares, and coverage match a flat recompute") {
    val docs = Tables.documents(spark, sf)
    val out = SparkEntry.queries("t08_vocab")(spark, sf).collect()
      .sortBy(_.getAs[Long]("rnk"))
    assert(out.nonEmpty && out.length <= 100)
    // rank is contiguous 1..N; coverage is monotone and ≤ 1
    assert(out.map(_.getAs[Long]("rnk")).toSeq === (1L to out.length.toLong))
    val cum = out.map(_.getAs[Double]("cum_share"))
    assert(cum.zip(cum.tail).forall { case (a, b) => a <= b })
    assert(cum.last <= 1.0 && cum.last > 0.0)
    // counts and the top boundary match a driver-side flat recompute
    val freq = docs.collect()
      .flatMap(r => Option(r.getAs[String]("text")))
      .flatMap(_.trim.toLowerCase.split("\\s+"))
      .filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val expTop = freq.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(out.length)
    val gotTop = out.map(r =>
      (r.getAs[String]("token"), r.getAs[Long]("n_occurrences"))).toSeq
    assert(gotTop === expTop)
    // share denominator is the WHOLE corpus, not the top-100 slice
    val total = freq.values.sum.toDouble
    val first = out.head
    assert(math.abs(first.getAs[Double]("share") -
      first.getAs[Long]("n_occurrences") / total) < 1e-6)
  }

  test("t09: bigram typicality matches hand-computed ML estimates") {
    import spark.implicits._
    // corpus: c("a b")=2, c("b a")=1, c("a c")=1; prefix counts a=3, b=1
    val docs = Seq((1L, "a b a b"), (2L, "a c"), (3L, "x"))
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.bigramLm(docs).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_bigrams"),
        r.getAs[Long]("typ_sum"), r.getAs[Double]("avg_typ"))).toMap
    // doc 1: p(a b)=2/3 twice, p(b a)=1/1 → 666667+1000000+666667
    assert(out(1L) === ((3L, 2333334L, 777778.0)))
    // doc 2: p(a c)=1/3 → 333333
    assert(out(2L) === ((1L, 333333L, 333333.0)))
    // doc 3 has no bigram: absent, not zero-scored
    assert(!out.contains(3L))
    // partitioning must not change the integer sums
    val again = graft.operators.TextAnalysis.bigramLm(docs.repartition(7))
      .collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_bigrams"),
        r.getAs[Long]("typ_sum"), r.getAs[Double]("avg_typ"))).toMap
    assert(again === out)
  }

  test("t10: OOV counts are exact on a planted corpus with vocab ties") {
    import spark.implicits._
    // corpus counts: a=3, q=3, b=1, z=1; topN=2 keeps (a, q) — the
    // tie at c=3 is broken by token asc, and b/z fall outside even
    // though b < q lexically (count dominates token).
    val docs = Seq((1L, "a a b"), (2L, "a z"), (3L, "q q q"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.oovRate(docs, topN = 2).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_oov"), r.getAs[Double]("oov_rate"))).toMap
    assert(out(1L) === ((3L, 1L, 0.3333)))
    assert(out(2L) === ((2L, 1L, 0.5)))
    assert(out(3L) === ((3L, 0L, 0.0)))
  }

  test("t10: matches a driver-side recompute; vocab join stays broadcast") {
    val docs = Tables.documents(spark, sf)
    val df = TextAnalysis.oovRate(docs)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("SortMergeJoin"))
    val freq = docs.collect()
      .flatMap(r => Option(r.getAs[String]("text")))
      .flatMap(_.trim.toLowerCase.split("\\s+"))
      .filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val vocab = freq.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(100).map(_._1).toSet
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    df.collect().foreach { r =>
      val toks = texts(r.getAs[Long]("doc_id")).trim.toLowerCase
        .split("\\s+").filter(_.nonEmpty)
      assert(r.getAs[Long]("n_tokens") === toks.length.toLong)
      assert(r.getAs[Long]("n_oov") ===
        toks.count(t => !vocab.contains(t)).toLong)
    }
  }

  test("t11: NFC-equivalent texts collapse; distinct texts don't") {
    import spark.implicits._
    val composed = "café Ångström"          // é, Å composed
    val decomposed = "café Ångström"     // e+◌́, A+◌̊, o+◌̈
    val hangulNfc = "가나"                          // 가나 composed
    val hangulNfd = "가나"              // jamo sequence
    val ligature = "ﬁsh"                               // ﬁ stays under NFC
    val docs = Seq(
      (1L, composed), (2L, decomposed),
      (3L, hangulNfc), (4L, hangulNfd),
      (5L, ligature), (6L, "fish"),
      (7L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysis.unicodeDedup(docs).collect()
      .map(r => r.getAs[Long]("rep_id") ->
        (r.getAs[Long]("n_copies"), r.getAs[Long]("n_bytes_nfc"))).toMap
    // composed/decomposed merge (reps 1, 3); the ﬁ ligature is a
    // COMPATIBILITY equivalent — NFC correctly keeps it distinct
    assert(out === Map(
      1L -> ((2L, composed.getBytes("UTF-8").length.toLong)),
      3L -> ((2L, hangulNfc.getBytes("UTF-8").length.toLong)),
      5L -> ((1L, ligature.getBytes("UTF-8").length.toLong)),
      6L -> ((1L, 4L))))
    // the kernel agrees with java.text.Normalizer on every corpus text
    val docsReal = Tables.documents(spark, sf).filter(col("text").isNotNull)
    val viaKernel = docsReal
      .select(col("doc_id"), graft.functions.UnicodeExprs.nfc(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    docsReal.select("doc_id", "text").collect().foreach { r =>
      val want = java.text.Normalizer.normalize(
        r.getString(1), java.text.Normalizer.Form.NFC)
      assert(viaKernel(r.getLong(0)) === want)
    }
  }

  test("t13: BPE merges equal the in-memory reference on a classic corpus") {
    import TestSpark.spark.implicits._
    import org.apache.spark.sql.functions.lit
    val text = ("low " * 5) + ("lower " * 2) + ("newest " * 6) + ("widest " * 3)
    val docs = Seq((1L, text.trim)).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
    val words = text.trim.split("\\s+").toSeq
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
    val want = BpeRef.merges(words, 8)
    val got = graft.operators.TextAnalysis.bpeMerges(docs, nMerges = 8)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    assert(got === want, s"engine $got vs reference $want")
    // sanity: the first learned pair really is the most frequent one
    // ("es" from 6x newest + 3x widest = 9)
    assert(got.head._4 === 9L)
    assert((got.head._2, got.head._3) === (("e", "s")))
  }

  test("t13: two-tier training — 256 merges, ONE Spark job, ≡ sequential reference") {
    // the r9 scale gate: training is one distributed word-frequency
    // aggregation + a driver-side incremental trainer over the capped
    // vocab table, so Spark jobs stay constant as nMerges grows — AND
    // the result must equal the strictly sequential naive-recount
    // reference (a genuinely different algorithm: BpeRef recounts all
    // pairs per round; the engine applies inverted-index deltas).
    // documents.text draws from a 31-word template vocabulary at every
    // SF (89 learnable merges total), so the 256-merge gate corpus
    // unions it with customer.c_name (150 distinct words, ~2.5k merge
    // capacity) — still real driver-generated test data.
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(TestSpark.spark, TestSpark.sf)
      .select(col("text"))
      .unionAll(Tables.customer(TestSpark.spark, TestSpark.sf)
        .select(col("c_name").as("text")))
    val words = docs.select("text").collect()
      .flatMap(r => Option(r.getString(0)))
      .flatMap(_.trim.toLowerCase.split("\\s+"))
      .filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
    val (got, rounds) = graft.operators.TextAnalysis
      .bpeMergesCounted(docs, nMerges = 256)
    val gotSeq = got.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    val want = BpeRef.merges(words, 256)
    assert(gotSeq === want)
    assert(gotSeq.length === 256, s"corpus exhausted at ${gotSeq.length}")
    assert(rounds === 1, s"training loop ran $rounds Spark jobs, want 1")
  }

  test("t14: fertility from hand-derived merges; boundaries never fuse") {
    import TestSpark.spark.implicits._
    import org.apache.spark.sql.functions.lit
    val docs = Seq(
      (1L, "the then"), // (t,h)->th, (th,e)->the: [the][the,n] -> 3 bpe / 2 ws
      (2L, "ththth"),   // greedy leftmost: th th th -> 3 bpe / 1 ws
      (3L, "t h"),      // boundary symbol between t,h: NO fuse -> 2 bpe / 2 ws
      (4L, "of in and") // of; in; an+d->and: 3 bpe / 3 ws
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
    val got = graft.operators.TextAnalysis.bpeTokenize(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got(1L) === ((2L, 3L, 1.5)))
    assert(got(2L) === ((1L, 3L, 3.0)))
    assert(got(3L) === ((2L, 2L, 1.0)), "the word boundary must not fuse t+h")
    assert(got(4L) === ((3L, 3L, 1.0)))
  }

  test("t14: kernel equals the regexp-chain (oracle) form on the harness corpus") {
    val docs = Tables.documents(TestSpark.spark, TestSpark.sf)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val kernel = rows(graft.operators.TextAnalysis.bpeTokenize(docs))
    val regex = rows(graft.operators.TextAnalysis.bpeTokenizeViaRegex(docs))
    assert(kernel === regex)
    assert(kernel.nonEmpty)
  }

  test("t14: kernel equals the regexp form on astral (non-BMP) text") {
    // split(norm, "") yields ONE element per codepoint on Spark 4.1, so
    // the kernel must seed one symbol per codepoint, not per UTF-16 unit
    import TestSpark.spark.implicits._
    import org.apache.spark.sql.functions.lit
    val docs = Seq(
      (1L, "the 😀😀 then"),   // emoji pair mid-text
      (2L, "🍕 of 🍕"),        // leading astral char
      (3L, "th😀th"),                    // astral splits a mergeable pair
      (4L, "😀")                         // astral-only document
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s0"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val kernel = rows(graft.operators.TextAnalysis.bpeTokenize(docs))
    val regex = rows(graft.operators.TextAnalysis.bpeTokenizeViaRegex(docs))
    assert(kernel === regex)
    // each astral char is ONE symbol: "the [e][e] then" -> the(1)+2+then:
    // t,h->th; th,e->the ... doc 1: [the][😀][😀][the,n]
    assert(kernel(4L)._1 === 1L, "astral-only doc must count one bpe symbol")
  }

  test("t12: confusion census counts planted labels; null declared is a mismatch") {
    import TestSpark.spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    val docs = Seq(
      (1L, "the cat and the dog is in a house", "en"),   // correct en
      (2L, "the quick brown fox and the hen", "en"),     // correct en
      (3L, "the cat and the dog is here", "de"),         // MISLABELED en->de
      (4L, "der hund und die katze ist nicht da", "de"), // correct de
      (5L, "xyzzy qwerty 12345", "en"),                  // no stopwords: und
      (6L, "the dog and the cat", null)                  // null declared
    ).toDF("doc_id", "text", "lang")
    val got = graft.operators.TextAnalysis.langMismatch(docs).collect()
      .map(r => (Option(r.getString(0)), r.getString(1)) ->
        (r.getLong(2), r.getInt(3))).toMap
    assert(got((Some("en"), "en")) === ((2L, 0)))
    assert(got((Some("de"), "en")) === ((1L, 1)), "mislabel is its own cell")
    assert(got((Some("de"), "de")) === ((1L, 0)))
    assert(got((Some("en"), "und")) === ((1L, 1)), "undetectable ≠ declared")
    assert(got((None, "en")) === ((1L, 1)),
      "null declared must be a mismatch, not an accidental match")
    assert(got.values.map(_._1).sum === 6L, "census conserves the corpus")
  }

  test("t12: census on the harness corpus agrees with per-doc t01 rows") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(TestSpark.spark, TestSpark.sf)
    val perDoc = graft.operators.TextAnalysis.langId(docs).collect()
      .map(r => (Option(r.getAs[String]("lang")), r.getAs[String]("pred_lang")))
    val expected = perDoc.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val census = graft.operators.TextAnalysis.langMismatch(docs).collect()
      .map(r => (Option(r.getString(0)), r.getString(1)) -> r.getLong(2)).toMap
    assert(census === expected)
  }

  test("hash expressions survive interpreted (non-codegen) eval") {
    val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array[Any](UTF8String.fromString("alpha"), UTF8String.fromString("beta")))
    val sigs = MinHashSigs.compute(arr, 4, fromDigests = false,
      portable = false)
    assert(sigs.numElements() === 4)
    val sim = SimHash64.compute(arr, portable = false)
    assert(sim !== 0L)
    // portable mode: signatures live in [0, M), simhash is md5-based
    val psigs = MinHashSigs.compute(arr, 4, fromDigests = false,
      portable = true)
    assert(psigs.toLongArray.forall(s =>
      s >= 0 && s < graft.functions.PortableHash.M))
    assert(SimHash64.compute(arr, portable = true) !==
      SimHash64.compute(arr, portable = false))
    // empty input edge cases
    val empty = new org.apache.spark.sql.catalyst.util.GenericArrayData(Array[Any]())
    assert(SimHash64.compute(empty, portable = false) === 0L)
    assert(SimHash64.compute(empty, portable = true) === 0L)
    assert(MinHashSigs.compute(empty, 2, fromDigests = false,
      portable = false).toLongArray.forall(_ == Long.MaxValue))
    assert(MinHashSigs.compute(empty, 2, fromDigests = false,
      portable = true).toLongArray.forall(_ == Long.MaxValue))
  }

  test("t16: deflate kernel equals a direct java.util.zip reference") {
    import graft.functions.{CompressExprs, DeflateSize}
    def ref(s: String): Int = {
      val d = new java.util.zip.Deflater(CompressExprs.DeflateLevel, true)
      d.setInput(s.getBytes("UTF-8")); d.finish()
      val buf = new Array[Byte](1 << 16)
      var n = 0
      while (!d.finished()) n += d.deflate(buf)
      d.end(); n
    }
    val samples = Seq("", "a", "hello world", "ab" * 500,
      (1 to 200).map(i => s"w${i % 7}").mkString(" "),
      "café 中文 text with unicode")
    samples.foreach { s =>
      val got = DeflateSize.compute(UTF8String.fromString(s))
      assert(got === ref(s), s"deflate size mismatch for ${s.take(20)}")
      // determinism across repeated thread-local reuse
      assert(DeflateSize.compute(UTF8String.fromString(s)) === got)
    }
  }

  test("t16: planted tails are flagged, normal prose passes") {
    import spark.implicits._
    val repetitive = "spam token loop " * 64
    val random = new scala.util.Random(7)
    // full printable-ASCII entropy (~6.6 bits/char): alphanumeric
    // words alone deflate to just UNDER the incompressible band
    val noise = Seq.fill(2000)((33 + random.nextInt(94)).toChar).mkString
    // varied word-salad like the corpus median (~4900bp): a repeated
    // sentence would itself deflate into the repetitive band
    val vocab = Seq("the", "quick", "brown", "fox", "jumps", "over",
      "lazy", "dog", "seven", "meadow", "stone", "count", "wander",
      "river", "cloud", "ember", "quiet", "march", "glass", "timber")
    val prose = Seq.fill(40)(vocab(random.nextInt(vocab.length)))
      .mkString(" ")
    val docs = Seq((1L, repetitive), (2L, noise), (3L, prose))
      .toDF("doc_id", "text")
    val out = graft.operators.TextAnalysis.compressFilter(docs).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(out.get(1L).contains("repetitive"))
    assert(out.get(2L).contains("incompressible"))
    assert(!out.contains(3L))
  }

  test("t16: flag set on the real corpus is a strict, nonempty subset") {
    val docs = Tables.documents(spark, sf)
    val total = docs.filter(col("text").isNotNull).count()
    val flagged = SparkEntry.queries("t16_compress_filter")(spark, sf)
    val n = flagged.count()
    assert(n > 0 && n < total)
    // integer fixed-point: ratio recomputes exactly from the row
    flagged.collect().foreach { r =>
      assert(r.getLong(3) === r.getLong(2) * 10000 / r.getLong(1))
    }
  }

  test("t17: hierarchical rank bucket ≡ Spark's own ntile window") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sf)
    val scored = TextAnalysis.bigramLm(docs)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("avg_typ").desc, col("doc_id"))
    val ref = scored
      .withColumn("bucket", ntile(TextAnalysis.PplBuckets).over(w)
        .cast("long"))
      .groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_bigrams")).as("nb"),
        min(col("avg_typ")).as("mn"), max(col("avg_typ")).as("mx"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    val got = TextAnalysis.pplBuckets(docs).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(got === ref,
      "range-bucket rank + ntile arithmetic must equal the plain window")
  }

  test("t17: buckets partition each language; NULL lang is a partition") {
    import spark.implicits._
    val hostile = Seq(
      (9001L, null.asInstanceOf[String], "en"),
      (9002L, "solo", "en"), // 1 token → no bigram → excluded
      (9003L, "null lang text here", null.asInstanceOf[String]),
      (9004L, "more null lang words", null.asInstanceOf[String]),
      (9005L, "third null lang entry", null.asInstanceOf[String]))
      .toDF("doc_id", "text", "lang")
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang").unionByName(hostile)
    val out = TextAnalysis.pplBuckets(docs).collect()
    val nullRows = out.filter(_.isNullAt(0))
    assert(nullRows.map(_.getLong(2)).sum === 3L,
      "three NULL-lang docs with bigrams must land in NULL buckets")
    assert(nullRows.map(_.getLong(1)).distinct.length === 3,
      "3 docs over 3 buckets: ntile gives one doc per bucket")
    // per lang: bucket sizes differ by at most one (ntile contract)
    out.groupBy(r => Option(r.getString(0))).foreach { case (_, rs) =>
      val sizes = rs.map(_.getLong(2))
      assert(sizes.max - sizes.min <= 1)
    }
  }
}

/** Independent in-memory BPE: pair counts weighted by word frequency,
  * (count DESC, left ASC, right ASC) ranking, greedy leftmost-first
  * fuse — the exact contract t13 implements distributively.
  */
object BpeRef {
  def merges(words: Seq[(String, Long)],
      n: Int): Seq[(Int, String, String, Long)] = {
    var syms: Seq[(List[String], Long)] =
      words.map { case (w, c) => (w.map(_.toString).toList, c) }
    val out = scala.collection.mutable.ListBuffer
      .empty[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= n && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      syms.foreach { case (s, c) =>
        s.zip(s.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + c)
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.toSeq
          .minBy { case ((l, r), cnt) => (-cnt, l, r) }
        out += ((rank, a, b, c))
        syms = syms.map { case (s, wc) =>
          val buf = scala.collection.mutable.ListBuffer.empty[String]
          var i = 0
          while (i < s.length) {
            if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
              buf += a + b; i += 2
            } else { buf += s(i); i += 1 }
          }
          (buf.toList, wc)
        }
        rank += 1
      }
    }
    out.toSeq
  }
}

class QualityRulesSpec extends AnyFunSuite {
  import TestSpark._
  import org.apache.spark.sql.functions._

  test("t19: each planted pathology fails exactly its rule; clean doc is kept") {
    import spark.implicits._
    val good = ("the cat is of the dog and a bird sat on the mat " +
      "while the sun was up and the day was long and the road was " +
      "dry so the walk was easy and the air was warm").trim
    val planted = Seq(
      (1L, good),                                   // passes everything
      (2L, "the a of and to in is short"),          // < 20 words
      (3L, ("the word " * 60).trim),                // > 80 words
      (4L, ("a " * 20).trim + " " +                 // mean word len 17.5
        ("supercalifragilisticexpialidocious " * 20).trim),
      (5L, ("the 123 456 789 " * 8).trim),          // digits: alpha share low
      (6L, ("the ### ... ## " * 8).trim),           // symbol-heavy
      (7L, (1 to 15).map(i => s"- bullet line the").mkString("\n")),
      (8L, ("lorem ipsum dolor sit amet word " * 5).trim), // no stopwords
      (9L, null.asInstanceOf[String]))              // NULL: fails all
    val docs = planted.toDF("doc_id", "text")
    val census = graft.operators.TextAnalysis.qualityRules(docs)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(census("__kept__") === 1L, s"only doc 1 passes: $census")
    // every rule's violation count includes the NULL doc plus its
    // own planted pathology (some pathologies trip a second rule —
    // the doc-4 long words also sink mean length and alpha share is
    // unaffected; assert the targeted minimum per rule)
    assert(census("min_words") >= 2L)   // doc 2 + null
    assert(census("max_words") >= 2L)   // doc 3 + null
    assert(census("mean_word_len") >= 2L) // doc 4 + null
    assert(census("alpha_words") >= 2L) // doc 5 + null
    assert(census("symbol_ratio") >= 2L) // doc 6 + null
    assert(census("bullet_lines") >= 2L) // doc 7 + null
    assert(census("stopwords") >= 2L)   // doc 8 + null
    // the NULL doc fails every rule (coalesce-to-fail discipline):
    // census totals with doc 9 removed must each drop by exactly 1
    val noNull = graft.operators.TextAnalysis
      .qualityRules(docs.filter(col("doc_id") =!= 9L))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    noNull.keys.filterNot(_ == "__kept__").foreach { rule =>
      assert(census(rule) - noNull(rule) === 1L,
        s"null doc must count against $rule")
    }
  }

  test("t19: census is one scan and one metadata-size exchange") {
    val df = graft.operators.TextAnalysis.qualityRules(
      Tables.documents(spark, sf))
    val plan = df.queryExecution.executedPlan.toString
    // one documents scan, no window, no join: scan -> partial agg ->
    // single-row final agg -> stack generate
    assert(!plan.contains("WindowExec") && !plan.contains("Join"),
      plan.linesIterator.take(12).mkString("\n"))
    assert(plan.split("FileScan parquet").length - 1 === 1,
      "census must cost exactly one corpus scan")
    val rows = df.collect()
    assert(rows.length === 8, "7 rules + __kept__")
    assert(rows.map(_.getLong(1)).forall(_ >= 0L))
  }

}
