package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.RollingMinHash
import graft.operators.{Dedup, Multimodal, TextAnalysis}

/** The driver's testdata is pure ASCII, so the byte-level kernels'
  * multi-byte UTF-8 paths (fingerprint windows, payload probes,
  * checksums) are never exercised by the oracle gate — this spec
  * plants CJK / emoji / combining-mark text and checks every
  * byte-level operator against a direct recompute from
  * `getBytes("UTF-8")`.
  */
class UnicodeSpec extends AnyFunSuite {
  import TestSpark._

  private val texts = Seq(
    1L -> "die straße führt über die brücke — ökologisch!",
    2L -> "机器学习模型需要大量高质量的训练数据才能表现良好",
    3L -> "🚀 emoji soup 🎉🎊 with 🐍 and 🦀 mixed in",
    4L -> "élève avec des accents décomposés",
    5L -> "mixed ascii and 中文 and عربى and русский text")

  private def docs = {
    import spark.implicits._
    texts.toDF("doc_id", "text")
  }

  test("t04 fingerprint matches the interpreted kernel on UTF-8 bytes") {
    val got = TextAnalysis.fingerprint(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    texts.foreach { case (id, t) =>
      assert(got(id) ===
        RollingMinHash.compute(t.getBytes("UTF-8"), 16, 31L, 1000000007L))
    }
  }

  test("m01 metadata counts BYTES, not characters") {
    val got = Multimodal.multimodalMeta(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    texts.foreach { case (id, t) =>
      val bytes = t.getBytes("UTF-8")
      assert(got(id)._1 === bytes.length.toLong)
      assert(bytes.length > t.length, s"doc $id should be multi-byte")
      assert(got(id)._2 ===
        bytes.take(4).map(b => f"${b & 0xff}%02x").mkString)
    }
  }

  test("m03 resize checksum folds the UTF-8 byte stream") {
    val got = Multimodal.resize(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(4))).toMap
    texts.foreach { case (id, t) =>
      val bytes = t.getBytes("UTF-8")
      val stride = math.max(1L, (bytes.length + 63L) / 64L)
      val ck = bytes.indices.filter(_ % stride == 0).zipWithIndex
        .map { case (p, i) => (i + 1L) * (bytes(p) & 0xff) }
        .sum % 1000000007L
      assert(got(id) === ((bytes.length.toLong, ck)))
    }
  }

  test("dedup and text analysis survive multi-byte text") {
    assert(Dedup.dedupExact(docs).count() === texts.length.toLong)
    assert(TextAnalysis.tokenCount(docs).count() === texts.length.toLong)
    assert(TextAnalysis.qualityScore(docs).count() === texts.length.toLong)
    Dedup.dedupMinhash(docs).collect()
    Dedup.dedupSimhash(docs).collect()
  }
}
