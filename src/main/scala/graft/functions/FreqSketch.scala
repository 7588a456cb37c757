package graft.functions

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.io.ByteArrayInputStream

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable frequent-items (heavy-hitters) sketch — Misra–Gries
  * summaries as a native Catalyst aggregate.
  *
  * The exact top-k operators (q15/q26) need a full groupBy over the
  * key space — at 100 TB a continuously-monitored "most frequent
  * items" readout cannot pay that shuffle per refresh. Misra–Gries
  * with k counters guarantees: every item with true frequency
  * > n/(k+1) is present in the summary, and each estimate undercounts
  * by at most n/(k+1) (Misra & Gries 1982; mergeability per Agarwal
  * et al., "Mergeable Summaries", PODS 2012). Spark's partial
  * aggregation gives the distributed shape for free: each map task
  * folds its partition into a k-entry buffer, and only the k-entry
  * buffers — never the items — cross the wire to merge. The analog
  * in the reference is its progress-matrix "which step fails most
  * often" readout over the run log (/root/reference/tools.py:28-56),
  * which scans the whole log table each refresh.
  *
  * The pure-Scala kernel lives in [[MisraGriesOps]] so the ScalaCheck
  * superset/merge properties test the exact code the executor runs.
  */
object FreqSketch {

  /** Column API: `array<struct<item string, est bigint>>` of at most
    * k entries, sorted (est desc, item asc). Candidate guarantee:
    * contains every item with frequency > n/(k+1) of the group's n.
    */
  def misraGries(item: Column, k: Int): Column =
    Shim.column(MisraGries(Shim.expression(item), k).toAggregateExpression())
}

/** The Misra–Gries kernel as pure functions over a mutable counter
  * map — shared verbatim by the aggregate's update/merge paths and
  * the ScalaCheck properties.
  */
object MisraGriesOps {

  type Buf = mutable.HashMap[String, Long]

  /** One item into a k-counter summary: increment if tracked, insert
    * if a counter is free, else decrement-all (the amortized-O(1)
    * step that buys the n/(k+1) error bound).
    */
  def update(buf: Buf, item: String, k: Int): Unit = {
    buf.get(item) match {
      case Some(c) => buf.update(item, c + 1)
      case None if buf.size < k => buf.update(item, 1L)
      case None =>
        // decrement every counter by 1, dropping zeros — the item
        // itself is absorbed by the same decrement (classic MG step).
        val dead = mutable.ArrayBuffer.empty[String]
        buf.mapValuesInPlace((_, c) => c - 1)
        buf.foreach { case (key, c) => if (c <= 0) dead += key }
        dead.foreach(buf.remove)
    }
  }

  /** Merge two summaries (Agarwal et al. §3.1): sum counts, then if
    * more than k survive, subtract the (k+1)-th largest count from
    * all and drop non-positives — error bounds add, mergeability is
    * exact (order- and shape-independent up to the bound).
    */
  def merge(a: Buf, b: Buf, k: Int): Buf = {
    b.foreach { case (key, c) => a.update(key, a.getOrElse(key, 0L) + c) }
    if (a.size > k) {
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - k - 1) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[String]
      a.mapValuesInPlace((_, c) => c - cut)
      a.foreach { case (key, c) => if (c <= 0) dead += key }
      dead.foreach(a.remove)
    }
    a
  }

  /** Deterministic readout: (est desc, item asc). */
  def sorted(buf: Buf): Seq[(String, Long)] =
    buf.toSeq.sortBy { case (item, est) => (-est, item) }
}

/** `TypedImperativeAggregate` over string items. The buffer is the
  * counter map itself (≤ k entries); serialize writes (size, then
  * UTF-8 length-prefixed key + count per entry) — at most k
  * entries ever serialize, regardless of input size.
  */
case class MisraGries(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MisraGriesOps.Buf]
  with UnaryLike[Expression] {

  require(k >= 1, s"MisraGries needs k >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"misra_gries requires string items, got ${other.sql}")
  }

  override def createAggregationBuffer(): MisraGriesOps.Buf =
    mutable.HashMap.empty[String, Long]

  override def update(buf: MisraGriesOps.Buf, input: InternalRow):
      MisraGriesOps.Buf = {
    val v = child.eval(input)
    // UTF8String.toString copies out of the (reused) row buffer.
    if (v != null) MisraGriesOps.update(buf, v.toString, k)
    buf
  }

  override def merge(buf: MisraGriesOps.Buf, other: MisraGriesOps.Buf):
      MisraGriesOps.Buf = MisraGriesOps.merge(buf, other, k)

  override def eval(buf: MisraGriesOps.Buf): Any =
    new GenericArrayData(MisraGriesOps.sorted(buf).map { case (item, est) =>
      InternalRow(UTF8String.fromString(item), est)
    }.toArray[Any])

  override def serialize(buf: MisraGriesOps.Buf): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (item, c) =>
      val b = item.getBytes("UTF-8")
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bytes.toByteArray
  }

  override def deserialize(storage: Array[Byte]): MisraGriesOps.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(storage))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    (0 until n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, "UTF-8"), in.readLong())
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false))))

  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(offset: Int): MisraGries =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): MisraGries =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildInternal(newChild: Expression): MisraGries =
    copy(child = newChild)

  override def prettyName: String = "misra_gries"
}
