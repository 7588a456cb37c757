package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-predecessor) join — the genomics "closest upstream
  * feature" assignment (the reference annotates reads against the
  * nearest feature when counting, /root/reference/tools.py:625
  * htseq-count's nearest-TSS mode) and the event-pipeline "attribute
  * to most recent signup" lookup, as one operator.
  *
  * Spark has no ASOF JOIN (DuckDB/Pandas do). The naive encodings
  * both fail at scale: an inequality theta-join (`f.ts >= a.ts`)
  * plans as BroadcastNestedLoop — O(|facts|·|anchors|) — and a
  * windowed candidate join replicates every anchor into every later
  * fact's candidate set before a per-fact argmax. The scalable
  * encoding is UNION + CARRY-FORWARD: tag anchors, union them with
  * the facts, and run one `last(anchor_ts, ignoreNulls)` window over
  * (key, ts). That is a single hash shuffle on the key — the same
  * exchange any per-key operator pays — followed by an in-partition
  * sort; no row is ever replicated, state per row is ONE carried
  * value, and skew follows the key's own distribution (a hot key
  * costs its own sort, nothing cross-key).
  *
  * Tie rule: anchors sort BEFORE facts at equal ts
  * (`_anchor_flag` descending), so a fact at t matches an anchor at
  * exactly t — the inclusive `f.ts >= a.ts` contract of DuckDB's
  * ASOF JOIN, which is what the oracle runs. Anchors are first
  * deduplicated to distinct (key, ts): which duplicate wins is
  * unobservable when only the anchor timestamp is carried, and the
  * dedup keeps the union side minimal.
  */
object Asof {

  /** Append `anchorTsOut` = max anchor ts ≤ fact ts (per key) to
    * every fact row; null when the key has no prior anchor. `tsCol`
    * must be totally ordered (epoch micros here); facts keep their
    * full schema.
    */
  def asofJoin(facts: DataFrame, anchors: DataFrame, keyCol: String,
      tsCol: String, anchorTsOut: String = "anchor_ts"): DataFrame = {
    val payload = struct(facts.columns.map(col): _*)
    val f = facts.select(
      col(keyCol).as("_k"), col(tsCol).as("_t"),
      lit(0).as("_anchor_flag"), payload.as("_payload"))
    val payloadType = f.schema("_payload").dataType
    val a = anchors.select(col(keyCol).as("_k"), col(tsCol).as("_t"))
      .distinct()
      .select(col("_k"), col("_t"), lit(1).as("_anchor_flag"),
        lit(null).cast(payloadType).as("_payload"))
    val carry = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_anchor_flag").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    f.unionByName(a)
      .withColumn("_a_ts",
        last(when(col("_anchor_flag") === 1, col("_t")), ignoreNulls = true)
          .over(carry))
      .filter(col("_anchor_flag") === 0)
      .select(col("_payload.*"), col("_a_ts").as(anchorTsOut))
  }

  /** q25_asof_anchor — attribute every non-anchor event to the
    * user's most recent `anchorType` event at-or-before it (the
    * reference's per-sample bookkeeping joins each processing step
    * back to the sample's registration row, tools.py:8 log matrix).
    * `gap_us` is the attribution latency; null anchor ⇒ the event
    * predates every anchor for that user.
    */
  def eventAsofAnchor(events: DataFrame,
      anchorType: String = "signup"): DataFrame = {
    val e = events.select(col("event_id"), col("user_id"),
      col("event_type"), graft.Tables.epochUs(col("ts")).as("ts_us"))
    val facts = e.filter(col("event_type") =!= anchorType)
    val anchors = e.filter(col("event_type") === anchorType)
    asofJoin(facts, anchors, "user_id", "ts_us", "anchor_ts_us")
      .withColumn("gap_us", col("ts_us") - col("anchor_ts_us"))
  }
}
