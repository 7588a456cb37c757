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

  /** Directional, tolerance-bounded as-of — the rest of the
    * merge_asof API surface (pandas: direction backward/forward/
    * nearest + tolerance; DuckDB ASOF JOIN is backward-only):
    * "closest feature within 5 kb, either side" in the genomics
    * reading, "attribute to nearest campaign touch within the
    * window" in the events reading. q25's carry encoding extended
    * with a SECOND carry running the opposite way: the same single
    * key exchange now feeds two in-partition sorts (ts, flag desc)
    * and (ts, flag asc) — the flag orders make BOTH directions
    * inclusive at equal ts — and each row carries exactly two
    * values (prev/next anchor ts). Still no row replication, still
    * O(n log n) per key; the tolerance and the nearest-pick are
    * map-side arithmetic on the carried pair. Ties (equal gap both
    * ways) resolve BACKWARD — deterministic and documented, where
    * pandas leaves it to insertion order.
    */
  def asofTolerance(facts: DataFrame, anchors: DataFrame,
      keyCol: String, tsCol: String, direction: String = "nearest",
      toleranceUs: Long = Long.MaxValue,
      anchorTsOut: String = "anchor_ts"): DataFrame = {
    require(Seq("backward", "forward", "nearest").contains(direction),
      s"unknown direction $direction")
    val payload = struct(facts.columns.map(col): _*)
    val f = facts.select(
      col(keyCol).as("_k"), col(tsCol).as("_t"),
      lit(0).as("_anchor_flag"), payload.as("_payload"))
    val payloadType = f.schema("_payload").dataType
    val a = anchors.select(col(keyCol).as("_k"), col(tsCol).as("_t"))
      .distinct()
      .select(col("_k"), col("_t"), lit(1).as("_anchor_flag"),
        lit(null).cast(payloadType).as("_payload"))
    val back = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_anchor_flag").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_anchor_flag").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val anchorTs = when(col("_anchor_flag") === 1, col("_t"))
    val carried = f.unionByName(a)
      .withColumn("_prev", last(anchorTs, ignoreNulls = true).over(back))
      .withColumn("_next", first(anchorTs, ignoreNulls = true).over(fwd))
      .filter(col("_anchor_flag") === 0)
    val gapB = col("_t") - col("_prev")
    val gapF = col("_next") - col("_t")
    val okB = col("_prev").isNotNull && gapB <= toleranceUs
    val okF = col("_next").isNotNull && gapF <= toleranceUs
    val picked = direction match {
      case "backward" => when(okB, col("_prev"))
      case "forward" => when(okF, col("_next"))
      case "nearest" =>
        when(okB && okF,
          when(gapB <= gapF, col("_prev")).otherwise(col("_next")))
          .when(okB, col("_prev"))
          .when(okF, col("_next"))
    }
    carried
      .withColumn("_a_ts", picked)
      .select(col("_payload.*"), col("_a_ts").as(anchorTsOut))
  }

  /** q42_asof_tolerance — q25's attribution under the full dial:
    * nearest signup either side, but only within `toleranceUs` (an
    * attribution window — a touch nine months away is not a cause).
    * gap_us is SIGNED (fact − anchor): positive = anchor precedes
    * (backward match), negative = anchor follows. Null anchor ⇒ no
    * signup within the window on either side.
    */
  def eventAsofTolerance(events: DataFrame,
      anchorType: String = "signup",
      toleranceUs: Long = 21600000000L): DataFrame = {
    val e = events
      .filter(col("ts").isNotNull && col("user_id").isNotNull)
      .select(col("event_id"), col("user_id"),
        col("event_type"), graft.Tables.epochUs(col("ts")).as("ts_us"))
    val facts = e.filter(col("event_type") =!= anchorType)
    val anchors = e.filter(col("event_type") === anchorType)
    asofTolerance(facts, anchors, "user_id", "ts_us",
      direction = "nearest", toleranceUs = toleranceUs,
      anchorTsOut = "anchor_ts_us")
      .withColumn("gap_us", col("ts_us") - col("anchor_ts_us"))
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
