package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities. AQE's runtime skew-join splitting
  * handles sort-merge joins; these cover the two shapes it does not:
  * a shuffled hash/merge join against a NON-broadcastable dimension
  * where one fact key dominates, and a groupBy whose hot key funnels
  * into one reducer during the FIRST shuffle (AQE can only split
  * what is already shuffled).
  *
  * Salting never changes results — the salt is a join/grouping
  * refinement that any value satisfies — so the utilities take the
  * cheap deterministic route: the salt is a hash of a per-row column.
  */
object Skew {

  /** Salted fact⋈dim equi-join: facts pick a salt in [0, salts),
    * the dim replicates `salts`× with every salt value, and the join
    * key becomes (key, salt) — a hot fact key's rows land on `salts`
    * reducers instead of one. Dim-side cost is the replication
    * factor, so choose salts ≈ hot-key skew factor, not 1000.
    */
  def saltedJoin(facts: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, saltSource: String, salts: Int): DataFrame = {
    val saltedFacts = facts.withColumn("_salt",
      pmod(xxhash64(col(saltSource)), lit(salts.toLong)))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    saltedFacts
      .join(saltedDim,
        saltedFacts(factKey) === saltedDim(dimKey) &&
          saltedFacts("_salt") === saltedDim("_salt"))
      .drop("_salt")
  }

  /** Two-phase salted aggregation: phase 1 on (key, salt) splits the
    * hot key across reducers, phase 2 merges per key. Correct for
    * algebraic aggregates (sum/count here); partial aggregation
    * already handles most skew map-side, so this is for the
    * high-cardinality-accumulator cases (collect/distinct-ish) where
    * map-side combine cannot shrink the hot key.
    */
  def saltedSumCount(df: DataFrame, keyCol: String, valueCol: String,
      saltSource: String, salts: Int): DataFrame =
    df
      .withColumn("_salt", pmod(xxhash64(col(saltSource)), lit(salts.toLong)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(keyCol))
      .agg(sum(col("_psum")).as(s"sum_$valueCol"),
        sum(col("_pcnt")).as("n_rows"))

  /** q27_skew_agg — the two-phase salted aggregation under a
    * MANUFACTURED hot key, oracle-checked: 80% of events collapse to
    * key −1 (the "one user is a bot farm" shape every event table
    * grows), and the salted plan must produce the identical totals a
    * plain GROUP BY yields. Phase 1 spreads the hot key over `salts`
    * reducers on the (key, salt) shuffle; phase 2 merges `salts`
    * partial rows per key — the exact pattern for skew the FIRST
    * shuffle must absorb (AQE can only split joins, not the initial
    * aggregation funnel). Sums are integer cents, so the oracle
    * hash-matches.
    */
  def skewAgg(events: DataFrame, salts: Int = 8): DataFrame =
    saltedSumCount(
      events.select(
        when(col("user_id") < 120, lit(-1L)).otherwise(col("user_id"))
          .as("k"),
        round(col("value") * 100, 0).cast("long").as("cents"),
        col("event_id")),
      "k", "cents", "event_id", salts)
      .select(col("k"), (col("sum_cents") / 100.0).as("sum_value"),
        col("n_rows"))
}
