package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large joins.
  *
  * AQE's skew-join handles most cases at runtime; explicit salting is
  * the deterministic fallback when one join key dominates (the classic
  * hot-key problem at 100 TB: one user/document id owning a double-digit
  * percentage of rows).
  */
object Skew {

  /** Join types where replicating the non-skewed side is sound: the
    * skewed (left) side carries ONE salt per row, so left-preserving
    * semantics hold, but an unmatched RIGHT row exists once per replica —
    * right_outer/full would emit it `salts` times.
    */
  private val SafeJoinTypes =
    Set("inner", "left", "leftouter", "leftsemi", "semi", "leftanti", "anti")

  /** Per-row salt in [0, salts): position-derived, NOT content-derived —
    * fully identical duplicate rows of one hot key (the pathological case
    * salting exists for) still land in different buckets, because the salt
    * hashes the row's partition-local id, not its columns. Deterministic
    * per run (same input partitioning → same ids), and the nondeterminism
    * flag on monotonically_increasing_id pins it to ONE evaluation — the
    * optimizer can't duplicate it below a filter and desync the join.
    */
  private[graft] def saltColumn(salts: Int): Column =
    pmod(hash(monotonically_increasing_id()), lit(salts))

  /** Salted equi-join: each row of the skewed (large) side gets a
    * position-derived salt ([[saltColumn]]); the small side is replicated
    * across all salt values. Key cardinality × `salts` partitions — hot
    * keys split `salts` ways, even when the hot key's rows are identical.
    * Right-preserving join types are rejected (see [[SafeJoinTypes]]).
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String, salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(SafeJoinTypes.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left/semi/anti join types only; '$joinType' would " +
        "duplicate unmatched rows of the replicated side")
    // explicit aliases: when both sides derive from the SAME parent frame
    // (e.g. a dim aggregated out of the fact table), bare df(col) apply
    // resolves to identical attribute ids — Spark warns "trivially true
    // equals predicate" and leans on self-join disambiguation heuristics.
    val saltedLeft = skewed.withColumn("__salt", saltColumn(salts)).as("__sj_l")
    val replicatedRight = other.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)))).as("__sj_r")
    saltedLeft.join(replicatedRight,
        col("__sj_l.__salt") === col("__sj_r.__salt")
          && col(s"__sj_l.`$key`") === col(s"__sj_r.`$key`"),
        joinType)
      .drop("__salt")
  }

  /** Key-frequency profile: the top-n heaviest join keys with their row
    * share. ONE scan: the total is a 1-row re-aggregate of the per-key
    * counts, crossJoin'ed back in — both branches share the identical
    * groupBy subtree, so the per-key shuffle is planned once and the
    * second branch is a ReusedExchange, never a second pass over `df`
    * (which is, by construction, the biggest table in the house).
    */
  def keyProfile(df: DataFrame, key: String, topN: Int = 20): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(lit(1)).as("rows"))
    val total = counts.agg(sum(col("rows")).cast("double").as("__total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share", col("rows") / col("__total"))
      .drop("__total")
      .orderBy(col("rows").desc)
      .limit(topN)
  }
}
