package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large⋈large equi-joins (SURVEY §6 scale rules).
  *
  * A shuffle join hash-partitions both sides on the key; one hot key
  * sends its entire row set to ONE reducer, and that task's runtime
  * bounds the stage. AQE's skew-join split handles this when statistics
  * surface it at runtime; `saltedJoin` is the deterministic plan-level
  * form for when the skew is known (the classic fact⋈dim case where
  * the dim is too big to broadcast):
  *
  *  - the skewed (fact) side gets `salt = pmod(hash(saltBy), salts)` —
  *    a deterministic spread of the hot key's rows over `salts`
  *    sub-partitions (any high-cardinality column works as `saltBy`;
  *    a unique id is ideal);
  *  - the other (dim) side is exploded `salts`× so every sub-partition
  *    finds its dim row;
  *  - the join key becomes `(key, salt)`, so the hot key's rows land on
  *    `salts` reducers instead of one.
  *
  * Cost: dim side inflates `salts`× through the shuffle — cheap when
  * |dim| ≪ |fact|, which is exactly the skewed case. Result equality
  * with the plain join is pinned in ScaleHardeningSpec.
  */
object Skew {

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int, saltBy: Column): DataFrame =
    saltedJoin(fact, dim, Seq(key), salts, saltBy)

  /** Composite-key form (e.g. the (w1, w2) bigram-model join).
    * `joinType` admits the outer-preserving forms where the FACT side
    * is the preserved side (`left`/`left_outer`, `left_semi`,
    * `left_anti`, and `inner`): salting is result-invariant for those
    * because every fact row carries exactly one salt and the exploded
    * dim covers all salt values, so per-key match existence is
    * unchanged. Right/full outer would duplicate unmatched DIM rows
    * `salts`× — rejected. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      salts: Int, saltBy: Column, joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(keys.nonEmpty, "saltedJoin needs at least one key column")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")
      .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin: joinType must preserve the fact side (got $joinType)")
    // a user column named __salt would be silently overwritten (and
    // dropped from the output) — grow the name until it is free. (If
    // BOTH inputs carry a same-named user column the join output keeps
    // both, ambiguous to reference — standard Spark join behavior for
    // shared non-key names, unchanged here.)
    var salt = "__salt"
    while (fact.columns.contains(salt) || dim.columns.contains(salt)) salt += "_"
    val saltedFact = fact.withColumn(salt, pmod(hash(saltBy), lit(salts)))
    val explodedDim = dim.withColumn(salt,
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(explodedDim, keys :+ salt, joinType).drop(salt)
  }
}
