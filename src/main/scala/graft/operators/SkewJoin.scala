package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for pathological key skew.
  *
  * AQE's skew-join splitting already handles most skew at runtime (it splits
  * oversized SORT-MERGE partitions by input bytes), but two cases escape it:
  * a skewed SHUFFLE_HASH/broadcast-ineligible join where one build key
  * dominates, and pipelines that disable AQE (e.g. fixed partitioning
  * contracts for downstream `mapPartitions` state). Salting is the explicit,
  * planner-independent fix: the big side's hot keys spread over `nSalts`
  * subpartitions, the small side replicates `nSalts`× so every subpartition
  * still finds its match. Shuffle of the big side is unchanged in bytes but
  * max-task size drops ~`nSalts`×; the small side pays an `nSalts`×
  * replication (keep it the DIMENSION side).
  *
  * The salt is `pmod(xxhash64(monotonically_increasing_id()), n)` — derived
  * from row identity, not the join key (same-key rows MUST spread) and not
  * `rand()` (non-deterministic under task retry, which can duplicate or drop
  * rows in a recomputed partition; xxhash64 of the partition-stable id is
  * retry-stable within a job).
  */
object SkewJoin {

  /** Inner/left equi-join `big ⋈ small` on `keys`, with the big side salted
    * `nSalts` ways. Result columns = `big.*` ++ (`small.*` minus keys),
    * exactly like `big.join(small, keys, joinType)`.
    *
    * @param joinType "inner" or "left" (the salt trick preserves exactly
    *                 these; right/full would need the salt on the other side)
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      keys: Seq[String],
      nSalts: Int,
      joinType: String = "inner"): DataFrame = {
    require(nSalts >= 1, s"nSalts must be >= 1, got $nSalts")
    require(Set("inner", "left").contains(joinType),
      s"saltedJoin supports inner/left, got $joinType")
    val SALT = "_graft_salt"
    val salted = big.withColumn(
      SALT, pmod(xxhash64(monotonically_increasing_id()), lit(nSalts)))
    val replicated = small.withColumn(
      SALT, explode(array((0 until nSalts).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, keys :+ SALT, joinType).drop(SALT)
  }
}
