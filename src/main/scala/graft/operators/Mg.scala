package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Misra-Gries heavy-hitter summaries as FIRST-CLASS relational state — the
  * fifth member of the engine's sketch family (HLL distinct, CMS frequency,
  * KMV set-ops, q-digest quantiles, and now BOUNDED-STATE top items). The
  * complement to the exact t08 top-terms pass, whose carried state is
  * vocabulary-sized: an MG summary is ≤ k+1 rows per group FOREVER, however
  * adversarial the vocabulary — the register a 100 TB ingest can afford to
  * fold day over day.
  *
  * North-star extension (not in the reference). Construction is the
  * ORDER-INDEPENDENT offset form of Misra-Gries (the canonical summary of
  * Agarwal et al., "Mergeable Summaries", PODS'12/TODS'13): from exact
  * per-item counts, subtract the (k+1)-th largest count `t` and keep the
  * ≤ k items left positive. A multiset order statistic is tie-invariant, so
  * the summary is a pure function of the input multiset — deterministic
  * across partitionings, cache/AQE/retry-safe, and bit-replayable by a
  * DuckDB oracle (integer arithmetic end to end). [[merge]] sums weights by
  * item and re-truncates against the combined (k+1)-th largest — the exact
  * mergeable-summaries rule, under which error budgets ADD.
  *
  * Contract: for every item x, `w(x) ≤ true_count(x) ≤ w(x) + err` where
  * `err` = the summed truncation offsets (carried IN the state), and
  * `err ≤ Σᵢ nᵢ/(k+1)` over constituent builds/merges — the classic MG
  * guarantee. Items absent from the summary have true count ≤ err.
  *
  * State shape: `(keys*, _item, _w, _n, _terr)` — ≤ k item rows plus one
  * `_item IS NULL` sentinel row per group (weight 0) that keeps the group's
  * total `_n` and error budget `_terr` alive even when truncation empties
  * the item set (all-ties inputs legitimately truncate to zero items).
  *
  * Scale shape: [[summarize]]'s count pass is ONE map-side-combined
  * aggregate (shuffle ∝ batch vocabulary — the unavoidable cost of exact
  * batch counts, same as t08's single pass); the (k+1)-th-largest selection
  * rides [[TopK.perGroup]]'s two-pass local-prune rank, so no per-group
  * vocabulary-sized sort window exists anywhere. [[merge]] touches ≤
  * 2(k+1) rows per group. Nothing downstream of the first aggregate ever
  * touches the corpus. */
object Mg {

  private def checkK(k: Int): Unit =
    require(k >= 1 && k <= 100000, s"k must be in [1, 100000], got $k")

  /** Truncate an exact count frame `(keys*, _item, _c)` to the ≤ k-row MG
    * summary, folding in prior meta `(keys*, _n, _terr)` (use
    * [[summarize]]/[[merge]] unless composing manually). */
  private def truncate(
      counts: DataFrame, meta: DataFrame, keys: Seq[String], k: Int): DataFrame = {
    val t = TopK.perGroup(
        counts, keys, Seq(col("_c").desc, col("_item").asc), k + 1)
      .where(col("rank") === k + 1)
      .select((keys.map(col) :+ col("_c").as("_t")): _*)
    val withT = counts
      .join(t, keys, "left")
      .na.fill(0L, Seq("_t"))
    val items = withT
      .where(col("_c") - col("_t") > 0)
      .select((keys.map(col) :+ col("_item") :+
        (col("_c") - col("_t")).as("_w") :+ col("_t")): _*)
      .join(meta, keys)
      .select((keys.map(col) :+ col("_item") :+ col("_w") :+ col("_n") :+
        (col("_terr") + col("_t")).as("_terr")): _*)
    val sentinel = meta
      .join(t, keys, "left").na.fill(0L, Seq("_t"))
      .select((keys.map(col) :+ lit(null).cast("string").as("_item") :+
        lit(0L).as("_w") :+ col("_n") :+
        (col("_terr") + col("_t")).as("_terr")): _*)
    items.unionByName(sentinel)
  }

  /** Build the MG-k summary of `itemCol` per `keys` from raw rows. Null
    * items are excluded; a group with no rows yields no state. */
  def summarize(
      df: DataFrame, keys: Seq[String], itemCol: String, k: Int): DataFrame = {
    checkK(k)
    require(keys.nonEmpty, "keys must be non-empty")
    val counts = df.where(col(itemCol).isNotNull)
      .select((keys.map(col) :+ col(itemCol).cast("string").as("_item")): _*)
      .groupBy((keys :+ "_item").map(col): _*)
      .agg(count(lit(1)).as("_c"))
    val meta = counts.groupBy(keys.map(col): _*)
      .agg(sum("_c").as("_n"), lit(0L).as("_terr"))
    truncate(counts, meta, keys, k)
  }

  /** Merge two MG-k summaries (same keys/k): sum weights per item,
    * re-truncate at the combined (k+1)-th largest; totals and error
    * budgets add, plus the new truncation offset. Deterministic given the
    * inputs; the merged summary satisfies the MG contract for the union
    * with `err ≤ errA + errB + n/(k+1)`. */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String], k: Int): DataFrame = {
    checkK(k)
    val u = a.unionByName(b)
    val counts = u.where(col("_item").isNotNull)
      .groupBy((keys :+ "_item").map(col): _*)
      .agg(sum("_w").as("_c"))
    val meta = u.groupBy(keys.map(col): _*)
      .agg(sum(when(col("_item").isNull, col("_n")).otherwise(0L)).as("_n"),
        sum(when(col("_item").isNull, col("_terr")).otherwise(0L)).as("_terr"))
    truncate(counts, meta, keys, k)
  }

  /** Fold a summary to its report: one row per surviving heavy item with
    * the two-sided count bracket `(w_min = _w, w_max = _w + err)`, the
    * group total `n`, and the error budget — everything a consumer needs
    * to decide whether the bracket is tight enough to act on. */
  def estimate(state: DataFrame, keys: Seq[String]): DataFrame =
    state.where(col("_item").isNotNull)
      .select((keys.map(col) :+ col("_item").as("item") :+
        col("_w").as("w_min") :+ (col("_w") + col("_terr")).as("w_max") :+
        col("_n").as("n") :+ col("_terr").as("err_budget")): _*)
}
