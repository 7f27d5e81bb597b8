package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global running totals and training-sequence packing.
  *
  * A GLOBAL prefix sum (`sum over (order by …)` with no partition key) is
  * the one window shape Spark executes on a SINGLE task — `WindowExec` with
  * an empty partition spec pulls the whole dataset through one sort, the
  * canonical 100 TB scale bug (the engine's other windows all partition).
  * [[globalRunningSum]] is the distributed form: range-partition by the
  * ordering, local prefix sums within each bounded slice, then add each
  * slice's broadcast offset (the exclusive prefix sum of per-slice totals —
  * partitions + 1 rows, never the data). Same two-pass count-then-place
  * pattern as [[Quantiles.exactGrouped]] and [[TopK.perGroup]].
  *
  * [[packSequences]] uses it for the standard pretraining packing: order
  * documents deterministically (hash order — decorrelates sequence content
  * from crawl order), concatenate token counts, cut every `maxTokens`. A
  * document's sequence id is the bin its FIRST token lands in; documents
  * straddling a boundary continue into the next sequence (how GPT-style
  * packing slices the token stream — no padding, no first-fit heuristics,
  * fully deterministic and order-independent of physical layout).
  */
object Packing {

  /** `outCol` = inclusive running sum of `valueCol` over the TOTAL order
    * given by `orderCols` (supply a tie-free order for determinism). All
    * input columns are preserved. Cost: one range exchange + bounded
    * per-slice window + a broadcast of per-slice offsets. */
  def globalRunningSum(
      df: DataFrame, orderCols: Seq[Column], valueCol: String,
      outCol: String = "running_total"): DataFrame =
    globalRunningSums(df, orderCols, Seq(valueCol -> outCol))

  /** Multi-column form of [[globalRunningSum]]: every `(valueCol, outCol)`
    * pair gets its inclusive running sum over the SAME total order in the
    * same single range-exchange pass (one exchange, one bounded per-slice
    * window, one broadcast of per-slice offsets — not a pass per column). */
  def globalRunningSums(
      df: DataFrame, orderCols: Seq[Column],
      valueCols: Seq[(String, String)]): DataFrame = {
    require(orderCols.nonEmpty, "orderCols must be non-empty")
    require(valueCols.nonEmpty, "valueCols must be non-empty")
    val slices = df.sparkSession.sessionState.conf.numShufflePartitions
    // The slice id MUST be read from ONE materialized layout: the local
    // prefix sums and the per-slice totals are two subtrees of this plan,
    // and if the range exchange is re-executed per subtree (exchange reuse
    // is an OPTIMIZATION, not a guarantee — surrounding plan shape, AQE
    // stage boundaries, or a cached input can all break it), each re-run
    // draws DIFFERENT sampled boundaries and the offsets no longer match
    // the local sums — ranks collide or overshoot N (caught live by q88:
    // a 17th "file" appeared with ranks past the row count). The eager
    // localCheckpoint pins the sampled layout: both subtrees scan the
    // same materialized slices, so the reconstructed rank is exact — and
    // layout-INDEPENDENT, because boundary placement only decides which
    // slice adds the offset, never the total-order position itself.
    val ranged = df
      .repartitionByRange(slices, orderCols: _*)
      .withColumn("_ps_pid", spark_partition_id())
      .localCheckpoint()
    val wLocal = Window.partitionBy(col("_ps_pid")).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = valueCols.zipWithIndex.foldLeft(ranged) {
      case (acc, ((v, _), i)) =>
        acc.withColumn(s"_ps_local_$i", sum(col(v)).over(wLocal))
    }
    // per-slice totals -> exclusive prefix, via a triangular self-join over
    // the `slices`-row totals frame (a global window here would warn — and
    // at 32 rows a join is just as cheap and keeps every plan node
    // partition-safe; no driver collect either way)
    val totals = ranged.groupBy(col("_ps_pid"))
      .agg(
        sum(col(valueCols.head._1)).as("_ps_t_0"),
        valueCols.tail.zipWithIndex.map { case ((v, _), i) =>
          sum(col(v)).as(s"_ps_t_${i + 1}")
        }: _*)
    val earlier = totals.select(
      col("_ps_pid").as("_ps_pid_b") +:
        valueCols.indices.map(i => col(s"_ps_t_$i").as(s"_ps_t_b_$i")): _*)
    val offsets = totals
      .join(earlier, col("_ps_pid_b") < col("_ps_pid"), "left")
      .groupBy(col("_ps_pid"))
      .agg(
        coalesce(sum(col("_ps_t_b_0")), lit(0L)).as("_ps_off_0"),
        valueCols.tail.indices.map(i =>
          coalesce(sum(col(s"_ps_t_b_${i + 1}")), lit(0L))
            .as(s"_ps_off_${i + 1}")): _*)
    val joined = local.join(broadcast(offsets), Seq("_ps_pid"))
    val withOut = valueCols.zipWithIndex.foldLeft(joined) {
      case (acc, ((_, out), i)) =>
        acc.withColumn(out, col(s"_ps_local_$i") + col(s"_ps_off_$i"))
    }
    withOut.drop(
      "_ps_pid" +:
        valueCols.indices.flatMap(i =>
          Seq(s"_ps_local_$i", s"_ps_off_$i")): _*)
  }

  /** Assign each document the id of the fixed-`maxTokens` training sequence
    * its first token lands in, under deterministic md5-hash document order.
    * Output adds `cum_tokens` (inclusive global running token count) and
    * `seq_id` (0-based). `tokenCol` must be a non-negative integral count. */
  def packSequences(
      df: DataFrame, idCol: String, tokenCol: String,
      maxTokens: Int): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1, got $maxTokens")
    val order = Seq(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    // integer DIV: exact at any magnitude (a double divide would lose
    // precision once cumulative tokens pass 2^53)
    globalRunningSum(df, order, tokenCol, outCol = "cum_tokens")
      .withColumn("seq_id",
        expr(s"(cum_tokens - `$tokenCol`) DIV $maxTokens"))
  }

  /** Deterministic corpus shuffle + shard assignment — the training-data
    * export step: order documents by `(md5(id), id)` (a reproducible
    * pseudo-random permutation, independent of physical layout), then deal
    * them ROUND-ROBIN into `nShards` shards. Every shard gets ⌈n/nShards⌉
    * or ⌊n/nShards⌋ docs by construction — balanced output files with no
    * second balancing pass — and `(shard, shard_pos)` is a total
    * addressing scheme a writer can partition by. Adds `global_rank`
    * (1-based), `shard`, `shard_pos` (both 0-based).
    *
    * The global rank is [[globalRunningSum]] of 1 — range exchange +
    * bounded per-slice windows + a broadcast offset join — never the
    * single-task global `row_number` window. */
  def shardAssignments(
      df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val order = Seq(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    globalRunningSum(
        df.withColumn("_ps_one", lit(1L)), order, "_ps_one",
        outCol = "global_rank")
      .withColumn("shard", expr(s"(global_rank - 1) % $nShards"))
      .withColumn("shard_pos", expr(s"(global_rank - 1) DIV $nShards"))
      .drop("_ps_one")
  }

  /** Q84 — EXACT stratified train/test split: per class, exactly
    * `⌈trainFrac·n_class⌉` rows land in "train" (the first that many under
    * the deterministic `(md5(id), id)` permutation WITHIN the class), the
    * rest in "test" — the guarantee [[graft.operators.TextAnalysis.deterministicSplit]]'s
    * hash buckets give only in expectation, and the one a small or skewed
    * class actually needs (a 50-row minority class can easily land 35/65
    * under independent coin flips).
    *
    * Shape: per-class rank = ONE [[globalRunningSum]] pass over the
    * class-major total order `(class, md5(id), id)` minus a broadcast
    * class-offset join (offsets from the class-sized count frame via the
    * same triangular join as the prefix-sum slices) — never a per-class
    * row_number window, whose biggest class would serialize one task's
    * sort at 100 TB. A NULL class is its own stratum: it sorts FIRST
    * (Spark ASC null ordering), gets offset 0, and joins back null-safely.
    * The per-class rank is layout/cache/AQE-independent (pure function of
    * content), so the split is reproducible across reruns and engines. */
  def stratifiedSplit(
      df: DataFrame, classCol: String, idCol: String, trainFrac: Double,
      out: String = "split"): DataFrame = {
    require(trainFrac > 0.0 && trainFrac < 1.0,
      s"trainFrac must be in (0, 1), got $trainFrac")
    val order = Seq(
      col(classCol).asc, md5(col(idCol).cast("string")).asc, col(idCol).asc)
    val ranked = globalRunningSum(
      df.withColumn("_ss_one", lit(1L)), order, "_ss_one", "_ss_grank")
    val counts = df.groupBy(col(classCol)).agg(count(lit(1)).as("_ss_n"))
    val earlier = counts.select(
      col(classCol).as("_ss_cb"), col("_ss_n").as("_ss_nb"))
    // class offset = rows of strictly-earlier classes. The null class
    // sorts FIRST (Spark ASC null ordering), so it is "earlier" than every
    // non-null class — a bare `<` would skip it (null-false) and shift
    // every later class's rank by the null stratum's size (caught by
    // PackingSpec's null-stratum case).
    val offsets = counts
      .join(earlier,
        col("_ss_cb") < col(classCol) ||
          (col("_ss_cb").isNull && col(classCol).isNotNull), "left")
      .groupBy(col(classCol), col("_ss_n"))
      .agg(coalesce(sum(col("_ss_nb")), lit(0L)).as("_ss_off"))
      .select(col(classCol).as("_ss_c"), col("_ss_n"), col("_ss_off"))
    ranked
      .join(broadcast(offsets), col(classCol) <=> col("_ss_c"))
      .withColumn("_ss_crank", col("_ss_grank") - col("_ss_off"))
      .withColumn(out,
        when(
          col("_ss_crank") <=
            ceil(lit(trainFrac) * col("_ss_n")).cast("long"),
          "train").otherwise("test"))
      .drop("_ss_one", "_ss_grank", "_ss_c", "_ss_n", "_ss_off", "_ss_crank")
  }
}
