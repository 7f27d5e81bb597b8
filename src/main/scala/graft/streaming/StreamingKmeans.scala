package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.{Dedup, Similarity, stableRound}

/** Streaming mini-batch k-means — the ingest-time form of
  * [[graft.operators.Similarity.kmeansClusters]]: each micro-batch is
  * assigned to the CURRENT centroids (broadcast argmax fold — rows never
  * move), its per-cell moment deltas `(n, Σx)` are folded into the staged
  * state, and the refreshed centroids are emitted. This is the classic
  * mini-batch update (Sculley, WWW'10) with batch-sized steps: centroids
  * are the running mean of every vector EVER assigned to the cell, so a
  * cell's step size naturally decays as it accumulates mass.
  *
  * Unlike the batch Lloyd fit, the result is order-DEPENDENT by
  * construction (assignment happens against the centroids current at
  * ingest time) — the pinned contracts are instead: replay safety (a
  * re-run batch re-assigns against the same staged base — the argmax is
  * integer-deterministic — and overwrites its own staging; the Σx sums
  * are FP and subject to partition-order rounding at the last ulp, which
  * the 6dp centroid rounding absorbs), restart continuation, and
  * incarnation purge.
  *
  * State discipline = [[StreamingPca]] prefix-merge: one staging holds the
  * FULL per-cell moment frame (k rows × d-element sums) up to its batch
  * id; only `id` and `id−1` are ever live. Per-trigger cost: one
  * broadcast-fold assignment over the batch + one k-row merge. The first
  * batch seeds cells with `hash56(row id) mod k` — the [[Similarity
  * .kmeansClusters]] seeding — so an empty-state start is deterministic
  * too. */
object StreamingKmeans {

  /** Centroid view of a moment frame: `(_cell, _centroid)` with components
    * 6dp-stable-rounded — the [[graft.operators.Dedup
    * .assignNearestCentroid]] rounding contract. */
  def centroidsOf(moments: DataFrame): DataFrame =
    moments.select(
      col("_cell"),
      transform(col("_sum"), x => stableRound(x / col("_n"), 6))
        .as("_centroid"))

  /** Latest committed moment frame (None before the first trigger). */
  def currentMoments(
      spark: SparkSession, statePath: String): Option[DataFrame] =
    DeltaStaging.stagedIds(spark, statePath).maxOption
      .map(b => DeltaStaging.read(spark, statePath, b))

  // guard for the "every position counts the same rows" invariant both
  // aggregates below depend on: a ragged batch (mixed vector dims) or a
  // null vector element would otherwise break moment conservation with a
  // nondeterministically chosen count. Checked per cell from the
  // (count, non-null count) pair — min==max across positions AND no
  // dropped nulls, else fail loudly.
  private def checkedN(what: String): Column =
    when(
      min("_n") =!= max("_n") || max(col("_n") - col("_nn")) > 0,
      raise_error(concat(
        lit(s"$what: ragged or null-element vector batch in cell "),
        col("_cell").cast("string"),
        lit(" (per-position counts "), min("_n").cast("string"),
        lit(".."), max("_n").cast("string"), lit(", null elements "),
        max(col("_n") - col("_nn")).cast("string"), lit(")")))
        .cast("long"))
      .otherwise(max("_n"))

  // per-cell (n, element-wise Σx) of an assigned frame — k-row output
  private def moments(assigned: DataFrame, vecCol: String): DataFrame =
    assigned
      .select(col("_cell"), posexplode(col(vecCol)).as(Seq("_pos", "_x")))
      .groupBy("_cell", "_pos")
      .agg(
        count(lit(1)).as("_n"), count(col("_x")).as("_nn"),
        sum(col("_x").cast("double")).as("_s"))
      .groupBy("_cell")
      .agg(
        checkedN("streaming k-means ingest").as("_n"),
        transform(
          array_sort(collect_list(struct(col("_pos"), col("_s")))),
          x => x.getField("_s")).as("_sum"))

  // fold a batch's moment delta into the base (both k-row frames)
  private def fold(base: DataFrame, delta: DataFrame): DataFrame =
    base.unionByName(delta)
      .select(col("_cell"), col("_n"), posexplode(col("_sum")).as(Seq("_pos", "_s")))
      .groupBy("_cell", "_pos")
      .agg(sum("_n").as("_n"), sum("_s").as("_s2"))
      // _nn mirrors _n here: a base/delta dim mismatch shows up as
      // positions covered by only one side, i.e. differing per-position _n
      .withColumn("_nn", col("_n"))
      .groupBy("_cell")
      .agg(
        checkedN("streaming k-means fold").as("_n"),
        transform(
          array_sort(collect_list(struct(col("_pos"), col("_s2")))),
          x => x.getField("_s2")).as("_sum"))

  /** Attach the mini-batch fit to a streaming DataFrame carrying `idCol`
    * and `vecCol`. After each trigger, `sink` receives the refreshed
    * `(_cell, _n, _centroid)` frame (read back from the COMMITTED staging)
    * and the batch id. */
  def attach(
      df: DataFrame, idCol: String, vecCol: String, k: Int,
      statePath: String, checkpoint: String)(
      sink: (DataFrame, Long) => Unit): StreamingQuery = {
    require(k > 0, s"k must be positive, got $k")
    df.writeStream
      .foreachBatch((batch: DataFrame, id: Long) => {
        val spark = batch.sparkSession
        DeltaStaging.purgeAtOrAbove(spark, statePath, id)
        // an EMPTY staged frame (a run whose first triggers carried no
        // rows) must not become a codebook — an empty codebook would
        // assign every row a null cell; keep seeding until mass exists
        val base = DeltaStaging.stagedIds(spark, statePath)
          .filter(_ < id).maxOption
          .map(b => DeltaStaging.read(spark, statePath, b))
          .filter(!_.isEmpty)
        val assigned = base match {
          case Some(m) =>
            Similarity.assignToCodebook(
              centroidsOf(m), batch, idCol, vecCol)
          case None =>
            batch.select(
              col(idCol), col(vecCol),
              pmod(Dedup.hash56(col(idCol).cast("string")), lit(k.toLong))
                .as("_cell"))
        }
        val delta = moments(
          assigned.select(
            col("_cell"),
            transform(col(vecCol), _.cast("double")).as(vecCol)), vecCol)
        val merged = base.map(fold(_, delta)).getOrElse(delta)
        DeltaStaging.stage(merged, statePath, id)
        DeltaStaging.purgeBelow(spark, statePath, id - 1)
        val committed = DeltaStaging.read(spark, statePath, id)
        sink(
          committed.select(col("_cell"), col("_n"))
            .join(centroidsOf(committed), Seq("_cell")), id)
      })
      .option("checkpointLocation", checkpoint)
      .start()
  }
}
