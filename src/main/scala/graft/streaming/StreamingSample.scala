package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.TopK

/** Streaming weighted sampling without replacement — the incremental form
  * of [[graft.operators.TopK.weightedSampleNoReplacement]], exploiting the
  * A-ES invariant directly: each row's priority `ln(u)/w` depends only on
  * `(id, weight)` (md5-derived `u`), so the n-sample over everything seen
  * is exactly the running top-n of priorities — an associative,
  * incrementally-maintainable fold. After every trigger the maintained
  * sample equals the batch sampler run over the union of all batches
  * (spec-pinned parity), which no naive "sample each batch, concatenate"
  * scheme achieves.
  *
  * Scale shape: the per-trigger heavy lifting is a bounded-memory local
  * top-n per input partition (the justified `mapPartitions` — a streaming
  * Dataset admits no pre-aggregation `orderBy`/`limit`, and the heap holds
  * n rows, never the partition); only ≤ n × partitions survivors shuffle
  * to the single merge group, whose state is the n-row sample itself.
  * Per-trigger cost ∝ batch, state ∝ n — never corpus-proportional.
  *
  * Emits the FULL current sample `(id, weight, samp_key)` each trigger it
  * changes (n rows — replace-the-table sink semantics, like a dimension
  * snapshot, not a delta). */
object StreamingSample {

  /** `rows` must be a streaming Dataset of `(id, weight)`; non-positive
    * weights are excluded (zero inclusion probability, the batch
    * contract). */
  def updates(
      rows: Dataset[(Long, Double)], n: Int): Dataset[(Long, Double, Double)] = {
    require(n >= 1, s"sample size n must be >= 1, got $n")
    val spark = rows.sparkSession
    import spark.implicits._

    val keyed = rows.toDF("_id", "_w")
      .filter(col("_w").isNotNull && col("_w") > 0)
      .select(
        col("_id"), col("_w"),
        TopK.aesKey(col("_id"), col("_w")).as("_sk"))
      .as[(Long, Double, Double)]

    // local bounded-heap top-n: ≤ n rows leave each partition per trigger
    val localTop = keyed.mapPartitions { it =>
      val heap = scala.collection.mutable.PriorityQueue.empty[(Long, Double, Double)](
        Ordering.by[(Long, Double, Double), (Double, Long)](r => (-r._3, r._1)))
      it.foreach { r =>
        heap.enqueue(r)
        if (heap.size > n) heap.dequeue()
      }
      heap.iterator
    }

    localTop
      .groupByKey(_ => 0)
      .flatMapGroupsWithState[Seq[(Long, Double, Double)], (Long, Double, Double)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (_, batch, state: GroupState[Seq[(Long, Double, Double)]]) =>
          val prev = state.getOption.getOrElse(Seq.empty)
          val merged = (prev ++ batch)
            .groupBy(_._1).map(_._2.head).toSeq // an id re-sent keeps one key
            .sortBy(r => (-r._3, r._1))
            .take(n)
          if (merged == prev) Iterator.empty
          else {
            state.update(merged)
            merged.iterator
          }
      }
  }
}
