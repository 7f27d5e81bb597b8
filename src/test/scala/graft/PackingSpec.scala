package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.Packing

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("globalRunningSum equals the single-task window form") {
    val rnd = new scala.util.Random(41)
    val df = (0 until 5000).map(i => (i.toLong, rnd.nextInt(100).toLong))
      .toDF("id", "v").repartition(9)
    val got = Packing.globalRunningSum(df, Seq(col("id").asc), "v", "cum")
      .select("id", "cum").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = df.withColumn("cum", sum(col("v")).over(
        Window.partitionBy(lit(0)).orderBy(col("id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select("id", "cum").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === want)
  }

  test("globalRunningSum is stable under physical layout") {
    val df = (0 until 1000).map(i => (i.toLong, (i % 7).toLong)).toDF("id", "v")
    val a = Packing.globalRunningSum(df.repartition(3), Seq(col("id")), "v")
      .select("id", "running_total").collect().map(_.toSeq).toSet
    val b = Packing.globalRunningSum(df.repartition(17), Seq(col("id")), "v")
      .select("id", "running_total").collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("plan has no unpartitioned window over the data") {
    val df = (0 until 100).map(i => (i.toLong, 1L)).toDF("id", "v")
    val plan = Packing.globalRunningSum(df, Seq(col("id")), "v")
      .queryExecution.executedPlan.toString
    // every Window node must carry a partition spec; the offsets pass is a
    // join over per-slice totals, not a window at all
    assert(!plan.contains("windowspecdefinition(id"), s"data window must be sliced:\n$plan")
    assert(!plan.contains("No Partition"), plan)
  }

  test("packSequences: sequences fill to maxTokens, docs start where first token lands") {
    val df = Seq((1L, 100L), (2L, 300L), (3L, 200L), (4L, 50L), (5L, 400L))
      .toDF("doc_id", "n_tokens")
    val out = Packing.packSequences(df, "doc_id", "n_tokens", maxTokens = 256)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("cum_tokens"), r.getAs[Long]("seq_id")))
    // validate the invariant independent of the hash order: seq_id =
    // (start offset) div maxTokens under SOME total order with contiguous
    // cumulative sums
    val byCum = out.sortBy(_._2)
    var prev = 0L
    byCum.foreach { case (_, cum, seq) =>
      assert(seq === prev / 256, s"doc starting at $prev got seq $seq")
      prev = cum
    }
    assert(byCum.last._2 === 1050L, "total tokens must be conserved")
  }

  test("shardAssignments: balanced round-robin permutation, layout-stable") {
    val df = (0 until 1003).map(i => Tuple1(i.toLong)).toDF("doc_id")
    val out = Packing.shardAssignments(df.repartition(7), "doc_id", nShards = 16)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("global_rank"),
        r.getAs[Long]("shard"), r.getAs[Long]("shard_pos")))
    // ranks are a permutation of 1..n
    assert(out.map(_._2).sorted.toSeq === (1L to 1003L))
    // dealing: shard/pos derive from the rank; shard sizes within ±1
    out.foreach { case (_, rank, shard, pos) =>
      assert(shard === (rank - 1) % 16 && pos === (rank - 1) / 16)
    }
    val sizes = out.groupBy(_._3).map(_._2.length)
    assert(sizes.max - sizes.min <= 1, s"unbalanced shards: $sizes")
    // same permutation under a different physical layout
    val again = Packing.shardAssignments(df.repartition(3), "doc_id", 16)
      .select("doc_id", "global_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again === out.map(t => (t._1, t._2)).toSet)
  }

  test("stratifiedSplit: exactly ceil(frac*n) train rows PER CLASS; null class is a stratum; layout-stable") {
    import org.apache.spark.sql.functions.col
    // deliberately skewed strata incl. a tiny one a coin-flip split mangles
    val rows = (0 until 1000).map(i => ("big", i.toLong)) ++
      (1000 until 1050).map(i => ("small", i.toLong)) ++
      (1050 until 1057).map(i => (null.asInstanceOf[String], i.toLong))
    val df = rows.toDF("cls", "id")
    val out = Packing.stratifiedSplit(df, "cls", "id", 0.8)
    val counts = out.groupBy("cls", "split").count().collect()
      .map(r => (Option(r.getString(0)).getOrElse("<null>"), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(counts(("big", "train")) === 800L)
    assert(counts(("big", "test")) === 200L)
    assert(counts(("small", "train")) === 40L)
    assert(counts(("small", "test")) === 10L)
    // null class: its own stratum, ceil(0.8*7) = 6
    assert(counts(("<null>", "train")) === 6L)
    assert(counts(("<null>", "test")) === 1L)
    // every input row present exactly once
    assert(out.count() === 1057L)
    assert(out.select("id").distinct().count() === 1057L)
    // deterministic under a different physical layout
    val a = out.select("id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val b = Packing.stratifiedSplit(df.repartition(13), "cls", "id", 0.8)
      .select("id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(a === b)
    // membership matches the declared rule: within-class md5 order prefix
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{md5, row_number}
    val w = Window.partitionBy("cls")
      .orderBy(md5(col("id").cast("string")), col("id"))
    val rule = df.withColumn("rk", row_number().over(w))
      .collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
    val trainIds = a.filter(_._2 == "train").map(_._1)
    val sizes = Map("big" -> 1000, "small" -> 50, "<null>" -> 7)
    rows.foreach { case (c, id) =>
      val n = sizes(Option(c).getOrElse("<null>"))
      val expectTrain = rule(id) <= math.ceil(0.8 * n).toLong
      assert(trainIds.contains(id) === expectTrain, s"id $id class $c")
    }
  }
}
