package graft

import graft.operators.Sequence

class SequenceSpec extends SparkSpec {
  import spark.implicits._

  private def funnel(rows: (Long, String, Long)*) =
    Sequence.funnelTimes(
      rows.zipWithIndex.map { case ((u, t, ts), i) => (u, t, ts, i.toLong) }
        .toDF("u", "typ", "ts", "eid"),
      "u", "typ", "ts", Seq("view", "click", "purchase"))
      .collect()
      .map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))
      .toMap

  test("funnel: steps chain strictly in order") {
    val got = funnel(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      // u2: the pre-view click and the pre-click purchase do not count
      (2L, "click", 5L), (2L, "view", 10L), (2L, "purchase", 12L),
      (2L, "click", 15L))
    assert(got(1L) == ((Some(10L), Some(20L), Some(30L))))
    assert(got(2L) == ((Some(10L), Some(15L), None)))
  }

  test("funnel: same-instant events do not chain (strictly after)") {
    val got = funnel((1L, "view", 10L), (1L, "click", 10L), (1L, "click", 11L))
    assert(got(1L) == ((Some(10L), Some(11L), None)))
  }

  test("funnel: never-started and mid-abandoned entities keep null tails") {
    val got = funnel(
      (1L, "click", 5L), (1L, "purchase", 6L), // no view at all
      (2L, "view", 5L))                        // view only
    assert(got(1L) == ((None, None, None)))
    assert(got(2L) == ((Some(5L), None, None)))
  }

  test("cohortRetention: hand-computed cohort × activity counts") {
    // bucket width 10: u1 first at 5 (cohort 0), active buckets {0, 2};
    // u2 first at 15 (cohort 1), active {1}; u3 first at 7 (cohort 0),
    // active {0} — duplicate events in one bucket collapse
    val df = Seq(
      (1L, 5L), (1L, 25L), (1L, 27L),
      (2L, 15L),
      (3L, 7L), (3L, 9L)).toDF("u", "ts")
    val got = Sequence.cohortRetention(df, "u", "ts", bucketUs = 10L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(got == Map(
      (0L, 0L) -> 2L, (0L, 2L) -> 1L, (1L, 1L) -> 1L))
  }

  test("resampleFfill: per-entity grid, forward fill, null before first obs") {
    val df = Seq(
      (1L, 12L, 1.0), (1L, 12L, 0.5), (1L, 25L, 2.0), // same-instant -> max
      (2L, 5L, 9.0))
      .toDF("u", "ts", "v")
    val got = Sequence.resampleFfill(df, "u", "ts", "v", stepUs = 10L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> Option(r.get(2)))
      .toMap
    assert(got == Map(
      (1L, 10L) -> None,        // grid point precedes the first observation
      (1L, 20L) -> Some(1.0),   // filled from ts=12 (max of the duplicates)
      (2L, 0L) -> None))
  }

  test("transitionCounts: hand-computed matrix, row-normalized") {
    // u1: a->b->a->b ; u2: a->b  =>  a->b ×3, b->a ×1
    val df = Seq(
      (1L, "a", 10L, 0L), (1L, "b", 20L, 1L),
      (1L, "a", 30L, 2L), (1L, "b", 40L, 3L),
      (2L, "a", 5L, 4L), (2L, "b", 6L, 5L))
      .toDF("u", "typ", "ts", "eid")
    val got = Sequence.transitionCounts(df, "u", "typ", "ts", "eid")
      .collect()
      .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
        (r.getAs[Long]("n_transitions"), r.getAs[Double]("p")))
      .toMap
    assert(got == Map(
      ("a", "b") -> ((3L, 1.0)),
      ("b", "a") -> ((1L, 1.0)))) // b row-normalizes over its own 1 exit
  }

  test("transitionCounts: bucketed == flat window on random data (3 seeds × widths)") {
    val types = Vector("a", "b", "c", "d")
    for (seed <- Seq(11, 47, 101)) {
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 3000).map { i =>
        ((rnd.nextInt(25)).toLong, types(rnd.nextInt(types.size)),
          rnd.nextInt(1000).toLong, i.toLong)
      }.toDF("u", "typ", "ts", "eid")
      val flat = Sequence.transitionCounts(rows, "u", "typ", "ts", "eid")
        .collect().map(_.toSeq).toSet
      for (width <- Seq(7L, 100L, 5000L)) {
        val bucketed = Sequence.transitionCounts(
            rows, "u", "typ", "ts", "eid", bucketUs = width)
          .collect().map(_.toSeq).toSet
        assert(bucketed == flat, s"seed=$seed width=$width")
      }
    }
  }

  test("funnel == naive per-entity fold on random data (3 seeds)") {
    val types = Vector("view", "click", "purchase", "other")
    for (seed <- Seq(7, 23, 91)) {
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 2000).map { i =>
        ((rnd.nextInt(40)).toLong, types(rnd.nextInt(types.size)),
          rnd.nextInt(300).toLong, i.toLong)
      }
      // naive model: walk each entity's (ts, eid)-sorted events, tracking
      // the earliest strictly-after qualified time per step
      val want = rows.groupBy(_._1).map { case (u, es) =>
        val sorted = es.sortBy(e => (e._3, e._4))
        val steps = Seq("view", "click", "purchase")
        val t = Array.fill[Option[Long]](3)(None)
        for ((_, typ, ts, _) <- sorted; i = steps.indexOf(typ) if i >= 0) {
          val ok = i == 0 || t(i - 1).exists(_ < ts)
          if (ok && t(i).forall(_ > ts)) t(i) = Some(ts)
        }
        u -> ((t(0), t(1), t(2)))
      }
      val got = Sequence.funnelTimes(
          rows.toDF("u", "typ", "ts", "eid"),
          "u", "typ", "ts", Seq("view", "click", "purchase"))
        .collect()
        .map(r => r.getLong(0) ->
          ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))))
        .toMap
      assert(got == want, s"seed=$seed")
    }
  }

  test("resampleFfill == naive grid walk on random data (3 seeds)") {
    for (seed <- Seq(5, 17, 83)) {
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 800).map { _ =>
        ((rnd.nextInt(20)).toLong, rnd.nextInt(500).toLong,
          rnd.nextInt(100).toDouble)
      }
      val step = 25L
      val want = rows.groupBy(_._1).flatMap { case (u, es) =>
        val byTs = es.groupBy(_._2).map { case (ts, g) => ts -> g.map(_._3).max }
        val b0 = byTs.keys.min / step
        val b1 = byTs.keys.max / step
        (b0 to b1).map { b =>
          val gt = b * step
          val vs = byTs.filter(_._1 <= gt)
          (u, gt) -> (if (vs.isEmpty) None
                      else Some(vs.maxBy(_._1)._2))
        }
      }
      val got = Sequence.resampleFfill(
          rows.toDF("u", "ts", "v"), "u", "ts", "v", stepUs = step)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> Option(r.get(2)))
        .toMap
      assert(got == want, s"seed=$seed")
    }
  }

  test("funnel: a null entity key is a real group with real step times") {
    val got = Sequence.funnelTimes(
        Seq[(java.lang.Long, String, java.lang.Long)](
          (null, "view", 10L), (null, "click", 20L), (1L, "view", 5L))
          .toDF("u", "typ", "ts"),
        "u", "typ", "ts", Seq("view", "click", "purchase"))
      .collect()
      .map(r => Option(r.get(0)) ->
        ((Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))))
      .toMap
    assert(got(None) == ((Some(10L), Some(20L), None)))
    assert(got(Some(1L)) == ((Some(5L), None, None)))
  }

  test("StreamingFunnel: negative (pre-1970) epochs chain correctly") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val latest = scala.collection.mutable.Map.empty[String, Seq[Option[Long]]]
    val stream = MemoryStream[(String, String, Long)](spark)
    val q = graft.streaming.StreamingFunnel.attach(
      stream.toDF().toDF("u", "typ", "ts"), "u", "typ", "ts",
      Seq("view", "click", "purchase"),
      checkpoint = tmpDir("funnel-neg-ckpt")) { (batch, _) =>
      latest.synchronized {
        batch.collect().foreach(r => latest(r.getString(0)) =
          (1 to 3).map(i => Option(r.get(i)).map(_.asInstanceOf[Long])))
      }
    }
    try {
      stream.addData(Seq(("u1", "view", -50L), ("u1", "click", -30L)))
      q.processAllAvailable()
    } finally q.stop()
    assert(latest.synchronized(latest("u1")) ==
      Seq(Some(-50L), Some(-30L), None))
  }

  test("StreamingFunnel: incremental updates == batch funnel over in-order batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val steps = Seq("view", "click", "purchase")
    val b1 = Seq(("u1", "view", 10L), ("u1", "other", 15L), ("u2", "click", 5L))
    val b2 = Seq(("u1", "click", 20L), ("u2", "view", 8L), ("u1", "purchase", 21L))
    val latest = scala.collection.mutable.Map.empty[String, Seq[Option[Long]]]
    var emptyBatches = 0
    val stream = MemoryStream[(String, String, Long)](spark)
    val q = graft.streaming.StreamingFunnel.attach(
      stream.toDF().toDF("u", "typ", "ts"), "u", "typ", "ts", steps,
      checkpoint = tmpDir("funnel-ckpt")) { (batch, _) =>
      val rows = batch.collect()
      latest.synchronized {
        if (rows.isEmpty) emptyBatches += 1
        rows.foreach(r => latest(r.getString(0)) =
          (1 to 3).map(i => Option(r.get(i)).map(_.asInstanceOf[Long])))
      }
    }
    try {
      stream.addData(b1); q.processAllAvailable()
      stream.addData(b2); q.processAllAvailable()
      stream.addData(Seq(("u2", "other", 99L))); q.processAllAvailable() // no step events
    } finally q.stop()
    val want = Sequence.funnelTimes(
        (b1 ++ b2).toDF("u", "typ", "ts"), "u", "typ", "ts", steps)
      .collect()
      .map(r => r.getString(0) ->
        (1 to 3).map(i => Option(r.get(i)).map(_.asInstanceOf[Long])))
      .toMap
    assert(latest.synchronized(latest.toMap) == want)
    assert(latest.synchronized(emptyBatches) >= 1) // the no-change batch emitted nothing
  }

  test("StreamingFunnel: state survives a checkpoint restart — later steps qualify against pre-restart ones") {
    val inDir = tmpDir("funnel-in")
    val ckpt = tmpDir("funnel-restart-ckpt")
    def writeFile(name: String, rows: Seq[String]): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(inDir, name), rows.mkString("\n") + "\n")
    val latest = scala.collection.mutable.Map.empty[String, Seq[Option[Long]]]
    def start() = graft.streaming.StreamingFunnel.attach(
      graft.sources.Sources.fileStream(
        spark, inDir, "csv", "u STRING, typ STRING, ts BIGINT"),
      "u", "typ", "ts", Seq("view", "click", "purchase"), ckpt) { (b, _) =>
      latest.synchronized {
        b.collect().foreach(r => latest(r.getString(0)) =
          (1 to 3).map(i => Option(r.get(i)).map(_.asInstanceOf[Long])))
      }
    }
    writeFile("f1.csv", Seq("u1,view,10"))
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(latest.synchronized(latest("u1")) == Seq(Some(10L), None, None))
    // restart from the same checkpoint: the click must qualify against the
    // PRE-restart view, which only works if the state store restored t_view
    writeFile("f2.csv", Seq("u1,click,20"))
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    assert(latest.synchronized(latest("u1")) == Seq(Some(10L), Some(20L), None))
  }

  test("negative (pre-1970) epochs bucket by FLOOR division across bucketOf operators") {
    // bucketUs=10: ts −25 lands in bucket −3 (floor), NOT −2 (truncate).
    // The DuckDB oracles replay the bucketing with `//`, which is floor
    // division too — this pins the Spark side of that agreement.
    val cohort = Sequence.cohortRetention(
        Seq((1L, -25L), (1L, -5L), (1L, 7L)).toDF("u", "ts"),
        "u", "ts", bucketUs = 10L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(cohort == Set((-3L, -3L, 1L), (-3L, -1L, 1L), (-3L, 0L, 1L)))

    // resampleFfill: entity range buckets floor(−25/10) = −3 … floor(7/10)
    // = 0 → grid −30, −20, −10, 0; the −30 instant precedes the first
    // observation (forward fill never invents a value)
    val grid = Sequence.resampleFfill(
        Seq((1L, -25L, 1.0), (1L, 7L, 2.0)).toDF("u", "ts", "v"),
        "u", "ts", "v", stepUs = 10L)
      .collect()
      .map(r => r.getLong(1) -> Option(r.get(2))).toSet
    assert(grid == Set(
      -30L -> None, -20L -> Some(1.0), -10L -> Some(1.0), 0L -> Some(1.0)))

    // bucketed transition pairs == flat window when buckets span zero
    val rows = Seq(
      (1L, "a", -35L, 0L), (1L, "b", -22L, 1L), (1L, "c", -5L, 2L),
      (1L, "a", 3L, 3L), (2L, "b", -11L, 4L), (2L, "a", -9L, 5L))
      .toDF("u", "typ", "ts", "eid")
    def mat(bucketUs: Long) = Sequence
      .transitionCounts(rows, "u", "typ", "ts", "eid", bucketUs)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(mat(10L) == mat(0L))
  }

  test("funnel runs aggregates only — no window, no sort in the final plan") {
    val df = (0 until 500).map(i =>
      ((i % 7).toLong, Seq("view", "click", "purchase")(i % 3),
        i.toLong, i.toLong))
      .toDF("u", "typ", "ts", "eid")
    val out = Sequence.funnelTimes(
      df, "u", "typ", "ts", Seq("view", "click", "purchase"))
    out.collect() // AQE finalizes: the null-safe joins' initial SMJ plan
    // converts to broadcast once the entities-sized build sides are seen
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0) // judge the ADAPTIVE outcome only
    assert(!plan.contains("Window"), s"no window expected:\n${plan.take(3000)}")
    assert(!plan.contains("SortMergeJoin"),
      s"entities-sized frames must broadcast at runtime:\n${plan.take(3000)}")
  }
}
