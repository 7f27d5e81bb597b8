package graft

import org.apache.spark.sql.functions._

import graft.operators.Classifier

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // Train corpus small enough to hand-compute every smoothed probability:
  // vocab {a,b,c,d} (V=4), en tokens "a a b" (nl=3), fr tokens "c c d".
  private lazy val model = Classifier.trainNaiveBayes(
    Seq(("a a b", "en"), ("c c d", "fr")).toDF("text", "lang"),
    "text", "lang")

  private def predict(texts: String*): Map[String, (String, Double)] = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    Classifier.scoreNaiveBayes(model, df, "id", "text")
      .collect()
      .map(r => texts(r.getLong(0).toInt) -> (r.getString(1), r.getDouble(2)))
      .toMap
  }

  test("hand-computed posteriors: smoothing, priors, argmax") {
    val got = predict("a a", "c c")
    // P(a|en) = (2+1)/(3+4) = 3/7; prior = ln(1/2)
    val wantEn = math.log(0.5) + 2 * math.log(3.0 / 7)
    assert(got("a a")._1 == "en")
    assert(math.abs(got("a a")._2 - wantEn) < 1e-5)
    assert(got("c c")._1 == "fr")
    assert(math.abs(got("c c")._2 - wantEn) < 1e-5) // symmetric corpus
  }

  test("exact tie breaks on label ascending") {
    // "a c": en scores ln(1/2)+ln(3/7)+ln(1/7), fr identically (symmetry)
    assert(predict("a c")("a c")._1 == "en")
  }

  test("tokens unseen in training charge the per-label fallback mass") {
    val got = predict("z z z")
    // fallback ln(1/(3+4)) identical for both labels -> tie -> en
    assert(got("z z z")._1 == "en")
    val want = math.log(0.5) + 3 * math.log(1.0 / 7)
    assert(math.abs(got("z z z")._2 - want) < 1e-5)
  }

  test("model frames are reusable across scoring batches") {
    val first = predict("a a")
    val second = predict("a a b b", "d")
    assert(first("a a")._1 == "en")
    assert(second("a a b b")._1 == "en")
    assert(second("d")._1 == "fr")
  }

  test("StreamingClassify: per-batch scoring over a prebuilt model == batch scoring") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = Seq((10L, "a a"), (11L, "c d"), (12L, "b z"))
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Double)]
    val stream = MemoryStream[(Long, String)](spark)
    val q = graft.streaming.StreamingClassify.attachNaiveBayes(
      stream.toDF().toDF("id", "text"), model, "id", "text",
      checkpoint = tmpDir("nb-ckpt")) { (scored, _) =>
      got.synchronized {
        got ++= scored.collect().map(r =>
          (r.getLong(0), r.getString(1), r.getDouble(2)))
      }
    }
    try {
      stream.addData(docs.take(2))
      q.processAllAvailable()
      stream.addData(docs.drop(2))
      q.processAllAvailable()
    } finally q.stop()
    val expect = Classifier.scoreNaiveBayes(
        model, docs.toDF("id", "text"), "id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got.synchronized(got.toSet) == expect)
  }

  test("scoring plans broadcast model joins, no sort-merge") {
    val df = Seq((1L, "a b c")).toDF("id", "text")
    val plan = Classifier.scoreNaiveBayes(model, df, "id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"model joins must broadcast:\n${plan.take(3000)}")
  }

  test("saveNbModel/loadNbModel: scoring through the persisted model is identical") {
    // a previous JVM's run may have left the managed location behind with no
    // catalog entry — drop both so Overwrite can't hit
    // LOCATION_ALREADY_EXISTS (the saveIvfIndex spec's pattern)
    Seq("nb_persist_spec_cond", "nb_persist_spec_priors").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    val score = Seq((1L, "a a d"), (2L, "c b"), (3L, "zz")).toDF("id", "text")
    def canon(m: Classifier.NbModel) =
      Classifier.scoreNaiveBayes(m, score, "id", "text")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
    val direct = canon(model)
    Classifier.saveNbModel(model, "nb_persist_spec")
    val loaded = canon(Classifier.loadNbModel(spark, "nb_persist_spec"))
    assert(loaded == direct && direct.nonEmpty)
  }

  test("logisticFit: one hand-computed step from beta = 0 (sigma(0) = 0.5 exactly)") {
    import spark.implicits._
    // x = (-1, 0, 1), y = (0, 1, 1): grad0 = avg(0.5 - y) = -1/6,
    // grad1 = avg((0.5 - y) * x) = (-0.5 - 0.5) / 3 = -1/3
    val df = Seq((-1.0, 0.0), (0.0, 1.0), (1.0, 1.0)).toDF("x", "y")
    val r = Classifier.logisticFit(df, Seq("x"), "y", iters = 1, lr = 0.6)
      .head()
    assert(r.getLong(0) == 3L)
    assert(r.getDouble(1) == 0.1)  // -0.6 * (-1/6)
    assert(r.getDouble(2) == 0.2)  // -0.6 * (-1/3)
  }

  test("logisticFit: separable data trains to perfect accuracy, logloss falls with iterations") {
    import spark.implicits._
    val df = ((-10 to -1) ++ (1 to 10))
      .map(i => (i / 10.0, if (i > 0) 1.0 else 0.0)).toDF("x", "y")
    val short = Classifier.logisticFit(df, Seq("x"), "y", iters = 2, lr = 1.0)
      .head()
    val long = Classifier.logisticFit(df, Seq("x"), "y", iters = 12, lr = 1.0)
      .head()
    val (bShort, llShort) = (short.getDouble(2), short.getDouble(3))
    val (bLong, llLong, acc) =
      (long.getDouble(2), long.getDouble(3), long.getDouble(4))
    assert(bLong > bShort && bShort > 0.0,
      s"slope must grow toward the separator: $bShort -> $bLong")
    assert(llLong < llShort, s"logloss must fall: $llShort -> $llLong")
    assert(acc == 1.0)
  }

  test("logisticFit: null-feature rows leave every sum; label column drives n_points") {
    import spark.implicits._
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 1.0), (-1.0, 0.0), (null, 1.0), (2.0, null)).toDF("x", "y")
    val r = Classifier.logisticFit(df, Seq("x"), "y", iters = 1, lr = 0.1)
      .head()
    assert(r.getLong(0) == 2L)
  }

  // ------------------------------------------- frozen logistic model

  private def logitFixture() = {
    import spark.implicits._
    val train = ((-10 to -1) ++ (1 to 10))
      .map(i => (i / 10.0, i / 20.0, if (i > 0) 1.0 else 0.0))
      .toDF("a", "b", "y")
    val fit = Classifier.logisticFit(train, Seq("a", "b"), "y", 8, 1.0)
    Classifier.logisticModel(fit, Seq("a", "b"))
  }

  test("scoreLogistic: frozen model scores match the fit's own boundary " +
      "discipline; null features score null/false; plan broadcasts") {
    import spark.implicits._
    val m = logitFixture()
    val probe = Seq[(Long, java.lang.Double, java.lang.Double)](
      (1L, 0.9, 0.45), (2L, -0.9, -0.45), (3L, null, 1.0))
      .toDF("id", "a", "b")
    val out = Classifier.scoreLogistic(m, probe, "id")
    val rows = out.collect().map(r =>
      (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        r.getBoolean(2))).sortBy(_._1)
    assert(rows(0)._2.exists(_ > 0.5) && rows(0)._3)
    assert(rows(1)._2.exists(_ < 0.5) && !rows(1)._3)
    assert(rows(2)._2.isEmpty && !rows(2)._3)
    // hand-check row 1 against the frozen coefficients
    val c = m.coeffs.head()
    val z = c.getDouble(0) + c.getDouble(1) * 0.9 + c.getDouble(2) * 0.45
    val exp6 = BigDecimal(1.0 / (1.0 + math.exp(-z)) + 1e-9)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows(0)._2.contains(exp6))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Exchange hash"),
      s"coefficient join must broadcast:\n${plan.take(2000)}")
  }

  test("saveLogistic/loadLogistic: persisted-vs-direct scoring parity; " +
      "feature contract survives the round trip") {
    import spark.implicits._
    Seq("logit_persist_spec_coef").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    val m = logitFixture()
    val probe = (1 to 50).map(i => (i.toLong, (i - 25) / 25.0, (25 - i) / 50.0))
      .toDF("id", "a", "b")
    def canon(mm: Classifier.LogisticModel) =
      Classifier.scoreLogistic(mm, probe, "id").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
        .sortBy(_._1).toSeq
    val direct = canon(m)
    Classifier.saveLogistic(m, "logit_persist_spec")
    val loaded = Classifier.loadLogistic(spark, "logit_persist_spec")
    assert(loaded.xCols === Seq("a", "b"))
    assert(canon(loaded) === direct && direct.nonEmpty)
  }

  test("StreamingClassify.attachLogistic: per-batch scoring over a frozen " +
      "model == batch scoring over the same rows") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val m = logitFixture()
    val stream = MemoryStream[(Long, Double, Double)](spark)
    var got = Vector.empty[(Long, Double, Boolean)]
    val q = graft.streaming.StreamingClassify.attachLogistic(
      stream.toDF().toDF("id", "a", "b"), m, "id",
      tmpDir("slogit-ckpt")) { (scored, _) =>
      got ++= scored.collect().map(r =>
        (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    }
    val rows = (1 to 40).map(i => (i.toLong, (i - 20) / 20.0, (20 - i) / 40.0))
    try {
      rows.grouped(15).foreach { g => stream.addData(g: _*); q.processAllAvailable() }
    } finally q.stop()
    val batch = Classifier.scoreLogistic(m, rows.toDF("id", "a", "b"), "id")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
      .sortBy(_._1).toSeq
    assert(got.sortBy(_._1) === batch && batch.nonEmpty)
  }

  test("logisticModel rejects a frame missing the contract columns") {
    import spark.implicits._
    val bogus = Seq((0.1, 0.2)).toDF("intercept", "beta_a")
    intercept[IllegalArgumentException] {
      Classifier.logisticModel(bogus, Seq("a", "b"))
    }
  }
}
