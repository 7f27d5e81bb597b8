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
}
