package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes text classification — the lightweight
  * quality/language classifier step of a curation pipeline (the role
  * fastText-style linear models play in CCNet-like corpus filtering):
  * train on a labeled slice, score the rest of the corpus, keep/reroute by
  * predicted class.
  *
  * Why this shape at 100 TB: the MODEL is vocabulary-sized — a
  * `(token, label) → log-probability` table of at most |V|·|labels| rows
  * (MBs even for web-scale vocabularies after the usual min-count cut) —
  * so training is one token-count aggregation over the labeled slice
  * (shuffle ∝ distinct (token,label), map-side combined), and scoring is a
  * BROADCAST join: every corpus token looks up its per-label log-prob
  * locally, then one (doc,label) aggregation and a 1-row-per-doc argmax.
  * No iteration, no driver-side state, nothing corpus-sized moves.
  *
  * Train/score split is the caller's job (pair with
  * [[TextAnalysis.deterministicSplit]] for a reproducible one). Build the
  * model once, persist its two frames if scoring many batches — the same
  * build-once/probe-many discipline as the ANN and near-dup indexes.
  *
  * Reference anchor: the reference engine has no classifier; this is part
  * of the north-star LLM-pipeline surface (SURVEY.md §2.13).
  */
object Classifier {

  /** A trained model: two small DataFrames, both broadcastable.
    *
    *  - `condLogProb`: `(_label, _w, _lp)` — add-one-smoothed
    *    ln P(token|label), one row per (token,label) seen in training.
    *  - `labelPriors`: `(_label, _prior, _lp0)` — ln P(label) and the
    *    unseen-token fallback ln(1/(tokens_label + |V|)), one row per label.
    *
    * Persist both (plain parquet) to reuse the model across scoring runs.
    */
  final case class NbModel(condLogProb: DataFrame, labelPriors: DataFrame)

  /** Train on `train`'s `textCol` (whitespace tokens, lowercased — same
    * convention as [[TextAnalysis.tokens]]) against the class in `labelCol`.
    * One explode + one (token,label) aggregate; every derived statistic
    * (vocab size, per-label token totals, doc priors) is a one-row or
    * labels-row aggregate joined back broadcast — no driver collect. */
  def trainNaiveBayes(
      train: DataFrame, textCol: String, labelCol: String): NbModel = {
    val toks = train.select(
      col(labelCol).cast("string").as("_label"),
      explode(TextAnalysis.tokens(col(textCol))).as("_w"))
    // vocabulary-sized; shuffle ∝ distinct (token,label), not occurrences
    val counts = toks.groupBy("_label", "_w").agg(count(lit(1)).as("_c"))
    val vocab = counts.agg(count_distinct(col("_w")).as("_v")) // 1 row
    val labelTotals = counts.groupBy("_label").agg(sum("_c").as("_nl"))
    val denom = labelTotals.crossJoin(broadcast(vocab)) // 1 row per label
    val cond = counts
      .join(broadcast(denom), "_label")
      .select(
        col("_label"), col("_w"),
        log((col("_c") + lit(1)).cast("double") /
          (col("_nl") + col("_v"))).as("_lp"))
    val docTotal = train.agg(count(lit(1)).as("_n")) // 1 row
    val priors = train
      .groupBy(col(labelCol).cast("string").as("_label"))
      .agg(count(lit(1)).as("_nd"))
      .crossJoin(broadcast(docTotal))
      .join(
        denom.select(
          col("_label"),
          log(lit(1.0) / (col("_nl") + col("_v"))).as("_lp0")),
        "_label")
      .select(
        col("_label"),
        log(col("_nd").cast("double") / col("_n")).as("_prior"),
        col("_lp0"))
    NbModel(cond, priors)
  }

  /** Score `df`: argmax over labels of
    * `ln P(label) + Σ_tokens count·ln P(token|label)`, add-one smoothing,
    * unseen tokens charged the per-label fallback mass. Output:
    * `(idCol, pred_label, score)`, score the winning log-posterior rounded
    * boundary-stable to 6 dp (rounded BEFORE the argmax so the winner is
    * identical across engines; ties break on label ascending).
    *
    * Plan: corpus-side work is one explode + one (doc,token) aggregate;
    * both model joins are broadcast (labels × vocab is MBs); the final
    * argmax is a (doc)-partitioned |labels|-row window — shuffle ∝
    * docs × labels, never ∝ token occurrences.
    *
    * Token-less documents emit NO row: a NULL or empty `textCol` explodes
    * to zero tokens, so the document never reaches the argmax (there is
    * no evidence to score — emitting the bare prior argmax would assign
    * every empty document the majority label with false confidence). A
    * keep/reroute pipeline keyed on `pred_label` must treat absence as
    * its own outcome — left-join this result back to the corpus and
    * route unmatched docs explicitly. */
  def scoreNaiveBayes(
      model: NbModel, df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val docToks = df
      .select(col(idCol), explode(TextAnalysis.tokens(col(textCol))).as("_w"))
      .groupBy(col(idCol), col("_w"))
      .agg(count(lit(1)).as("_cw"))
    val perLabel = docToks
      .crossJoin(broadcast(model.labelPriors)) // |labels| rows per token
      .join(broadcast(model.condLogProb), Seq("_label", "_w"), "left")
      .withColumn("_t", col("_cw") * coalesce(col("_lp"), col("_lp0")))
      .groupBy(col(idCol), col("_label"), col("_prior"))
      .agg(sum("_t").as("_s"))
      .withColumn("_score", stableRound(col("_prior") + col("_s"), 6))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("_score").desc, col("_label").asc)
    perLabel
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") === 1)
      .select(
        col(idCol),
        col("_label").as("pred_label"),
        col("_score").as("score"))
  }

  /** Persist a trained [[NbModel]] (both frames are vocabulary-sized —
    * plain tables suffice; the scoring joins broadcast them regardless).
    * The same build-once/probe-many discipline as
    * [[TextAnalysis.saveBm25Index]]. */
  def saveNbModel(model: NbModel, name: String): Unit = {
    model.condLogProb.write.mode("overwrite").saveAsTable(s"${name}_cond")
    model.labelPriors.write.mode("overwrite").saveAsTable(s"${name}_priors")
  }

  def loadNbModel(
      spark: org.apache.spark.sql.SparkSession, name: String): NbModel =
    NbModel(spark.table(s"${name}_cond"), spark.table(s"${name}_priors"))

  /** A frozen logistic model: the one-row 6dp-rounded coefficient frame
    * [[logisticFit]] produced plus its FEATURE CONTRACT (which columns,
    * in which coefficient order). Broadcastable by construction; persist
    * with [[saveLogistic]] and score many batches with [[scoreLogistic]]
    * — the same build-once/probe-many discipline as [[NbModel]] and the
    * BM25/DSIR/ANN indexes (round-15 verdict task 3: c14 trained in-plan
    * but consumed the fit inline; nothing could freeze it). */
  final case class LogisticModel(coeffs: DataFrame, xCols: Seq[String])

  /** Freeze a [[logisticFit]] result. `fit` is the fit's one-row output
    * (or any one-row frame with `intercept` + `beta_<x>` columns). */
  def logisticModel(fit: DataFrame, xCols: Seq[String]): LogisticModel = {
    val need = "intercept" +: xCols.map(c => s"beta_$c")
    val missing = need.filterNot(fit.columns.contains)
    require(missing.isEmpty,
      s"logisticModel: fit frame lacks ${missing.mkString(", ")}")
    // enforce the one-row contract AT FREEZE TIME (one tiny job): a 0-row
    // frame would silently score nothing through the crossJoin and an
    // N-row frame would emit every id N times
    val n = fit.count()
    require(n == 1L, s"logisticModel: coefficient frame has $n rows, need 1")
    LogisticModel(fit.select(need.map(col): _*), xCols)
  }

  /** Score `df` with a frozen model: `score` = the 6dp-rounded
    * `σ(βᵀ[1,x])` (identical boundary discipline to the fit's own
    * diagnostics, so persisted-vs-direct scoring is bit-equal), `pred` =
    * score > 0.5. Rows with any null feature score null/false — they
    * carried no complete evidence, mirroring [[logisticFit]]'s
    * completeness filter. Plan: ONE broadcast of the one-row coefficient
    * frame crossed into a per-row map — per-batch cost ∝ batch, zero
    * shuffle. */
  def scoreLogistic(
      model: LogisticModel, df: DataFrame, idCol: String): DataFrame = {
    val margin = col("_lm_intercept") +
      model.xCols.zipWithIndex.map { case (c, i) =>
        col(s"_lm_b$i") * col(c).cast("double") }.reduce(_ + _)
    val renamed = model.coeffs.select(
      col("intercept").as("_lm_intercept") +:
        model.xCols.zipWithIndex.map { case (c, i) =>
          col(s"beta_$c").as(s"_lm_b$i") }: _*)
    df.crossJoin(broadcast(renamed))
      .withColumn("score", stableRound(
        lit(1.0) / (lit(1.0) + exp(-margin)), 6))
      .withColumn("pred", coalesce(col("score") > 0.5, lit(false)))
      .select(col(idCol), col("score"), col("pred"))
  }

  /** Persist / load a frozen logistic model. The coefficient row is
    * KB-sized — a plain table; the feature contract rides in the column
    * NAMES (`beta_<feature>`, in order), so load needs no side channel. */
  def saveLogistic(model: LogisticModel, name: String): Unit =
    model.coeffs.write.mode("overwrite").saveAsTable(s"${name}_coef")

  def loadLogistic(
      spark: org.apache.spark.sql.SparkSession, name: String): LogisticModel = {
    val coeffs = spark.table(s"${name}_coef")
    val xCols = coeffs.columns.toSeq
      .filter(_.startsWith("beta_")).map(_.stripPrefix("beta_"))
    require(xCols.nonEmpty && coeffs.columns.contains("intercept"),
      s"loadLogistic: ${name}_coef is not a saved logistic model")
    logisticModel(coeffs, xCols)
  }

  /** Logistic-regression curation classifier — the gradient-trained
    * sibling of the Naive Bayes model above (the shape of fastText-style
    * quality scorers once features are numeric): `iters` full-batch
    * gradient-descent steps on `σ(βᵀ[1,x])` against a {0,1} `labelCol`.
    * Each step is one map-side-combined corpus aggregate that computes
    * the NEXT 6dp-rounded coefficient row — all arithmetic and rounding
    * stay in Spark expressions so the trajectory is engine-replayable
    * (the oracle unrolls the same steps as CTEs) — and the d+1-double
    * row is collected and re-injected as literals into the next step's
    * plan (the MLlib treeAggregate shape: gradients come to the driver,
    * data never does). Collecting beats the previous broadcast-ladder
    * form, whose step-k plan nested all k−1 prior aggregates and made
    * Catalyst re-optimize a quadratically growing tree (measured 7.3 s →
    * ~2 s for 24 steps on a KB-sized frame; values bit-identical).
    *
    * Output (ONE row): `(n_points, intercept, beta_<x>…, logloss,
    * accuracy)` — logloss/accuracy are the TRAINING diagnostics of the
    * final β, accuracy thresholded on the 6dp-ROUNDED probability so
    * borderline rows are decided on identical numbers in any engine.
    *
    * Conditioning contract: scale features into O(1) magnitudes first
    * (keeps σ off its saturated tails, where a fixed learning rate stalls
    * and exp overflows stop mattering before portability does). At 100 TB:
    * `iters` corpus passes is the honest cost of batch GD — persist the
    * feature frame before calling; the per-pass shuffle is ONE combiner
    * row per partition (d+2 doubles).
    *
    * EAGER EXECUTION: calling this method runs `iters` Spark jobs AT CALL
    * TIME (each step's d+1-double coefficient row is collected and
    * re-injected as literals — the flat-plan form). The returned one-row
    * frame embeds the final β as literals: it is cheap to re-evaluate but
    * its lineage does NOT replay training — callers that constructed the
    * fit lazily, or relied on lineage recomputation, should checkpoint
    * the row instead. */
  def logisticFit(
      df: DataFrame, xCols: Seq[String], labelCol: String,
      iters: Int, lr: Double): DataFrame =
    logisticFitImpl(df, xCols, labelCol, iters, lr, driverFastPath = true)

  /** [[logisticFit]] with the single-partition driver fast path togglable —
    * package-private so the parity spec can run BOTH paths over the same
    * one-partition frame and pin bit-identical outputs. */
  private[graft] def logisticFitImpl(
      df: DataFrame, xCols: Seq[String], labelCol: String,
      iters: Int, lr: Double, driverFastPath: Boolean): DataFrame = {
    require(xCols.nonEmpty && xCols.size <= 8,
      s"logisticFit takes 1..8 features, got ${xCols.size}")
    require(iters >= 1 && iters <= 32, s"iters in [1,32], got $iters")
    require(lr > 0.0, s"lr must be positive, got $lr")
    val d = xCols.size
    val y = col(labelCol).cast("double")
    val complete = xCols.map(col(_).isNotNull).reduce(_ && _) && y.isNotNull
    val e = df.filter(complete).select(
      xCols.zipWithIndex.map { case (c, i) =>
        col(c).cast("double").as(s"_x$i")
      } :+ y.as("_y"): _*)
    // weight columns for one step: the current coefficients as literals
    // (None = the empty-input ladder, where every aggregate is null —
    // preserved so a zero-row fit yields the same all-null row as before)
    def wCol(w: Option[Array[Double]], j: Int): Column =
      w.map(a => lit(a(j))).getOrElse(lit(null).cast("double"))
    def margin(w: Option[Array[Double]]): Column =
      wCol(w, 0) + (0 until d).map(i => wCol(w, i + 1) * col(s"_x$i"))
        .reduce(_ + _)
    def sigmoid(w: Option[Array[Double]]): Column =
      lit(1.0) / (lit(1.0) + exp(-margin(w)))
    var w: Option[Array[Double]] = Some(Array.fill(d + 1)(0.0))
    // SINGLE-PARTITION DRIVER FAST PATH: when the caller has already routed
    // the training slice into ONE partition (the documented conditioning
    // recipe — c14 repartition(1)s its KB-sized sample), every GD step's
    // aggregate is a sequential fold over one task's rows, and running the
    // same fold on the driver over one collect() is bit-identical: collect
    // preserves the partition's row order, the margin is the same
    // left-to-right `w0 + Σ wj·xj` fold, `avg` is the same ordered
    // double-sum / count, and the 6dp boundary is applied by evaluating
    // Spark's own `round` expression (not a re-implementation). This turns
    // `iters` scheduler-floor jobs into one collect job (measured: 24 GD
    // jobs ≈ 7 s of c14's wall at sf0.1 → ~0.2 s; identical hash-checked
    // row, parity spec-pinned). Multi-partition inputs keep the distributed
    // ladder — at 100 TB the per-pass map-side-combined aggregate IS the
    // honest cost of batch GD, and partial-sum order would differ anyway.
    val singlePartition = driverFastPath && e.rdd.getNumPartitions == 1
    if (singlePartition && w.isDefined) {
      val rows = e.collect()
      if (rows.isEmpty) w = None
      else {
        val n = rows.length
        val xs = Array.tabulate(n, d)((i, j) => rows(i).getDouble(j))
        val ys = Array.tabulate(n)(i => rows(i).getDouble(d))
        def round6(x: Double): Double =
          org.apache.spark.sql.catalyst.expressions.Round(
            org.apache.spark.sql.catalyst.expressions.Literal(x + 1e-9),
            org.apache.spark.sql.catalyst.expressions.Literal(6))
            .eval(null).asInstanceOf[Double]
        var step = 0
        while (step < iters) {
          val cur = w.get
          val gradSum = new Array[Double](d + 1)
          var i = 0
          while (i < n) {
            var m = cur(0)
            var j = 0
            while (j < d) { m += cur(j + 1) * xs(i)(j); j += 1 }
            val diff = 1.0 / (1.0 + math.exp(-m)) - ys(i)
            gradSum(0) += diff
            j = 0
            while (j < d) { gradSum(j + 1) += diff * xs(i)(j); j += 1 }
            i += 1
          }
          w = Some(Array.tabulate(d + 1)(j =>
            round6(cur(j) - lr * (gradSum(j) / n))))
          step += 1
        }
      }
    } else {
      var step = 0
      while (step < iters && w.isDefined) {
        val row = e.agg(
          stableRound(wCol(w, 0) - lit(lr) * avg(sigmoid(w) - col("_y")), 6)
            .as("_w0"),
          (1 to d).map(j => stableRound(
            wCol(w, j) -
              lit(lr) * avg((sigmoid(w) - col("_y")) * col(s"_x${j - 1}")), 6)
            .as(s"_w$j")): _*)
          .collect()(0)
        w = if (row.isNullAt(0)) None
        else Some(Array.tabulate(d + 1)(row.getDouble))
        step += 1
      }
    }
    val p = stableRound(sigmoid(w), 6)
    e.agg(
      count(lit(1)).as("n_points"),
      stableRound(wCol(w, 0), 6).as("intercept") +:
        ((1 to d).map(j => stableRound(wCol(w, j), 6)
          .as(s"beta_${xCols(j - 1)}")) ++ Seq(
          stableRound(-avg(col("_y") * log(sigmoid(w)) +
            (lit(1.0) - col("_y")) * log(lit(1.0) - sigmoid(w))), 6)
            .as("logloss"),
          stableRound(avg(
            when((p > 0.5).cast("double") === col("_y"), 1.0)
              .otherwise(0.0)), 6).as("accuracy"))): _*)
  }
}
