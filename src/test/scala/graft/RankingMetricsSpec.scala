package graft

import graft.operators.Similarity

/** Graded ranking metrics: hand-computed nDCG/MRR/AP including unjudged
  * retrieved docs, relevant-but-unretrieved docs in R and the ideal, the
  * no-relevant nulls, and the closed-form IDCG slot fill when relevant
  * docs outnumber k. */
class RankingMetricsSpec extends SparkSpec {

  import spark.implicits._

  private def log2(x: Double) = math.log(x) / math.log(2.0)
  private def r6(x: Double) =
    BigDecimal.valueOf(x + 1e-9).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  test("hand case: graded gains, unretrieved relevant counts in R and the ideal") {
    // q=A: retrieved d1(rel 2), d2(rel 0), d3(rel 1); d4(rel 2) judged but
    // NOT retrieved -> R = 3, ideal top-3 grades [2,2,1]
    val retrieved = Seq(
      ("A", "d1", 1), ("A", "d2", 2), ("A", "d3", 3)).toDF("q", "doc", "rank")
    val relevance = Seq(
      ("A", "d1", 2), ("A", "d3", 1), ("A", "d4", 2)).toDF("q", "doc", "rel")
    val row = Similarity.rankingMetrics(
      retrieved, relevance, "q", "doc", "rank", "rel", k = 3).head()
    assert(row.getAs[Long]("n_rel") === 3L)
    val dcg = 3.0 / log2(2) + 1.0 / log2(4)
    val idcg = 3.0 / log2(2) + 3.0 / log2(3) + 1.0 / log2(4)
    assert(row.getAs[Double]("ndcg_at_3") === r6(dcg / idcg))
    assert(row.getAs[Double]("mrr_at_3") === 1.0)
    assert(row.getAs[Double]("ap_at_3") === r6((1.0 + 2.0 / 3.0) / 3.0))
  }

  test("no relevant docs -> ndcg/ap null, mrr 0; relevant but none retrieved -> zeros") {
    val retrieved = Seq(
      ("B", "d1", 1), ("B", "d2", 2),
      ("C", "d1", 1), ("C", "d2", 2)).toDF("q", "doc", "rank")
    val relevance = Seq(("C", "d9", 1)).toDF("q", "doc", "rel")
    val out = Similarity.rankingMetrics(
        retrieved, relevance, "q", "doc", "rank", "rel", k = 2)
      .collect().map(r => r.getString(0) -> r).toMap
    val b = out("B")
    assert(b.getAs[Long]("n_rel") === 0L)
    assert(b.isNullAt(b.fieldIndex("ndcg_at_2")))
    assert(b.getAs[Double]("mrr_at_2") === 0.0)
    assert(b.isNullAt(b.fieldIndex("ap_at_2")))
    val c = out("C")
    assert(c.getAs[Long]("n_rel") === 1L)
    assert(c.getAs[Double]("ndcg_at_2") === 0.0)
    assert(c.getAs[Double]("mrr_at_2") === 0.0)
    assert(c.getAs[Double]("ap_at_2") === 0.0)
  }

  test("IDCG slot fill: more relevant than k takes only the top-k grades; perfect ranking scores 1") {
    // five rel-1 docs, k=2: ideal = [1,1]; retrieval returns two of them in
    // order -> dcg == idcg -> ndcg 1; AP denominator min(R,k) = 2
    val retrieved = Seq(("A", "d1", 1), ("A", "d2", 2)).toDF("q", "doc", "rank")
    val relevance = (1 to 5).map(i => ("A", s"d$i", 1)).toDF("q", "doc", "rel")
    val row = Similarity.rankingMetrics(
      retrieved, relevance, "q", "doc", "rank", "rel", k = 2).head()
    assert(row.getAs[Double]("ndcg_at_2") === 1.0)
    assert(row.getAs[Double]("ap_at_2") === 1.0)
    assert(row.getAs[Long]("n_rel") === 5L)
    // mixed grades fill high-to-low: rel [3, 1] retrieved low-grade first
    val ret2 = Seq(("A", "lo", 1), ("A", "hi", 2)).toDF("q", "doc", "rank")
    val rel2 = Seq(("A", "hi", 3), ("A", "lo", 1)).toDF("q", "doc", "rel")
    val row2 = Similarity.rankingMetrics(
      ret2, rel2, "q", "doc", "rank", "rel", k = 2).head()
    val dcg = 1.0 / log2(2) + 7.0 / log2(3)
    val idcg = 7.0 / log2(2) + 1.0 / log2(3)
    assert(row2.getAs[Double]("ndcg_at_2") === r6(dcg / idcg))
  }

  test("rank filter: hits beyond k are invisible to every metric") {
    val retrieved = Seq(("A", "d1", 1), ("A", "d2", 2), ("A", "d3", 3))
      .toDF("q", "doc", "rank")
    val relevance = Seq(("A", "d3", 2)).toDF("q", "doc", "rel")
    val row = Similarity.rankingMetrics(
      retrieved, relevance, "q", "doc", "rank", "rel", k = 2).head()
    assert(row.getAs[Double]("ndcg_at_2") === 0.0)
    assert(row.getAs[Double]("mrr_at_2") === 0.0)
    assert(row.getAs[Double]("ap_at_2") === 0.0)
  }
}
