package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  // 10k rows, 95% on one hot key — the salting target
  private lazy val big = (0 until 10000).map { i =>
    val k = if (i % 20 == 0) (i % 7).toLong else 1L
    (k, i.toLong)
  }.toDF("k", "v")

  private lazy val small = (0L until 7L).map(k => (k, s"dim_$k"))
    .toDF("k", "name")

  private def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, String)] =
    df.collect().map(r =>
      (r.getAs[Long]("k"), r.getAs[Long]("v"),
        Option(r.getAs[String]("name")).getOrElse("∅"))).toSet

  test("saltedJoin == plain join (inner and left, incl. unmatched keys)") {
    val smallMissingKey = small.filter(col("k") =!= 3L) // force unmatched rows
    for (jt <- Seq("inner", "left")) {
      val plain = big.join(smallMissingKey, Seq("k"), jt)
      val salted = SkewJoin.saltedJoin(big, smallMissingKey, Seq("k"), 8, jt)
      assert(salted.columns.toSeq === plain.columns.toSeq, jt)
      assert(canon(salted) === canon(plain), jt)
    }
  }

  test("saltedJoin spreads the hot key across salt subpartitions") {
    val SALT = 8
    // reproduce the internal salt and count the hot key's spread
    val spread = big.filter(col("k") === 1L)
      .withColumn("s", pmod(xxhash64(monotonically_increasing_id()), lit(SALT)))
      .groupBy("s").count().collect()
    assert(spread.length == SALT, s"hot key landed on ${spread.length}/$SALT salts")
    val counts = spread.map(_.getLong(1))
    assert(counts.max.toDouble / counts.min < 2.0,
      s"salt imbalance: ${counts.mkString(",")}")
  }

  test("saltedJoin handles null join keys like plain join") {
    val withNulls = big.unionByName(
      Seq((Option.empty[Long], 99999L)).toDF("k", "v"))
    for (jt <- Seq("inner", "left")) {
      val plain = withNulls.join(small, Seq("k"), jt)
      val salted = SkewJoin.saltedJoin(withNulls, small, Seq("k"), 4, jt)
      assert(salted.count() === plain.count(), jt)
    }
  }

  test("saltedJoin rejects unsupported shapes") {
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(big, small, Seq("k"), 0)
    }
    intercept[IllegalArgumentException] {
      SkewJoin.saltedJoin(big, small, Seq("k"), 4, "right")
    }
  }
}
