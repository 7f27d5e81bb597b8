package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class SilhouetteSpec extends SparkSpec {

  private def sil(df: org.apache.spark.sql.DataFrame): Map[Int, (Long, Any)] =
    Similarity.simplifiedSilhouette(df, "id", "v", "cl")
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), if (r.isNullAt(2)) null else r.getDouble(2))))
      .toMap

  test("well-separated orthogonal clusters score near 1") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0, 0.0, 0.01), 0), (2L, Seq(1.0, 0.01, 0.0), 0),
      (3L, Seq(0.0, 1.0, 0.01), 1), (4L, Seq(0.01, 1.0, 0.0), 1)
    ).toDF("id", "v", "cl")
    val got = sil(df)
    assert(got(0)._1 == 2L && got(1)._1 == 2L)
    assert(got(0)._2.asInstanceOf[Double] > 0.9)
    assert(got(1)._2.asInstanceOf[Double] > 0.9)
  }

  test("singleton clusters: a = 0 (point IS its centroid) -> s = 1") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0, 0.0), 0),
      (2L, Seq(0.0, 1.0), 1)
    ).toDF("id", "v", "cl")
    val got = sil(df)
    assert(got(0) == ((1L, 1.0)))
    assert(got(1) == ((1L, 1.0)))
  }

  test("identical centroids: max(a,b) = 0 guard -> s = 0, not NaN") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(1.0, 1.0), 0), (2L, Seq(1.0, 1.0), 0),
      (3L, Seq(1.0, 1.0), 1), (4L, Seq(1.0, 1.0), 1)
    ).toDF("id", "v", "cl")
    val got = sil(df)
    assert(got(0) == ((2L, 0.0)) && got(1) == ((2L, 0.0)))
  }

  test("single cluster: no foreign centroid -> zero scored rows, null mean") {
    import spark.implicits._
    val df = Seq((1L, Seq(1.0, 0.0), 0), (2L, Seq(0.9, 0.1), 0)).toDF("id", "v", "cl")
    val got = sil(df)
    assert(got(0) == ((0L, null)))
    // the a=0 edge: a lone point AT its own centroid must also be
    // unscorable-null, not 0.0 (greatest() skips nulls on both engines)
    val lone = Seq((1L, Seq(1.0, 0.0), 0)).toDF("id", "v", "cl")
    assert(sil(lone)(0) == ((0L, null)))
  }

  test("a mislabeled point drags its assigned cluster's mean down") {
    import spark.implicits._
    val good = Seq(
      (1L, Seq(1.0, 0.0), 0), (2L, Seq(0.99, 0.01), 0),
      (3L, Seq(0.0, 1.0), 1), (4L, Seq(0.01, 0.99), 1)
    )
    val mislabeled = good :+ ((5L, Seq(0.02, 1.0), 0)) // belongs with cluster 1
    val clean = sil(good.toDF("id", "v", "cl"))
    val dirty = sil(mislabeled.toDF("id", "v", "cl"))
    assert(dirty(0)._2.asInstanceOf[Double] < clean(0)._2.asInstanceOf[Double])
  }
}
