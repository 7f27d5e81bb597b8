package graft

import scala.util.Random

import org.apache.spark.sql.SparkSession

import graft.plans.GraftExtensions

/** The opt-in optimizer rule must (a) actually rewrite the plan (Generate
  * nodes appear), (b) preserve results exactly, and (c) leave joins alone
  * when disabled or when the pattern doesn't match. Plus the SQL-function
  * registration of the native kernels. */
class IntervalJoinRewriteSpec extends SparkSpec {

  private def withExtSession[A](f: SparkSession => A): A = {
    SparkTestSession.get // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try f(s2)
    finally {
      SparkSession.setDefaultSession(SparkTestSession.get)
      SparkSession.setActiveSession(SparkTestSession.get)
    }
  }

  private def intervals(s: SparkSession, seed: Int, tag: String) = {
    val rng = new Random(seed)
    import s.implicits._
    (1 to 50).map { i =>
      val u = rng.nextInt(3).toLong
      val st = rng.nextInt(100).toLong
      (u, st, st + 1 + rng.nextInt(30), s"$tag$i")
    }.toDF("u", s"${tag}s", s"${tag}e", s"${tag}v")
  }

  test("rule rewrites the theta join, preserves results, and is opt-in") {
    withExtSession { s2 =>
      val l = intervals(s2, 5, "l")
      val r = intervals(s2, 6, "r")
      def overlap = l.join(r,
        l("u") === r("u") && l("ls") < r("re") && l("le") > r("rs"))

      // disabled: no Generate in the plan
      s2.conf.unset("spark.graft.intervalJoin.bucketWidth")
      val plainPlan = overlap.queryExecution.optimizedPlan.toString
      assert(!plainPlan.contains("_graft_bucket"))
      val expect = overlap.collect().map(_.toSeq).toSet

      // enabled: buckets appear, results identical
      s2.conf.set("spark.graft.intervalJoin.bucketWidth", "16")
      val rewritten = overlap
      val plan = rewritten.queryExecution.optimizedPlan.toString
      assert(plan.contains("_graft_bucket"), s"no rewrite in:\n$plan")
      val got = rewritten.collect().map(_.toSeq).toSet
      assert(got == expect)
      assert(rewritten.count() == expect.size) // containing-bucket dedup: no dups

      // non-matching pattern (single range pred) is left untouched
      val half = l.join(r, l("u") === r("u") && l("ls") < r("re"))
      assert(!half.queryExecution.optimizedPlan.toString.contains("_graft_bucket"))
      s2.conf.unset("spark.graft.intervalJoin.bucketWidth")
    }
  }

  test("kernels are callable from SQL via the extension") {
    withExtSession { s2 =>
      val r = s2.sql(
        """SELECT sorted_long_intersect_count(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS i,
          |       long_array_agree(array(1L, 5L), array(1L, 6L)) AS a,
          |       long_array_first_equal(array(7L, 8L), array(9L, 8L)) AS f,
          |       size(shingle_hashes('hello world', 5)) AS sh,
          |       size(minhash_sig(array(1L, 2L), 16)) AS ms""".stripMargin).head()
      assert(r.getInt(0) == 2)
      assert(r.getInt(1) == 1)
      assert(r.getInt(2) == 2)
      assert(r.getInt(3) > 0)
      assert(r.getInt(4) == 16)
    }
  }
}
