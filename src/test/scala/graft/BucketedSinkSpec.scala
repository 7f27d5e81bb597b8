package graft

import org.apache.spark.sql.functions._

import graft.sources.Sinks

class BucketedSinkSpec extends SparkSpec {
  import spark.implicits._

  private def withConf[T](k: String, v: String)(body: => T): T = {
    val prev = spark.conf.getOption(k)
    spark.conf.set(k, v)
    try body
    finally prev.fold(spark.conf.unset(k))(spark.conf.set(k, _))
  }

  test("co-bucketed tables equi-join with ZERO exchanges and identical results") {
    val facts = (0 until 5000)
      .map(i => ((i % 97).toLong, i.toLong, i * 1.5)).toDF("k", "id", "v")
    val dims = (0L until 97L).map(k => (k, s"d_$k")).toDF("k", "name")

    Sinks.writeBucketed(facts, "bkt_facts", Seq("k"), 8,
      path = Some(tmpDir("bkt-facts")))
    Sinks.writeBucketed(dims, "bkt_dims", Seq("k"), 8,
      path = Some(tmpDir("bkt-dims")))
    try {
      // disable broadcast so the shuffle-elimination claim is what's tested
      withConf("spark.sql.autoBroadcastJoinThreshold", "-1") {
        val joined = spark.table("bkt_facts").join(spark.table("bkt_dims"), Seq("k"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"co-bucketed join must not shuffle either side:\n$plan")
        val expect = facts.join(dims, Seq("k")).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
          .toSet
        val got = joined.collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3)))
          .toSet
        assert(got === expect)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_facts")
      spark.sql("DROP TABLE IF EXISTS bkt_dims")
    }
  }

  test("aggregation on the bucket key skips its exchange too") {
    val facts = (0 until 2000).map(i => ((i % 50).toLong, i * 2.0)).toDF("k", "v")
    Sinks.writeBucketed(facts, "bkt_agg", Seq("k"), 4,
      path = Some(tmpDir("bkt-agg")))
    try {
      val agg = spark.table("bkt_agg").groupBy("k").agg(sum("v").as("s"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucket-key aggregation must not shuffle:\n$plan")
      assert(agg.count() === 50)
    } finally spark.sql("DROP TABLE IF EXISTS bkt_agg")
  }

  test("writeBucketed validates its arguments") {
    val df = Seq((1L, 2L)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      Sinks.writeBucketed(df, "t", Nil, 4)
    }
    intercept[IllegalArgumentException] {
      Sinks.writeBucketed(df, "t", Seq("a"), 0)
    }
  }
}
