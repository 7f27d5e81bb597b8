package graft

import org.apache.spark.sql.functions._

import graft.operators.Profiling

class ProfilingSpec extends SparkSpec {

  test("numericProfile: hand model — nulls, distinct, range, mean; one row per column") {
    import spark.implicits._
    val df = Seq[(java.lang.Double, java.lang.Long)](
      (1.0, 10L), (2.0, 10L), (2.0, null), (null, 30L), (4.0, 30L)
    ).toDF("a", "b")
    val got = Profiling.numericProfile(df, Seq("a", "b"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(got("a") == ((1L, 3L, 1.0, 4.0, 2.25)))   // mean of 1,2,2,4
    assert(got("b") == ((1L, 2L, 10.0, 30.0, 20.0))) // mean of 10,10,30,30
  }

  test("numericProfile: ONE corpus scan — the profile must not plan a pass per column") {
    val df = Queries.byName("q32_profile")(spark, "/root/testdata/sf0.001")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1,
      s"profile must scan the table once, found $scans scans:\n${plan.take(4000)}")
  }
}
