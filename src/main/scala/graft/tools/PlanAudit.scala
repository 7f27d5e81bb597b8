package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dump formatted physical plans for every query (dev tooling): the audit
  * loop for scan pruning, pushdown, join strategy, and codegen coverage. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val out = args.drop(1).headOption.getOrElse("/tmp/plan_audit.txt")
    val spark = GraftSession.build("local[8]", shufflePartitions = 8)
    val sb = new StringBuilder
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, dir)
        sb.append(s"\n========== $name ==========\n")
        sb.append(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      } catch { case e: Throwable =>
        sb.append(s"\n========== $name FAILED: ${e.getMessage}\n")
      }
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), sb.toString)
    println(s"[audit] wrote $out")
    spark.stop()
  }
}
