package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler._
import scala.collection.mutable

/** Per-query empirical profile (optimization-guide §1 tooling): runs one
  * named query with a listener that records every job and stage — wall
  * clock, task count, shuffle read/write bytes — and dumps the formatted
  * physical plan. `runMain graft.tools.ProfileQuery <name> [sfDir] [reps]
  * [planOut]`. The job/stage table is what the Spark UI would show with
  * `spark.ui.enabled=false`. */
object ProfileQuery {

  final class Rec extends SparkListener {
    case class St(name: String, var ms: Long = 0, var tasks: Int = 0,
                  var shRead: Long = 0, var shWrite: Long = 0,
                  var input: Long = 0, var sub: Long = 0)
    val stages = mutable.LinkedHashMap.empty[Int, St]
    val jobs = mutable.LinkedHashMap.empty[Int, (Long, Long)]
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val i = sc.stageInfo
      // the short callsite is an AQE thread-pool frame for every stage;
      // pull the first graft.* frame from the long form instead
      val graftFrame = i.details.linesIterator
        .find(l => l.contains("graft.") && !l.contains("ProfileQuery"))
        .map(_.trim).getOrElse(i.name.takeWhile(_ != '\n'))
      val st = stages.getOrElseUpdate(i.stageId, St(graftFrame))
      st.ms = i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)
      st.tasks = i.numTasks
      st.shRead = i.taskMetrics.shuffleReadMetrics.totalBytesRead
      st.shWrite = i.taskMetrics.shuffleWriteMetrics.bytesWritten
      st.input = i.taskMetrics.inputMetrics.bytesRead
      st.sub = i.submissionTime.getOrElse(0L)
    }
    override def onJobStart(j: SparkListenerJobStart): Unit =
      jobs(j.jobId) = (j.time, 0L)
    override def onJobEnd(j: SparkListenerJobEnd): Unit =
      jobs.get(j.jobId).foreach(t => jobs(j.jobId) = (t._1, j.time))
  }

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val planOut = args.lift(3)
    val spark = GraftSession.build("local[32]")
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    // warm rep (codegen/JIT is a JVM property, not a plan property)
    fn(spark, dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    var rec = new Rec
    spark.sparkContext.addSparkListener(rec)
    var minW = Double.MaxValue
    (1 to reps).foreach { i =>
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      if (i == reps) { // record ONLY the final (steady-state) rep
        spark.sparkContext.removeSparkListener(rec)
        rec = new Rec
        spark.sparkContext.addSparkListener(rec)
      }
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val w = (System.nanoTime() - t0) / 1e9
      minW = math.min(minW, w)
      println(f"[prof] $name rep$i wall $w%7.3f s")
    }
    spark.sparkContext.removeSparkListener(rec)
    Thread.sleep(300)
    val nJobs = rec.jobs.size
    val jobMs = rec.jobs.values.map(t => t._2 - t._1).sum
    println(f"[prof] $name min wall $minW%7.3f s | jobs over $reps reps: $nJobs (sum ${jobMs / 1000.0}%7.2f s)")
    println("[prof] stages (all reps, by submission):")
    rec.stages.values.toSeq.sortBy(_.sub).foreach { s =>
      println(f"[prof]   ${s.ms}%6d ms  tasks=${s.tasks}%3d  in=${s.input / 1024}%8d KiB  shR=${s.shRead / 1024}%7d KiB  shW=${s.shWrite / 1024}%7d KiB  ${s.name.take(70)}")
    }
    planOut.foreach { p =>
      val df = fn(spark, dir)
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      println(s"[prof] plan written to $p")
    }
    spark.stop()
  }
}
