package graft.tools

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-JOB wall-time breakdown for one named SparkEntry query — the
  * drill-down the optimization guide's §1 asks for when the Spark UI is
  * unavailable (headless bench host). Attaches a listener, runs the
  * query once warm (rep 1 discarded as JIT), and prints every job of the
  * timed rep with its duration, stage count, task count, and
  * input/shuffle byte totals, so iterative kernels' per-round job
  * overhead and unexpected extra passes are visible from a terminal.
  *
  * Usage: `runMain graft.tools.JobProfile <name> [sfDir] [reps]`
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class Job(start: Long, var end: Long = -1L,
      var desc: String = "", var stages: Int = 0, var tasks: Int = 0,
      var inputB: Long = 0L, var shufRB: Long = 0L, var shufWB: Long = 0L)
    val jobs = TrieMap.empty[Int, Job]
    val stageToJob = TrieMap.empty[Int, Int]
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]
    @volatile var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        if (record) {
          val j = Job(System.nanoTime(),
            desc = Option(e.properties)
              .flatMap(p => Option(p.getProperty(
                "spark.job.description"))).getOrElse(""))
          jobs.put(e.jobId, j)
          order.add(e.jobId)
          e.stageIds.foreach(s => stageToJob.put(s, e.jobId))
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach(_.end = System.nanoTime())
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stageToJob.get(e.stageInfo.stageId).flatMap(jobs.get).foreach {
          j =>
            j.stages += 1
            j.tasks += e.stageInfo.numTasks
            val m = e.stageInfo.taskMetrics
            j.inputB += m.inputMetrics.bytesRead
            j.shufRB += m.shuffleReadMetrics.totalBytesRead
            j.shufWB += m.shuffleWriteMetrics.bytesWritten
        }
    })

    val fn = graft.SparkEntry.queries(name)
    // rep 0..reps-2: warm (JIT, parquet footers, memoized fixtures)
    (1 until reps).foreach { _ =>
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    }
    record = true
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val total = (System.nanoTime() - t0) / 1e9
    record = false
    Thread.sleep(300) // let listener drain
    println(f"[jobprofile] $name total ${total}%.3f s, ${jobs.size} jobs")
    var acc = 0.0
    order.forEach { id =>
      val j = jobs(id)
      val dur = if (j.end > 0) (j.end - j.start) / 1e9 else Double.NaN
      acc += (if (dur.isNaN) 0.0 else dur)
      println(f"[jobprofile]   job $id%-4d ${dur}%7.3f s  " +
        f"stages=${j.stages}%-3d tasks=${j.tasks}%-5d " +
        f"in=${j.inputB / 1024}%8dKiB sr=${j.shufRB / 1024}%6dKiB " +
        f"sw=${j.shufWB / 1024}%6dKiB  ${j.desc.take(60)}")
    }
    println(f"[jobprofile] sum of job walls ${acc}%.3f s " +
      "(gaps = driver-side planning/collect time)")
    spark.stop()
  }
}
