package graft.tools

import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev profiling tool (guide §1): for each query named on the command line
  * (or every registered query with no args), time two full evaluations
  * through the bench's own hash-fold force (rep1 warm-up, rep2 comparable)
  * while a listener counts jobs / stages / tasks and sums task time and
  * shuffle bytes — separating driver-side cost (planning, codegen, job
  * scheduling: wall − task-time/cores) from executor compute. Output is one
  * parseable line per query:
  *
  *   PROF <name> wall=<s> jobs=<n> stages=<n> tasks=<n> taskSec=<s>
  *        shRead=<MB> shWrite=<MB>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.LocalSpark.session(cpus, "graft-profile")
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskMs = new AtomicLong(0)
    val shRead = new AtomicLong(0)
    val shWrite = new AtomicLong(0)
    val execs = new AtomicInteger(0)
    val catalystMs = new AtomicLong(0)
    // per-action Catalyst time (analysis + optimization + physical planning)
    // from the QueryExecution tracker — the driver-side cost the task
    // metrics cannot see
    val qel = new org.apache.spark.sql.util.QueryExecutionListener {
      private def record(qe: org.apache.spark.sql.execution.QueryExecution): Unit = {
        execs.incrementAndGet()
        catalystMs.addAndGet(qe.tracker.phases.values.map(p => p.endTimeMs - p.startTimeMs).sum)
        ()
      }
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit = record(qe)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = record(qe)
    }
    spark.listenerManager.register(qel)
    // GRAFT_PROFILE_JOBS=1: print one line per job (start offset, duration,
    // description) so a query's job composition is attributable
    val traceJobs = sys.env.get("GRAFT_PROFILE_JOBS").exists(v => v.nonEmpty && v != "0")
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (traceJobs) {
          val desc = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
          val cs = Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("")
          jobStarts.put(j.jobId, (System.nanoTime(), s"$cs | $desc"))
        }
        ()
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        if (traceJobs) {
          Option(jobStarts.remove(j.jobId)).foreach { case (t0, desc) =>
            println(f"  JOB ${j.jobId}%4d ${(System.nanoTime() - t0) / 1e3}%9.0fus $desc")
          }
        }
        ()
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = { stages.incrementAndGet(); () }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null) {
          taskMs.addAndGet(t.taskMetrics.executorRunTime)
          shRead.addAndGet(t.taskMetrics.shuffleReadMetrics.totalBytesRead)
          shWrite.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
        }
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { q =>
      (1 to 2).foreach { rep =>
        graft.Bench.clearAllCaches(spark)
        // settle the listener bus so counts attribute to this repeat
        // (listenerBus is private[spark]; a short sleep drains it in practice)
        Thread.sleep(200)
        jobs.set(0); stages.set(0); tasks.set(0); taskMs.set(0); shRead.set(0); shWrite.set(0)
        execs.set(0); catalystMs.set(0)
        val t0 = System.nanoTime()
        try {
          graft.Bench.forceFrame(graft.SparkEntry.queries(q)(spark, sfDir))
          val wall = (System.nanoTime() - t0) / 1e9
          Thread.sleep(200)
          println(f"PROF $q rep$rep wall=$wall%.3f jobs=${jobs.get} stages=${stages.get} " +
            f"tasks=${tasks.get} taskSec=${taskMs.get / 1e3}%.2f " +
            f"shReadMB=${shRead.get / 1e6}%.1f shWriteMB=${shWrite.get / 1e6}%.1f " +
            f"execs=${execs.get} catalystSec=${catalystMs.get / 1e3}%.2f")
        } catch {
          case e: Throwable =>
            println(s"PROF $q rep$rep FAILED ${e.toString.replaceAll("\\s+", " ").take(200)}")
        }
      }
    }
    spark.stop()
  }
}
