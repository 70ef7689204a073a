package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Deterministic per-key execution-shape profiler (r14 optimization
  * round): runs named SparkEntry keys with the bench session shape and
  * prints, for each, the number of Spark JOBS, STAGES and TASKS the
  * key launched plus its wall time. Job/stage/task counts are
  * host-noise-free — on a multi-tenant host where wall seconds swing
  * 2× between windows (see bench detail's steal_ticks stamps), the
  * count diff is the reproducible evidence that an orchestration
  * optimization (fused driver actions, removed passes) did what it
  * claims. Usage:
  *   runMain graft.JobStats <sfDir> <key1,key2,...>
  */
object JobStats {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicLong(0L)
    // SPARK_GRAFT_JOBSTATS_DETAIL=1: one line per job (call site +
    // task count) so a key's job count can be ATTRIBUTED to sites, not
    // just totalled — the streaming keys' job budget is invisible at
    // the aggregate grain.
    val detail = sys.env.get("SPARK_GRAFT_JOBSTATS_DETAIL").contains("1")
    val jobSites = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val stageJob =
      new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Integer]()
    val jobTasks =
      new java.util.concurrent.ConcurrentHashMap[Int, AtomicLong]()
    val jobStart =
      new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
    val jobMs =
      new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (detail) {
          val site = Option(j.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
            .getOrElse("?")
          jobSites.put(j.jobId, site)
          jobStart.put(j.jobId, j.time)
          j.stageIds.foreach(sid => stageJob.put(sid, j.jobId))
        }
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        if (detail) Option(jobStart.get(j.jobId)).foreach { t0 =>
          jobMs.put(j.jobId, j.time - t0)
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (detail) Option(stageJob.get(t.stageId)).foreach { jid =>
          jobTasks.computeIfAbsent(jid.intValue, _ => new AtomicLong(0L))
            .incrementAndGet()
        }
      }
    })
    // warm the page cache like Bench does, then drop those events
    Tables.all.foreach(t => Tables.load(spark, sfDir, t).count())
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      // untimed warm-up (JIT/codegen), mirroring the bench protocol
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      Thread.sleep(200) // let straggling listener events drain
      jobs.set(0); stages.set(0); tasks.set(0L)
      jobSites.clear(); stageJob.clear(); jobTasks.clear()
      jobStart.clear(); jobMs.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      println(f"[jobstats] $n jobs=${jobs.get} stages=${stages.get} " +
        f"tasks=${tasks.get} wall=$sec%.2f s")
      if (detail) {
        import scala.jdk.CollectionConverters._
        jobSites.asScala.toSeq.sortBy(_._1).foreach { case (jid, site) =>
          val nt = Option(jobTasks.get(jid)).map(_.get).getOrElse(0L)
          val ms = Option(jobMs.get(jid)).map(_.longValue).getOrElse(-1L)
          println(f"[jobstats]   $n job=$jid tasks=$nt ms=$ms site=$site")
        }
      }
    }
    spark.stop()
    sys.exit(0)
  }
}
