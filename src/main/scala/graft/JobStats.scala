package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
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
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        tasks.incrementAndGet()
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
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      println(f"[jobstats] $n jobs=${jobs.get} stages=${stages.get} " +
        f"tasks=${tasks.get} wall=$sec%.2f s")
    }
    spark.stop()
    sys.exit(0)
  }
}
