package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan (and optionally
  * times execution) for named SparkEntry queries. Usage:
  *   runMain graft.Explain <sfDir> <query> [time]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = if (args.length > 1 && args(1) != "all") Seq(args(1))
      else SparkEntry.queries.keys.toSeq.sorted
    val doTime = args.contains("time")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"\n===== $n =====")
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.explain("formatted")
      if (doTime) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[time] $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
