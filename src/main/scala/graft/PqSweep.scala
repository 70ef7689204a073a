package graft

import org.apache.spark.sql.SparkSession

import graft.operators.SimOps

/** Product-quantization parameter sweep: recall@k of full-scan ADC
  * vs the exact brute force across (m subspaces × k codebook
  * entries), with the compression ratio each point buys. The PQ twin
  * of IvfSweep — it measures the trade-off the pqM/pqK defaults sit
  * on instead of asserting it. Usage:
  *
  *   runMain graft.PqSweep <sfDir> [mList] [kList]
  *
  * Prints one JSON line per grid point:
  *   {"m":4,"k":16,"recall":0.28,"bytes_per_vec":4,"compression":64.0,
  *    "build_s":2.1,"query_s":0.4}
  */
object PqSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val ms = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
      else Seq(2, 4, 8, 16)
    val ks = if (args.length > 2) args(2).split(",").map(_.toInt).toSeq
      else Seq(16, 64, 256)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.collect()
        .groupBy(_.getAs[Long]("q_id"))
        .map { case (q, rs) => q -> rs.map(_.getAs[Long]("vec_id")).toSet }
    val exact = topSets(SimOps.simCosineTopk(spark, sfDir))
    val rawBytes = SimOps.embedDim * 4 // float32 corpus vector

    for (m <- ms; k <- ks) {
      val t0 = System.nanoTime()
      val books = SimOps.buildCodebooks(SimOps.corpus(spark, sfDir), m, k)
      val buildS = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val approx = topSets(SimOps.adcTopk(spark, sfDir, books))
      val queryS = (System.nanoTime() - t1) / 1e9
      val recall = exact.map { case (q, s) =>
        approx.getOrElse(q, Set.empty).intersect(s).size.toDouble / s.size
      }.sum / exact.size
      // one code per subspace; k <= 256 fits a byte, larger needs two
      val bytes = m * (if (k <= 256) 1 else 2)
      println(f"""{"m":$m,"k":$k,"recall":$recall%.3f,""" +
        f""""bytes_per_vec":$bytes,"compression":${rawBytes.toDouble / bytes}%.1f,""" +
        f""""build_s":$buildS%.2f,"query_s":$queryS%.2f}""")
    }
    spark.stop()
    sys.exit(0)
  }
}
