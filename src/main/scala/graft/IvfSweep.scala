package graft

import org.apache.spark.sql.SparkSession

import graft.operators.SimOps

/** IVF parameter sweep: runs the ANN pipeline at IVF-correct k≈√n and
  * reports, per (k, nProbe) point —
  *   - build: Lloyd centroid refinement wall time (index construction,
  *     amortized over every later query);
  *   - plan: analysis+planning wall time for the top-k query. The
  *     NearestCentroid expression carries the centroid matrix as a
  *     reference object, so this must stay flat in k (the O(1)-tree
  *     claim the r3 regression taught — an O(k²·dim) literal tree cost
  *     40 s of Catalyst/Janino at k=16);
  *   - exec: execution wall time;
  *   - recall@topK against the exact brute-force sim_cosine_topk on
  *     the same corpus.
  *
  * Usage: runMain graft.IvfSweep <sfDir> <k,k,...> [probeFrac]
  * (probeFrac defaults to the oracle keys' nProbe/nCentroids = 0.25;
  * each k probes max(1, round(k*probeFrac)) buckets.)
  */
object IvfSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val ks = args(1).split(",").map(_.trim.toInt).toSeq
    val probeFrac = if (args.length > 2) args(2).toDouble
      else SimOps.nProbe.toDouble / SimOps.nCentroids
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def secs(t0: Long): Double = (System.nanoTime() - t0) / 1e9

    // exact ground truth once per corpus
    val truth = SimOps.simCosineTopk(spark, sfDir).collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(2)).toSet).toMap

    val n = Tables.load(spark, sfDir, "embeddings").count()
    println(s"[ivf-sweep] corpus=$sfDir n=$n probeFrac=$probeFrac")

    ks.foreach { k =>
      val probes = math.max(1, math.round(k * probeFrac).toInt)
      val t0 = System.nanoTime()
      val cents = SimOps.lloydCentroids(
        SimOps.corpus(spark, sfDir), k, SimOps.lloydIters)
      val build = secs(t0)
      val t1 = System.nanoTime()
      val df = SimOps.ivfTopkWith(spark, sfDir, cents, probes)
      df.queryExecution.executedPlan // force analysis + planning
      val plan = secs(t1)
      val t2 = System.nanoTime()
      val rows = df.collect()
      val exec = secs(t2)
      val byQ = rows.groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(2)).toSet).toMap
      val recalls = truth.map { case (q, ex) =>
        byQ.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
      }
      val recall = recalls.sum / recalls.size
      println(f"[ivf-sweep] k=$k%4d nProbe=$probes%3d build=$build%.2fs " +
        f"plan=$plan%.3fs exec=$exec%.2fs recall@${SimOps.topK}=$recall%.3f")
    }
    spark.stop()
  }
}
