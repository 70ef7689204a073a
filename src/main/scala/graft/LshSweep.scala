package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.DedupOps

/** MinHash LSH band-geometry sweep — the banding twin of IvfSweep
  * (IVF k/probe) and PqSweep (PQ m/k): for a fixed signature width
  * K = 16, walk every (bands b × rows r) factorization and measure,
  * against exact Jaccard ground truth on the SAME corpus:
  *   - candidates: pairs sharing any band bucket (the work the
  *     verify stage must pay);
  *   - recall: fraction of true ≥ tau pairs among candidates — the
  *     1-(1-s^r)^b S-curve, measured not asserted;
  *   - precision: fraction of candidates that verify ≥ tau.
  * More rows per band sharpens the S-curve (fewer false candidates,
  * risk of missed borderline pairs); more bands raises recall at the
  * cost of candidate volume. The shipped defaults (4×4) sit where
  * the fixture's near-dup pairs (planted at ~0.5-0.9 Jaccard)
  * stay above the knee; this sweep is the evidence by measurement —
  * and the tool to re-run when a real corpus's similarity
  * distribution differs.
  *
  * Usage: runMain graft.LshSweep <sfDir> [tau]
  */
object LshSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val tau = if (args.length > 1) args(1).toDouble else 0.5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = DedupOps.dupDocs(spark, sfDir)
    val truth = DedupOps.jaccardPairs(docs, tau)
      .select("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sigs = DedupOps.minhashSignatures(docs)
      .select("doc_id", "sig", "sh").cache()
    println(s"[lsh-sweep] corpus=$sfDir tau=$tau truePairs=${truth.size}")

    def buckets(b: Int, r: Int): DataFrame =
      sigs.select(col("doc_id"),
        explode(array((0 until b).map { i =>
          struct(lit(i).as("band"),
            xxhash64(slice(col("sig"), i * r + 1, r)).as("bucket"))
        }: _*)).as("bb"))
        .select(col("doc_id"), col("bb.band"), col("bb.bucket"))

    // every factorization of the fixed 16-wide signature
    Seq((16, 1), (8, 2), (4, 4), (2, 8), (1, 16)).foreach { case (b, r) =>
      val t0 = System.nanoTime()
      val banded = buckets(b, r).hint("shuffle_hash")
      val cand = banded.as("x").join(banded.as("y"), Seq("band", "bucket"))
        .filter(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .dropDuplicates("a", "b")
        .collect().map(row => (row.getLong(0), row.getLong(1))).toSet
      val secs = (System.nanoTime() - t0) / 1e9
      val hit = cand.intersect(truth).size
      val recall = if (truth.isEmpty) 1.0 else hit.toDouble / truth.size
      val precision = if (cand.isEmpty) 1.0 else hit.toDouble / cand.size
      println(f"[lsh-sweep] bands=$b%2d rows=$r%2d candidates=${cand.size}%6d " +
        f"recall=$recall%.3f precision=$precision%.3f wall=$secs%.2f s")
    }
    spark.stop()
    sys.exit(0)
  }
}
