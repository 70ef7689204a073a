package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.functions.VectorFunctions._

/** Similarity search over the `embeddings` table (`array<float>`).
  *
  * - sim_cosine_topk: brute-force exact top-k — the baseline. Query
  *   vectors broadcast; the corpus streams through once (map-side
  *   cross join, no corpus shuffle); top-k is two-stage so the
  *   per-query shuffle carries only partition-local winners.
  * - sim_ivf_topk: IVF-bucketed ANN — the scale path. Corpus is
  *   partitioned by nearest centroid; a query probes only its
  *   closest `nProbe` centroid buckets, cutting scanned vectors by
  *   ~nProbe/nCentroids at equal recall for clustered data.
  */
object SimOps {

  val topK = 5
  val nQueries = 10
  val embedDim = 64

  private def corpus(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").as("v"),
        sqrt(dotD(col("embedding"), col("embedding"))).as("nrm"))

  /** Exact brute-force top-k per query (queries = vec_id < 10).
    *
    * Stage 1 prunes to the top-k per (query, input partition) before
    * any shuffle; stage 2 ranks the ≤ k·numPartitions survivors per
    * query. At 100 TB the full score set is never shuffled — only
    * k rows per corpus partition.
    */
  def simCosineTopk(s: SparkSession, dir: String): DataFrame = {
    val c = corpus(s, dir)
    val q = c.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qnrm"))
    val scored = c.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        (dotD(col("v"), col("qv")) / (col("nrm") * col("qnrm"))).as("cosine"))
      .withColumn("pid", spark_partition_id())
    val local = Window.partitionBy(col("q_id"), col("pid"))
      .orderBy(col("cosine").desc, col("vec_id"))
    val global = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    scored
      .withColumn("lrn", row_number().over(local)).filter(col("lrn") <= topK)
      .withColumn("rank", row_number().over(global)).filter(col("rank") <= topK)
      .select("q_id", "rank", "vec_id", "cosine")
      .orderBy("q_id", "rank")
  }

  val simCosineTopkSql: String =
    s"""WITH c AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
       |  FROM embeddings),
       |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qnrm FROM c WHERE vec_id < $nQueries),
       |scored AS (
       |  SELECT q_id, vec_id,
       |    list_dot_product(c.v, q.qv) / (c.nrm * q.qnrm) AS cosine,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY list_dot_product(c.v, q.qv) / (c.nrm * q.qnrm) DESC, vec_id) AS rank
       |  FROM c CROSS JOIN q
       |  WHERE c.vec_id <> q.q_id)
       |SELECT q_id, rank, vec_id, cosine FROM scored
       |WHERE rank <= $topK
       |ORDER BY q_id, rank""".stripMargin

  /** IVF parameters: seeds are the first `nCentroids` corpus vectors,
    * refined by `lloydIters` k-means steps. */
  val nCentroids = 16
  val nProbe = 4
  val lloydIters = 2

  /** Lloyd refinement: assign every vector to its max-cosine centroid
    * (centroids broadcast — the corpus never shuffles for assignment),
    * then recompute each centroid as the elementwise mean of its
    * members (posexplode + groupBy, shuffle keyed on (centroid, pos):
    * O(n·dim) thin rows, combiner-friendly). */
  def lloydCentroids(c: DataFrame, k: Int, iters: Int): DataFrame = {
    var cents = c.filter(col("vec_id") < k)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nrm").as("cnrm"))
    for (_ <- 0 until iters) {
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("cos_c").desc, col("c_id"))
      val assigned = c.join(broadcast(cents), lit(true))
        .select(col("vec_id"), col("v"), col("c_id"),
          (dotD(col("v"), col("cv")) / (col("nrm") * col("cnrm"))).as("cos_c"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      // one-pass elementwise mean (custom Aggregator): one buffer per
      // (centroid, partition) shuffles, vs dim rows for posexplode
      val means = assigned
        .groupBy(col("c_id"))
        .agg(graft.functions.VectorMean.of(embedDim)(col("v")).as("cv"))
      cents = means.select(col("c_id"), col("cv"),
        sqrt(dotD(col("cv"), col("cv"))).as("cnrm"))
    }
    cents
  }

  /** Nearest-centroid assignment: rank the broadcast centroids per
    * corpus row; the corpus itself never shuffles for assignment. */
  def assignTo(c: DataFrame, cents: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos_c").desc, col("c_id"))
    c.join(broadcast(cents), lit(true))
      .select(col("vec_id"), col("v"), col("nrm"), col("c_id"),
        (dotD(col("v"), col("cv")) / (col("nrm") * col("cnrm"))).as("cos_c"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("nrm"), col("c_id").as("centroid"))
  }

  def ivfAssignments(s: SparkSession, dir: String): DataFrame = {
    val c = corpus(s, dir)
    assignTo(c, lloydCentroids(c, nCentroids, lloydIters))
  }

  /** ANN top-k probing only the `nProbe` nearest centroid buckets per
    * query. Output schema matches sim_cosine_topk for recall checks.
    * Centroids are computed once and persisted so assignment and
    * probe ranking see identical values (Lloyd's mean aggregation is
    * float-order nondeterministic across recomputation). */
  def simIvfTopk(s: SparkSession, dir: String): DataFrame = {
    val c = corpus(s, dir)
    val cents = lloydCentroids(c, nCentroids, lloydIters).persist()
    val assigned = assignTo(c, cents)
    val q = c.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nrm").as("qnrm"))
    // per query: its nProbe closest centroids
    val wq = Window.partitionBy(col("q_id")).orderBy(col("cos_c").desc, col("c_id"))
    val probes = q.join(broadcast(cents), lit(true))
      .select(col("q_id"), col("qv"), col("qnrm"), col("c_id"),
        (dotD(col("qv"), col("cv")) / (col("qnrm") * col("cnrm"))).as("cos_c"))
      .withColumn("rn", row_number().over(wq)).filter(col("rn") <= nProbe)
      .select(col("q_id"), col("qv"), col("qnrm"), col("c_id").as("centroid"))
    // scan only probed buckets (join keyed on centroid — bucket-local)
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("vec_id"))
    assigned.join(broadcast(probes), Seq("centroid"))
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"),
        (dotD(col("v"), col("qv")) / (col("nrm") * col("qnrm"))).as("cosine"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= topK)
      .select("q_id", "rank", "vec_id", "cosine")
      .orderBy("q_id", "rank")
  }

  /** Uint8 affine quantization of embeddings [T]: per-vector
    * (zero, scale) so each float column stores in 1/4 the bytes —
    * the standard storage/IO reduction before ANN at 100 TB. Pure
    * Column arithmetic; the spec bounds reconstruction error at
    * scale/2 per element and checks dequantized cosine fidelity. */
  def embedQuantize(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.load(s, dir, "embeddings")
    val v = col("embedding")
    val zero = array_min(v).cast("double")
    val scale = (array_max(v).cast("double") - zero) / 255.0
    e.select(col("vec_id"), zero.as("zero"), scale.as("scale"),
      transform(v, x => round((x.cast("double") - zero) / scale)
        .cast("int")).as("q"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_cosine_topk" -> (simCosineTopk _),
    "sim_ivf_topk" -> (simIvfTopk _),
    "embed_quantize" -> (embedQuantize _))

  val oracles: Map[String, String] = Map(
    "sim_cosine_topk" -> simCosineTopkSql)
}
