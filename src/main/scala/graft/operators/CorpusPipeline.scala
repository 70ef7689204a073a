package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The full training-corpus assembly as ONE composed declarative
  * plan — the flagship shape every other key is a piece of:
  *
  *   crawl (dup-injected documents)
  *     → quality gate        (TextOps.qualityExpr ≥ threshold)
  *     → near-dup prune      (DedupOps.clusterLabels: keep each
  *                            transitive cluster's canonical doc)
  *     → train split         (TextOps.hashBucket < 850)
  *     → sequence packing    (TextOps.packFrame distributed scan)
  *
  * Every stage reuses the exact operator the standalone key
  * exercises, and the DuckDB oracle recomposes the same chain from
  * the shared SQL fragments (quality formula, component CTEs, hash
  * bucket, pack scan) — so the END-TO-END manifest, not just each
  * stage, is hash-verified. The quality gate applies to cluster
  * representatives: a cluster whose canonical fails the gate drops
  * entirely (its members were near-copies of a rejected doc).
  */
object CorpusPipeline {

  /** Keeps the upper ~two-thirds of the synthetic corpus (median
    * quality ≈ 0.45) — a real gate that drops rows without starving
    * the downstream stages. */
  val qualityThreshold = 0.40

  def pipelineTrainCorpus(s: SparkSession, dir: String): DataFrame = {
    val docs = DedupOps.dupDocs(s, dir)
    // consume the nightly dedup service's PUBLISHED labels (built once
    // per corpus fingerprint) — the oracle still recomputes components
    // independently, so the artifact is verified, not trusted
    val labels = DedupOps.publishedLabels(s, dir)
    val kept = docs
      .join(labels, "doc_id")
      .filter(TextOps.qualityExpr(col("text")) >= qualityThreshold)
      .filter(col("canonical_id") === col("doc_id"))
      .filter(TextOps.hashBucket(col("doc_id")) < 850)
    TextOps.packFrame(kept.select(col("doc_id"),
      size(TextOps.toks(col("text"))).as("n_tokens")))
  }

  val pipelineTrainCorpusSql: String =
    s"""WITH RECURSIVE
       |corpus AS (${DedupOps.dupDocsSql}),
       |${DedupOps.componentsCtesSql},
       |comp AS (SELECT u AS doc_id, MIN(lbl) AS canonical_id
       |         FROM reach GROUP BY u),
       |stats AS (
       |  SELECT doc_id, ${TextOps.qualityFormulaSql} AS quality
       |  FROM (${TextOps.qualityStatsSql("corpus")}) s),
       |kept AS (
       |  SELECT c.doc_id,
       |    CAST(len(list_filter(string_split(c.text, ' '), x -> x <> ''))
       |      AS INT) AS n_tokens
       |  FROM corpus c
       |  JOIN comp USING (doc_id)
       |  JOIN stats USING (doc_id)
       |  WHERE stats.quality >= $qualityThreshold
       |    AND comp.canonical_id = c.doc_id
       |    AND ${TextOps.hashBucketSql} < 850),
       |cum AS (
       |  SELECT doc_id, n_tokens,
       |    SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
       |      - n_tokens AS start
       |  FROM kept)
       |SELECT doc_id, n_tokens,
       |  CAST(start // ${TextOps.packBudget} AS BIGINT) AS seq_id,
       |  CAST(start % ${TextOps.packBudget} AS BIGINT) AS seq_offset
       |FROM cum ORDER BY doc_id""".stripMargin

  /** Leakage-safe train/val/test split: the split is decided by the
    * near-dup CLUSTER's canonical id, not the doc's own id, so two
    * near-duplicate documents can never land on opposite sides of
    * the train/test boundary — the contamination a per-doc hash
    * split (text_train_split) permits by construction whenever a
    * planted pair's ids bucket differently. The eval-set integrity
    * step of every production corpus: dedup tells you two docs are
    * the same; the SPLIT must honor that or the test set leaks into
    * training. Same distributed shape as dedup_clusters (the label
    * frame is thin) plus one codegen'd bucket projection; the oracle
    * recomposes components + bucket arithmetic from the shared SQL
    * fragments. */
  def pipelineSplitSafe(s: SparkSession, dir: String): DataFrame = {
    // published labels (see pipelineTrainCorpus); oracle-verified
    val labels = DedupOps.publishedLabels(s, dir)
    labels
      .select(col("doc_id"), col("canonical_id"),
        TextOps.hashBucket(col("canonical_id")).as("bucket"))
      .withColumn("split",
        when(col("bucket") < 850, "train")
          .when(col("bucket") < 925, "val")
          .otherwise("test"))
      .orderBy("doc_id")
  }

  val pipelineSplitSafeSql: String =
    s"""WITH RECURSIVE
       |corpus AS (${DedupOps.dupDocsSql}),
       |${DedupOps.componentsCtesSql},
       |comp AS (SELECT u AS doc_id, MIN(lbl) AS canonical_id
       |         FROM reach GROUP BY u)
       |SELECT doc_id, canonical_id,
       |  ${TextOps.hashBucketSqlOn("canonical_id")} AS bucket,
       |  CASE WHEN ${TextOps.hashBucketSqlOn("canonical_id")} < 850 THEN 'train'
       |       WHEN ${TextOps.hashBucketSqlOn("canonical_id")} < 925 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM comp ORDER BY doc_id""".stripMargin

  /** Per-(lang, source) sample size: small enough that fixture strata
    * exercise BOTH regimes — capped (stratum > k, exactly k drawn) and
    * under-full (stratum ≤ k, all rows kept). */
  val sampleK = 5

  /** Deterministic stratified sample — the eval-holdout / data-mix
    * audit primitive: exactly min(k, |stratum|) documents per
    * (lang, source) stratum, drawn by a seeded hash order so the
    * sample is a pure function of the corpus (reruns, retries, and
    * the oracle all see the same draw — no RNG state anywhere).
    * Scale shape: the draw key is a codegen'd projection and the
    * per-stratum top-k runs on TopKPerKey's bounded heaps
    * (partial heap per partition → one shuffle of ≤ k·partitions
    * rows per stratum → final heap) — NOT a window rank, which
    * would funnel each stratum through one reducer and sort it
    * whole. md5 is the draw hash because both engines render it
    * identically (lowercase hex over the utf8 bytes), making the
    * ORDER — not just the membership — oracle-checkable. */
  def pipelineStratifiedSample(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("source"),
        md5(concat(col("doc_id").cast("string"), lit(":holdout-v1")))
          .as("draw"))
    graft.plans.TopKPerKey.topK(docs,
        keyCols = Seq("lang", "source"),
        orderBy = Seq(col("draw"), col("doc_id")), k = sampleK)
      .orderBy("lang", "source", "draw", "doc_id")
  }

  val pipelineStratifiedSampleSql: String =
    s"""SELECT doc_id, lang, source, draw FROM (
       |  SELECT doc_id, lang, source,
       |    md5(CAST(doc_id AS VARCHAR) || ':holdout-v1') AS draw,
       |    ROW_NUMBER() OVER (PARTITION BY lang, source
       |      ORDER BY md5(CAST(doc_id AS VARCHAR) || ':holdout-v1'), doc_id)
       |      AS rn
       |  FROM documents) t
       |WHERE rn <= $sampleK
       |ORDER BY lang, source, draw, doc_id""".stripMargin

  /** Eval-set decontamination — the published training-pipeline step
    * (GPT-3 appendix C / Llama style): flag every TEST-split document
    * that shares an n-gram window with ANY train-split document.
    * Distinct from pipeline_split_safe, which keeps near-DUPLICATES
    * on one side: a test doc quoting one train paragraph is not a
    * near-dup (Jaccard far below tau) yet still contaminates the
    * benchmark — containment, not similarity.
    *
    * Scale shape: shingles shuffle as 64-bit xxhash64 keys, never
    * text (the oracle joins the raw shingle STRINGS — identical
    * answers unless 64-bit hashes collide inside one corpus, the
    * same disclosed odds as dedup_minhash); the train side reduces
    * to DISTINCT hashes before the join; every corpus-sized join is
    * pinned to shuffle (broadcast ban: a driver-built train-shingle
    * broadcast is fatal at 100 TB). One thin (hash, doc_id) shuffle
    * per side — contamination of the whole eval set costs ~one
    * dedup pass, not eval × train. */
  def pipelineDecontaminate(s: SparkSession, dir: String): DataFrame =
    decontaminateFrame(s, dir, hashed = true)

  /** String-shingle twin (hashed=false) exists for the spec only: it
    * proves the 64-bit hash path is invisible in the answer. */
  private[graft] def decontaminateFrame(
      s: SparkSession, dir: String, hashed: Boolean): DataFrame = {
    val docs = graft.Tables.load(s, dir, "documents")
      .select(col("doc_id"), TextOps.hashBucket(col("doc_id")).as("bucket"),
        DedupOps.shingles(col("text")).as("sh"))
    val shRaw = docs
      .select(col("doc_id"), col("bucket"), explode(col("sh")).as("shingle"))
    val sh =
      if (hashed) shRaw.select(col("doc_id"), col("bucket"),
        xxhash64(col("shingle")).as("shingle"))
      else shRaw
    val trainSh = sh.filter(col("bucket") < 850).select("shingle").distinct()
    val shared = sh.filter(col("bucket") >= 925).select("doc_id", "shingle")
      .join(trainSh.hint("shuffle_hash"), "shingle")
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    docs.filter(col("bucket") >= 925)
      .select(col("doc_id"), size(col("sh")).as("n_shingles"))
      .join(shared.hint("shuffle_hash"), Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_shared"))
      .withColumn("contamination",
        when(col("n_shingles") > 0,
          col("n_shared").cast("double") / col("n_shingles"))
          .otherwise(lit(0.0)))
      .orderBy("doc_id")
  }

  val pipelineDecontaminateSql: String =
    s"""WITH tok AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
       |  FROM documents),
       |shl AS (SELECT doc_id, ${DedupOps.shinglesSql} AS shs FROM tok),
       |sh AS (SELECT doc_id, unnest(shs) AS shingle FROM shl),
       |train_sh AS (
       |  SELECT DISTINCT shingle FROM sh WHERE ${TextOps.hashBucketSql} < 850),
       |shared AS (
       |  SELECT doc_id, COUNT(*) AS n_shared
       |  FROM sh JOIN train_sh USING (shingle)
       |  WHERE ${TextOps.hashBucketSql} >= 925
       |  GROUP BY doc_id)
       |SELECT d.doc_id, CAST(len(d.shs) AS INTEGER) AS n_shingles,
       |  COALESCE(s.n_shared, 0) AS n_shared,
       |  CASE WHEN len(d.shs) > 0
       |       THEN CAST(COALESCE(s.n_shared, 0) AS DOUBLE) / len(d.shs)
       |       ELSE 0.0 END AS contamination
       |FROM shl d LEFT JOIN shared s USING (doc_id)
       |WHERE ${TextOps.hashBucketSqlOn("d.doc_id")} >= 925
       |ORDER BY doc_id""".stripMargin

  /** Dataset card — the release manifest every published corpus
    * ships (composition by source × language, token/char budgets,
    * quality-gate pass rates, median doc length): what a consumer
    * reads BEFORE training and what a data audit diffs BETWEEN
    * releases. Three grains in one pass via GROUPING SETS —
    * (source, lang), per-source, grand total — so the card's
    * subtotals can never drift from its cells; the quality column
    * reuses the SHARED gate expression (TextOps.qualityExpr ≥
    * threshold), so the card's pass rate is definitionally the
    * pipeline's. Exact arithmetic throughout: integer sums, the
    * exact interpolated median (percentile ≡ quantile_cont
    * bit-for-bit, the q_percentile contract); one doc-grain scan +
    * the Expand aggregate — O(sources × langs) result at any corpus
    * size. */
  def pipelineDatasetCard(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.load(s, dir, "documents")
      .select(col("source"), col("lang"),
        size(TextOps.toks(col("text"))).as("n_toks"), col("n_chars"),
        when(TextOps.qualityExpr(col("text")) >= qualityThreshold, 1L)
          .otherwise(0L).as("q"))
      .createOrReplaceTempView("graft_card_src")
    s.sql(
      """SELECT CAST(grouping_id(source, lang) AS BIGINT) AS gid,
        |  source, lang,
        |  COUNT(*) AS n_docs, SUM(n_toks) AS n_tokens,
        |  SUM(n_chars) AS total_chars, SUM(q) AS n_quality,
        |  percentile(n_toks, 0.5) AS med_tokens
        |FROM graft_card_src
        |GROUP BY GROUPING SETS ((source, lang), (source), ())
        |ORDER BY gid, source, lang""".stripMargin)
  }

  val pipelineDatasetCardSql: String =
    s"""WITH q AS (
       |  SELECT doc_id, ${TextOps.qualityFormulaSql} AS quality
       |  FROM (${TextOps.qualityStatsSql("documents")}) x),
       |t AS (
       |  SELECT d.source, d.lang,
       |    CAST(len(list_filter(string_split(d.text, ' '), x -> x <> ''))
       |      AS BIGINT) AS n_toks,
       |    d.n_chars,
       |    CASE WHEN q.quality >= $qualityThreshold THEN 1 ELSE 0 END AS q
       |  FROM documents d JOIN q USING (doc_id))
       |SELECT CAST(GROUPING(source, lang) AS BIGINT) AS gid, source, lang,
       |  COUNT(*) AS n_docs, CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
       |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       |  CAST(SUM(q) AS BIGINT) AS n_quality,
       |  quantile_cont(n_toks, 0.5) AS med_tokens
       |FROM t
       |GROUP BY GROUPING SETS ((source, lang), (source), ())
       |ORDER BY gid, source, lang""".stripMargin

  /** Epoch-shuffle geometry: training-worker shard count and epochs
    * materialized. At scale shards == data-parallel workers (a conf);
    * two epochs suffice to prove the reshuffle property. */
  val epochShards = 8
  val epochCount = 2

  /** Deterministic epoch shuffling — the training-loader primitive
    * (MosaicML streaming / tf.data shuffle files): every epoch is a
    * fresh pseudorandom permutation of the corpus, sharded across
    * data-parallel workers, that any node can recompute INDEPENDENTLY
    * (resume from step k without replaying the stream; rerun
    * bit-identically for debugging). rand() cannot give any of that —
    * the draw is md5(doc_id : epoch), the engine-portable seeded hash
    * pipeline_stratified_sample established.
    *
    * Shard = first md5 byte mod shards (hex-digit arithmetic both
    * engines share); within-shard order = ROW_NUMBER over the draw.
    * The per-(epoch, shard) window is the point, not a compromise: a
    * GLOBAL order would serialize the corpus through one reducer,
    * while each shard's window is exactly its worker's sample order —
    * the parallel grain of the consumer. */
  def pipelineEpochShuffle(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.load(s, dir, "documents").select(col("doc_id"))
    val epochs = (0 until epochCount).map { e =>
      docs.select(lit(e).as("epoch"), col("doc_id"),
        md5(concat(col("doc_id").cast("string"), lit(s":epoch$e")))
          .as("draw"))
    }.reduce(_.union(_))
    val hx = "0123456789abcdef"
    val shard =
      ((instr(lit(hx), substring(col("draw"), 1, 1)) - 1) * 16 +
        (instr(lit(hx), substring(col("draw"), 2, 1)) - 1)) % epochShards
    val w = Window.partitionBy(col("epoch"), col("shard"))
      .orderBy(col("draw"), col("doc_id"))
    epochs.withColumn("shard", shard.cast("int"))
      .withColumn("pos", row_number().over(w))
      .select("epoch", "shard", "pos", "doc_id")
  }

  val pipelineEpochShuffleSql: String = {
    val legs = (0 until epochCount).map { e =>
      s"""SELECT $e AS epoch, doc_id,
         |  md5(CAST(doc_id AS VARCHAR) || ':epoch$e') AS draw
         |FROM documents""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH draws AS (
       |$legs),
       |sharded AS (
       |  SELECT epoch, doc_id, draw,
       |    CAST(((strpos('0123456789abcdef', substr(draw, 1, 1)) - 1) * 16
       |      + (strpos('0123456789abcdef', substr(draw, 2, 1)) - 1))
       |      % $epochShards AS INTEGER) AS shard
       |  FROM draws)
       |SELECT epoch, shard,
       |  CAST(ROW_NUMBER() OVER (PARTITION BY epoch, shard
       |    ORDER BY draw, doc_id) AS INTEGER) AS pos,
       |  doc_id
       |FROM sharded""".stripMargin
  }

  /** Weighted sample size (big enough that heavy docs' dominance is
    * visible, small enough that the fixture has real competition). */
  val weightedK = 100

  /** Deterministic weighted sampling without replacement
    * (Efraimidis–Spirakis A-ES): draw [[weightedK]] documents with
    * probability proportional to length — the mixture-sampling step
    * that upweights long documents (or any importance weight) when
    * assembling a training slice. Each doc gets key = ln(u)/w for a
    * pseudo-random u ∈ (0,1]; the top-k keys ARE the weighted draw
    * (Efraimidis & Spirakis 2006). u comes from a Knuth
    * multiplicative hash of doc_id — a pure function of the corpus,
    * so reruns, retries, and the oracle all see the same sample (the
    * same no-RNG-state discipline as pipeline_stratified_sample,
    * extended to weighted draws).
    *
    * Scale shape: the key is a codegen'd projection; top-k lowers to
    * TakeOrdered (per-partition bounded heap → one merge of
    * k·partitions rows) — no global sort, no window over the corpus.
    * The float key never reaches the output (ranks and ids only), so
    * last-ulp ln() differences across engines cannot touch the hash. */
  def pipelineWeightedSample(s: SparkSession, dir: String): DataFrame = {
    val keyed = graft.Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        expr("ln(((doc_id * 2654435761 + 12345) % 4294967296 + 1)" +
          " / 4294967297.0) / cast(n_chars as double)").as("k"))
    keyed.orderBy(col("k").desc, col("doc_id")).limit(weightedK)
      .select(
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("k").desc, col("doc_id"))).as("sample_rank"),
        col("doc_id"), col("n_chars"))
  }

  val pipelineWeightedSampleSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, n_chars,
       |    ln(((doc_id * 2654435761 + 12345) % 4294967296 + 1)
       |       / 4294967297.0) / CAST(n_chars AS DOUBLE) AS k
       |  FROM documents)
       |SELECT CAST(ROW_NUMBER() OVER (ORDER BY k DESC, doc_id) AS INT)
       |    AS sample_rank,
       |  doc_id, n_chars
       |FROM d ORDER BY k DESC, doc_id LIMIT $weightedK""".stripMargin

  /** Cumulative percent boundaries of the curriculum phases:
    * warmup 50%, core 30%, anneal 20%. */
  val curriculumCuts: Seq[(String, Long)] =
    Seq(("warmup", 50L), ("core", 80L))

  /** Curriculum assignment — order the corpus by difficulty and cut
    * it into training phases with EXACT boundaries (warmup 50% /
    * core 30% / anneal 20%): the curriculum-learning schedule step,
    * where "about half" is not a spec (loaders need phase manifests
    * that partition the corpus exactly, reproducibly). Difficulty
    * here is token count — integer, engine-shared; production plugs
    * any integer difficulty score in unchanged.
    *
    * Scale shape: the global difficulty rank delegates to
    * [[graft.plans.GlobalRank.withRankAndTotal]] (range partition on
    * the rank key → bucket-local row_number → O(partitions) offsets
    * driver-side), whose returned total replaces the separate
    * docs.count() this key used to pay; boundaries are pure integer
    * arithmetic on that count (b = n·pct div 100), so phases
    * partition the corpus exactly at any size with no percentage
    * float anywhere. */
  def pipelineCurriculum(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        size(TextOps.toks(col("text"))).cast("long").as("difficulty"))
    val (ranked, n) = graft.plans.GlobalRank.withRankAndTotal(
      s, docs, Seq(col("difficulty"), col("doc_id")), "rnk")
    val cuts = curriculumCuts.map { case (p, pct) => (p, n * pct / 100) }
    val phase = cuts.foldRight(lit("anneal")) { case ((p, b), e) =>
      when(col("rnk") <= b, p).otherwise(e)
    }
    ranked.select(col("doc_id"), col("difficulty"), col("rnk"),
      phase.as("phase"))
  }

  val pipelineCurriculumSql: String = {
    val Seq((p1, c1), (p2, c2)) = curriculumCuts
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
       |      AS BIGINT) AS difficulty
       |  FROM documents),
       |r AS (
       |  SELECT doc_id, difficulty,
       |    ROW_NUMBER() OVER (ORDER BY difficulty, doc_id) AS rnk,
       |    COUNT(*) OVER () AS n
       |  FROM t)
       |SELECT doc_id, difficulty, CAST(rnk AS BIGINT) AS rnk,
       |  CASE WHEN rnk <= n * $c1 // 100 THEN '$p1'
       |       WHEN rnk <= n * $c2 // 100 THEN '$p2'
       |       ELSE 'anneal' END AS phase
       |FROM r""".stripMargin
  }

  /** Preference-pair construction — the DPO/RLHF data-prep step:
    * within each candidate group, pair the best-scored response with
    * the worst and record the margin; groups whose candidates all tie
    * carry no preference signal and are dropped. The fixture stands
    * in (source, lang) for the prompt id and the integer n_chars
    * column for the reward-model score — any grouping and any integer
    * score plug in unchanged.
    *
    * Scale shape: one map-side-combined groupBy — chosen and rejected
    * are max/min over a (score, id) struct, so the exchange carries
    * two structs + a count per group, never the candidate rows. No
    * window (a per-group rank would sort every candidate); no join.
    * Tie-breaks are total (score, then id) so the pair set is
    * deterministic under any partitioning. */
  def pipelinePrefPairs(s: SparkSession, dir: String): DataFrame = {
    val cands = graft.Tables.load(s, dir, "documents")
      .select(col("source"), col("lang"), col("doc_id"),
        col("n_chars").as("score"))
    cands.groupBy("source", "lang")
      .agg(count(lit(1)).as("n_cands"),
        max(struct(col("score"), col("doc_id"))).as("b"),
        min(struct(col("score"), col("doc_id"))).as("w"))
      .filter(col("b.score") > col("w.score"))
      .select(col("source"), col("lang"), col("n_cands"),
        col("b.doc_id").as("chosen_id"), col("w.doc_id").as("rejected_id"),
        (col("b.score") - col("w.score")).as("margin"))
  }

  val pipelinePrefPairsSql: String =
    """WITH c AS (
      |  SELECT source, lang, doc_id, n_chars AS score,
      |    ROW_NUMBER() OVER (PARTITION BY source, lang
      |      ORDER BY score DESC, doc_id DESC) AS rb,
      |    ROW_NUMBER() OVER (PARTITION BY source, lang
      |      ORDER BY score ASC, doc_id ASC) AS rw,
      |    COUNT(*) OVER (PARTITION BY source, lang) AS n_cands
      |  FROM documents)
      |SELECT b.source, b.lang, CAST(b.n_cands AS BIGINT) AS n_cands,
      |  b.doc_id AS chosen_id, w.doc_id AS rejected_id,
      |  b.score - w.score AS margin
      |FROM c b JOIN c w
      |  ON b.source = w.source AND b.lang = w.lang
      |  AND b.rb = 1 AND w.rw = 1
      |WHERE b.score > w.score""".stripMargin

  /** Length-bucket histogram — the batch-planning audit behind every
    * padded-batch trainer: assign each document to the next
    * power-of-two token-length bucket (the bucketed-batching scheme)
    * and account the exact padding waste per bucket — the number that
    * decides between padded batching and sequence packing
    * (text_pack_sequences is the packing alternative; this key prices
    * the other side).
    *
    * Scale shape: bucket id is a pure bit-width projection —
    * `shiftleft(1, length(bin(n-1)))` — no log2 float anywhere; one
    * map-side-combined agg collapses the corpus to O(log max_len)
    * rows; waste share is integer ppm on exact token/slot counts. */
  def pipelineLengthBuckets(s: SparkSession, dir: String): DataFrame = {
    val toks = graft.operators.TextOps.toks(col("text"))
    graft.Tables.load(s, dir, "documents")
      .select(size(toks).cast("long").as("n"))
      .withColumn("bucket",
        expr("case when n <= 1 then 1" +
          " else shiftleft(cast(1 as bigint)," +
          " cast(length(bin(n - 1)) as int)) end"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n")).as("total_tokens"),
        sum(col("bucket") - col("n")).as("total_padding"))
      .withColumn("waste_ppm",
        expr("cast((total_padding * 1000000) div (n_docs * bucket)" +
          " as bigint)"))
      .orderBy("bucket")
  }

  val pipelineLengthBucketsSql: String =
    """WITH d AS (
      |  SELECT CAST(len(list_filter(string_split(text, ' '),
      |      x -> x <> '')) AS BIGINT) AS n
      |  FROM documents),
      |b AS (
      |  SELECT n, CASE WHEN n <= 1 THEN 1
      |    ELSE CAST(1 AS BIGINT) << len(bin(n - 1)) END AS bucket
      |  FROM d)
      |SELECT bucket, COUNT(*) AS n_docs,
      |  CAST(SUM(n) AS BIGINT) AS total_tokens,
      |  CAST(SUM(bucket - n) AS BIGINT) AS total_padding,
      |  CAST(SUM(bucket - n) * 1000000 // (COUNT(*) * bucket) AS BIGINT)
      |    AS waste_ppm
      |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin

  /** Staged quality-filter cascade — the attrition report every
    * corpus-cleaning pipeline publishes (how many documents each
    * filter stage dropped, in order): stage 1 minimum length,
    * stage 2 mean word length in [2,12] (gibberish / charsalad
    * screen), stage 3 vocabulary diversity (distinct tokens ≥ half —
    * the cheap repetition screen), stage 4 recognized language. A
    * document reaches stage k only through stages 1..k-1, so the
    * report is a strict funnel.
    *
    * Scale shape: all four predicates are codegen'd per-row integer
    * comparisons (the word-length band is cross-multiplied — no
    * division per row); ONE map-side-combined aggregate carries four
    * conditional counts; the 4-row funnel is then unpivoted from the
    * single aggregate row. Attrition is integer ppm. */
  def pipelineFilterCascade(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.load(s, dir, "documents")
      .select(col("lang"),
        size(graft.operators.TextOps.toks(col("text"))).cast("long")
          .as("nt"),
        length(regexp_replace(col("text"), " ", "")).cast("long")
          .as("nc"),
        size(array_distinct(graft.operators.TextOps.toks(col("text"))))
          .cast("long").as("nd"))
      .select(
        col("nt").geq(20).as("p1"),
        (col("nc").geq(lit(2) * col("nt")) &&
          col("nc").leq(lit(12) * col("nt"))).as("p2"),
        (lit(2) * col("nd") >= col("nt")).as("p3"),
        col("lang").isin("en", "de", "fr", "es", "zh").as("p4"))
    val agg = docs.agg(
      count(lit(1)).as("n0"),
      sum(when(col("p1"), 1L).otherwise(0L)).as("n1"),
      sum(when(col("p1") && col("p2"), 1L).otherwise(0L)).as("n2"),
      sum(when(col("p1") && col("p2") && col("p3"), 1L).otherwise(0L))
        .as("n3"),
      sum(when(col("p1") && col("p2") && col("p3") && col("p4"), 1L)
        .otherwise(0L)).as("n4"))
    agg.select(expr(
      "stack(4," +
        " 1, 'min_length',      n0, n1," +
        " 2, 'word_length_band', n1, n2," +
        " 3, 'vocab_diversity',  n2, n3," +
        " 4, 'known_language',   n3, n4)" +
        " as (stage, stage_name, n_in, n_out)"))
      .withColumn("dropped", col("n_in") - col("n_out"))
      .withColumn("drop_ppm",
        expr("case when n_in = 0 then cast(0 as bigint)" +
          " else cast(((n_in - n_out) * 1000000) div n_in as bigint) end"))
      .orderBy("stage")
  }

  val pipelineFilterCascadeSql: String =
    """WITH d AS (
      |  SELECT lang,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
      |      AS BIGINT) AS nt,
      |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS nc,
      |    CAST(len(list_distinct(list_filter(string_split(text, ' '),
      |      x -> x <> ''))) AS BIGINT) AS nd
      |  FROM documents),
      |p AS (
      |  SELECT nt >= 20 AS p1,
      |    nc >= 2 * nt AND nc <= 12 * nt AS p2,
      |    2 * nd >= nt AS p3,
      |    lang IN ('en', 'de', 'fr', 'es', 'zh') AS p4
      |  FROM d),
      |a AS (
      |  SELECT COUNT(*) AS n0,
      |    SUM(CASE WHEN p1 THEN 1 ELSE 0 END) AS n1,
      |    SUM(CASE WHEN p1 AND p2 THEN 1 ELSE 0 END) AS n2,
      |    SUM(CASE WHEN p1 AND p2 AND p3 THEN 1 ELSE 0 END) AS n3,
      |    SUM(CASE WHEN p1 AND p2 AND p3 AND p4 THEN 1 ELSE 0 END) AS n4
      |  FROM p),
      |f AS (
      |  SELECT 1 AS stage, 'min_length' AS stage_name, n0 AS n_in,
      |    n1 AS n_out FROM a
      |  UNION ALL SELECT 2, 'word_length_band', n1, n2 FROM a
      |  UNION ALL SELECT 3, 'vocab_diversity', n2, n3 FROM a
      |  UNION ALL SELECT 4, 'known_language', n3, n4 FROM a)
      |SELECT CAST(stage AS INT) AS stage, stage_name,
      |  CAST(n_in AS BIGINT) AS n_in, CAST(n_out AS BIGINT) AS n_out,
      |  CAST(n_in - n_out AS BIGINT) AS dropped,
      |  CASE WHEN n_in = 0 THEN CAST(0 AS BIGINT)
      |    ELSE CAST((n_in - n_out) * 1000000 // n_in AS BIGINT) END
      |    AS drop_ppm
      |FROM f ORDER BY stage""".stripMargin

  /** Temperature-based mixture resampling plan — the multilingual /
    * multi-source pretraining standard (mT5's α-sampling, α = 0.5):
    * raw source sizes are too skewed to train on directly, so each
    * source's target weight is n^α — here √n — flattening the head
    * without drowning the tail; the plan allocates a half-corpus
    * token budget across sources by those weights and emits each
    * source's sampling rate (text_domain_mix MEASURES the mixture;
    * this key PLANS the resample that fixes it).
    *
    * Exactness: √n is the one transcendental — computed as
    * floor(sqrt(exact long)) which is engine-identical (same double
    * in, correctly-rounded sqrt, floor to long); everything after is
    * integer arithmetic (allocation by weight share, rate in ppm
    * capped at 10⁶, expected tokens by truncating div).
    *
    * Scale shape: one map-side-combined agg to source grain; the
    * weight normalization window runs over the model-sized source
    * frame. */
  def pipelineTempSampling(s: SparkSession, dir: String): DataFrame = {
    val src = graft.Tables.load(s, dir, "documents")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(size(graft.operators.TextOps.toks(col("text"))).cast("long"))
          .as("n_tokens"))
      .withColumn("weight", expr("cast(floor(sqrt(n_tokens)) as bigint)"))
    val w = org.apache.spark.sql.expressions.Window.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    src
      .withColumn("total_tokens", sum(col("n_tokens")).over(w))
      .withColumn("total_weight", sum(col("weight")).over(w))
      .withColumn("alloc_tokens",
        expr("((total_tokens div 2) * weight) div total_weight"))
      .withColumn("rate_ppm",
        expr("least(cast(1000000 as bigint)," +
          " (alloc_tokens * 1000000) div n_tokens)"))
      .withColumn("expected_tokens",
        expr("(n_tokens * rate_ppm) div 1000000"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        col("weight"), col("alloc_tokens"), col("rate_ppm"),
        col("expected_tokens"))
      .orderBy("source")
  }

  val pipelineTempSamplingSql: String =
    """WITH s AS (
      |  SELECT source, COUNT(*) AS n_docs,
      |    CAST(SUM(len(list_filter(string_split(text, ' '),
      |      x -> x <> ''))) AS BIGINT) AS n_tokens
      |  FROM documents GROUP BY 1),
      |t AS (
      |  SELECT SUM(n_tokens) AS total_tokens,
      |    SUM(CAST(floor(sqrt(n_tokens)) AS BIGINT)) AS total_weight
      |  FROM s),
      |p AS (
      |  SELECT source, n_docs, n_tokens,
      |    CAST(floor(sqrt(n_tokens)) AS BIGINT) AS weight,
      |    (total_tokens // 2) * CAST(floor(sqrt(n_tokens)) AS BIGINT)
      |      // total_weight AS alloc_tokens
      |  FROM s, t)
      |SELECT source, CAST(n_docs AS BIGINT) AS n_docs, n_tokens, weight,
      |  CAST(alloc_tokens AS BIGINT) AS alloc_tokens,
      |  CAST(LEAST(1000000, alloc_tokens * 1000000 // n_tokens)
      |    AS BIGINT) AS rate_ppm,
      |  CAST(n_tokens * LEAST(1000000, alloc_tokens * 1000000
      |    // n_tokens) // 1000000 AS BIGINT) AS expected_tokens
      |FROM p ORDER BY source""".stripMargin

  /** Max epochs any source may repeat (the data-constrained-scaling
    * ceiling: repeated data stops helping past ~4 epochs), and the
    * mid-length band treated as quality signal for the weights. */
  val repMaxEpochs = 4L
  val repMidLo = 200L
  val repMidHi = 5000L

  /** Token-budget allocation across sources with a repetition cap —
    * the data-constrained-scaling planner (Muennighoff et al. 2023):
    * given a training budget of 3.75× the corpus' available tokens
    * (15·ΣA div 4 — integral in both engines),
    * allocate to each source proportionally to its quality-weighted
    * size w = avail·quality, but cap every source at 4 epochs of its
    * own data. That is capped water-filling: alloc_s = min(4·A_s,
    * λ·w_s) with λ chosen so Σ alloc = B — high-quality sources hit
    * their epoch ceiling first and the surplus cascades to the rest.
    *
    * λ is NEVER materialized as a float: sources sort by their cap
    * breakpoint (λ_s = 4000/q_s, i.e. quality DESC), and the unique
    * prefix length j where λ lands between consecutive breakpoints
    * is found by CROSS-MULTIPLIED integer comparisons of
    * λ_j = (B − Σ_{≤j} cap) / Σ_{>j} w against cap/w = E/q (the
    * permille in q cancels against the permille in w = avail·q, so
    * the cross-multiplied constant is E itself) — exact
    * rationals in DECIMAL(38,0) (num·w products reach ~10³⁰ at
    * 100 TB). Allocations are integral div; epochs reported in
    * exact milli-epochs. Degenerate cases are total: budget above
    * all caps ⇒ every source capped; below the first breakpoint ⇒
    * nobody capped (j = 0).
    *
    * Scale shape: ONE corpus pass aggregates to source grain; all
    * windows and the breakpoint pick run over the model-sized source
    * frame (single-partition by design); the budget/total row is a
    * 1-row broadcast. */
  def pipelineRepetitionBudget(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.LongType
    val src = Tables.load(s, dir, "documents")
      .groupBy(col("source"))
      .agg(sum(size(TextOps.toks(col("text"))).cast(LongType)).as("avail"),
        count(lit(1)).as("nd"),
        sum(when(col("n_chars").between(repMidLo, repMidHi), 1L)
          .otherwise(0L)).as("nm"))
      .select(col("source"), col("avail"),
        greatest(lit(1L), expr("nm * 1000 div nd")).as("q"))
      .withColumn("cap", col("avail") * repMaxEpochs)
      .withColumn("w", col("avail") * col("q"))
    val tot = src.agg(sum(col("avail")).as("ta"), sum(col("w")).as("tw"))
    val ord = Window.orderBy(col("q").desc, col("source"))
    val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = src.join(broadcast(tot))
      .withColumn("b", expr("ta * 15 div 4"))
      .withColumn("j", row_number().over(ord))
      .withColumn("cumC", sum(col("cap")).over(run))
      .withColumn("cumW", sum(col("w")).over(run))
      .withColumn("qn", lead(col("q"), 1).over(ord))
      .withColumn("num", col("b") - col("cumC"))
      .withColumn("den", col("tw") - col("cumW"))
    val valid = ranked
      .filter(col("num") >= 0 &&
        expr(s"cast(num as decimal(38,0)) * q >= $repMaxEpochs" +
          " * cast(den as decimal(38,0))") &&
        (col("qn").isNull ||
          expr(s"cast(num as decimal(38,0)) * qn < $repMaxEpochs" +
            " * cast(den as decimal(38,0))")))
      .orderBy(col("j")).limit(1)
      .select(col("j").as("jstar"), col("num").as("selNum"),
        col("den").as("selDen"), lit(0).as("fallback"))
    val pick = valid
      .unionByName(tot.select(lit(0).as("jstar"),
        expr("ta * 15 div 4").as("selNum"), col("tw").as("selDen"),
        lit(1).as("fallback")))
      .orderBy(col("fallback"), col("jstar")).limit(1)
    ranked.crossJoin(broadcast(pick))
      .withColumn("alloc_tokens",
        when(col("j") <= col("jstar"), col("cap"))
          .otherwise(expr("cast((cast(selNum as decimal(38,0)) * w)" +
            " div cast(selDen as decimal(38,0)) as bigint)")))
      .select(col("source"), col("avail").as("avail_tokens"),
        col("q").as("quality_permille"), col("cap").as("cap_tokens"),
        col("alloc_tokens"),
        expr("alloc_tokens * 1000 div avail").as("epochs_milli"))
      .orderBy("source")
  }

  val pipelineRepetitionBudgetSql: String = {
    val e = repMaxEpochs
    s"""WITH d AS (
       |  SELECT source,
       |    CAST(SUM(len(list_filter(string_split(text, ' '),
       |      x -> x <> ''))) AS BIGINT) AS avail,
       |    COUNT(*) AS nd,
       |    SUM(CASE WHEN n_chars BETWEEN $repMidLo AND $repMidHi
       |      THEN 1 ELSE 0 END) AS nm
       |  FROM documents GROUP BY 1),
       |src AS (
       |  SELECT source, avail, GREATEST(1, nm * 1000 // nd) AS q,
       |    avail * $repMaxEpochs AS cap,
       |    avail * GREATEST(1, nm * 1000 // nd) AS w
       |  FROM d),
       |tot AS (SELECT SUM(avail) AS ta, SUM(w) AS tw FROM src),
       |r AS (
       |  SELECT src.*, t.ta * 15 // 4 AS b, t.tw,
       |    ROW_NUMBER() OVER ord AS j,
       |    SUM(cap) OVER (ord ROWS UNBOUNDED PRECEDING) AS cumC,
       |    SUM(w) OVER (ord ROWS UNBOUNDED PRECEDING) AS cumW,
       |    LEAD(q) OVER ord AS qn
       |  FROM src CROSS JOIN tot t
       |  WINDOW ord AS (ORDER BY q DESC, source)),
       |v AS (
       |  SELECT j, b - cumC AS num, tw - cumW AS den, q, qn FROM r),
       |valid AS (
       |  SELECT j AS jstar, num, den FROM v
       |  WHERE num >= 0
       |    AND CAST(num AS HUGEINT) * q >= $e * CAST(den AS HUGEINT)
       |    AND (qn IS NULL OR
       |      CAST(num AS HUGEINT) * qn < $e * CAST(den AS HUGEINT))
       |  ORDER BY j LIMIT 1),
       |pick AS (
       |  SELECT COALESCE(v.jstar, 0) AS jstar,
       |    COALESCE(v.num, t.ta * 15 // 4) AS num, COALESCE(v.den, t.tw) AS den
       |  FROM tot t LEFT JOIN valid v ON TRUE),
       |a AS (
       |  SELECT r.source, r.avail, r.q, r.cap,
       |    CAST(CASE WHEN r.j <= p.jstar THEN r.cap
       |      ELSE (CAST(p.num AS HUGEINT) * r.w) // p.den
       |      END AS BIGINT) AS alloc
       |  FROM r CROSS JOIN pick p)
       |SELECT source, avail AS avail_tokens,
       |  CAST(q AS BIGINT) AS quality_permille, cap AS cap_tokens,
       |  alloc AS alloc_tokens,
       |  CAST(alloc * 1000 // avail AS BIGINT) AS epochs_milli
       |FROM a ORDER BY source""".stripMargin
  }

  /** RAG ingest manifest — the composed retrieval-corpus build that
    * chains three families the way a production RAG indexer does:
    * sliding-window chunking (text_chunk's stride/width), chunk →
    * document-embedding attachment, IVF bucket assignment
    * (sim_ivf0's deterministic seed centroids via the NATIVE
    * NearestCentroid argmax), rolled up to the (bucket, source)
    * ingest manifest every index build publishes — which buckets got
    * how many chunks from which provenance, and how many tokens. The
    * oracle recomposes chunking + assignment + rollup from the
    * shared SQL fragments, so the END-TO-END manifest is
    * hash-verified like pipeline_train_corpus's.
    *
    * Scale shape: chunking explodes row-local (no shuffle), the two
    * doc-grain joins are shuffle-pinned (chunks and docs both
    * corpus-sized at 100 TB; the embedding side rides the same doc
    * key), assignment is the zero-shuffle expression argmax, and the
    * manifest is model-sized (buckets × sources). */
  def pipelineRagIngest(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val chunks = TextOps.textChunk(s, dir)
      .select(col("doc_id"), col("chunk_id"), col("n_tokens"))
    val meta = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("source"))
    val c = SimOps.corpus(s, dir)
    val cents = SimOps.lloydCentroids(c, SimOps.nCentroids, iters = 0)
    val assigned = SimOps.assignTo(c, cents)
      .select(col("vec_id").as("doc_id"),
        col("centroid").cast(LongType).as("bucket"))
    chunks
      .join(meta.hint("shuffle_hash"), Seq("doc_id"))
      .join(assigned.hint("shuffle_hash"), Seq("doc_id"))
      .groupBy(col("bucket"), col("source"))
      .agg(count(lit(1)).as("n_chunks"),
        countDistinct(col("doc_id")).as("n_docs"),
        sum(col("n_tokens").cast(LongType)).as("sum_tokens"))
      .orderBy("bucket", "source")
  }

  val pipelineRagIngestSql: String =
    s"""WITH ch AS (
       |  SELECT doc_id, chunk_id, n_tokens
       |  FROM (${TextOps.textChunkSql}) x),
       |c AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
       |    sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
       |      CAST(embedding AS DOUBLE[]))) AS nrm
       |  FROM embeddings),
       |cents AS (
       |  SELECT vec_id AS c_id, v AS cv, nrm AS cnrm FROM c
       |  WHERE vec_id < ${SimOps.nCentroids}),
       |assigned AS (
       |  SELECT vec_id, c_id AS bucket FROM (
       |    SELECT c.vec_id, ct.c_id,
       |      ROW_NUMBER() OVER (PARTITION BY c.vec_id
       |        ORDER BY list_dot_product(c.v, ct.cv) / (c.nrm * ct.cnrm)
       |          DESC, ct.c_id) AS rn
       |    FROM c CROSS JOIN cents ct) WHERE rn = 1)
       |SELECT CAST(a.bucket AS BIGINT) AS bucket, d.source,
       |  CAST(COUNT(*) AS BIGINT) AS n_chunks,
       |  CAST(COUNT(DISTINCT ch.doc_id) AS BIGINT) AS n_docs,
       |  CAST(SUM(ch.n_tokens) AS BIGINT) AS sum_tokens
       |FROM ch
       |JOIN documents d ON ch.doc_id = d.doc_id
       |JOIN assigned a ON a.vec_id = ch.doc_id
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Blocklist phrases for the safety screen (fixture vocabulary;
    * production swaps in the real denylist). Token bigrams, matched
    * exactly. */
  val safetyBlocklist: Seq[String] =
    Seq("data slow", "order fast", "window join")

  /** Max tolerated blocklist hits before a document drops (below it,
    * flag for review — the three-way disposition real safety
    * pipelines use). */
  val safetyMaxHits = 2L

  /** Safety / policy screening — the LLM-pipeline stage
    * pipeline_decontaminate is NOT: decontamination matches corpus
    * against corpus (both sides huge → hashed shingles, shuffle-
    * pinned joins), while a safety screen matches corpus against a
    * CURATED DENYLIST that is tiny by construction — so the correct
    * plan is the OPPOSITE shape: broadcast the phrase list, keep the
    * corpus side exploded-but-local, never shuffle raw text. Per
    * document: total blocklist hits, distinct phrases hit, and the
    * three-way disposition (kept / flagged ≤2 hits / dropped).
    *
    * Scale shape: token-bigram explode is row-local; the match is a
    * BROADCAST join against the phrase list (the one join in the
    * pipeline family that SHOULD broadcast — PlanAuditSpec pins the
    * dedup family's corpus-sized sides to shuffle for exactly the
    * opposite reason); the doc-grain rollup combines map-side. Left
    * join keeps zero-hit docs without a second corpus pass. */
  def pipelineSafetyFilter(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"), TextOps.toks(col("text")).as("tk"))
    val bigrams = docs
      .filter(size(col("tk")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(tk) - 2)," +
          " i -> concat(tk[i], ' ', tk[i + 1]))")).as("bg"))
    val deny = s.createDataFrame(
      safetyBlocklist.map(Tuple1(_))).toDF("phrase")
    val hits = bigrams
      .join(broadcast(deny), col("bg") === col("phrase"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"),
        countDistinct(col("phrase")).as("n_phrases"))
    docs.select(col("doc_id"))
      .join(hits.hint("shuffle_hash"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("n_phrases"), lit(0L)).as("n_phrases"),
        when(coalesce(col("n_hits"), lit(0L)) === 0, lit("kept"))
          .when(coalesce(col("n_hits"), lit(0L)) <= safetyMaxHits,
            lit("flagged"))
          .otherwise(lit("dropped")).as("disposition"))
      .orderBy("doc_id")
  }

  val pipelineSafetyFilterSql: String = {
    val denyVals = safetyBlocklist.map(p => s"('$p')").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id,
       |    list_filter(string_split(text, ' '), x -> x <> '') AS tk
       |  FROM documents),
       |bg AS (
       |  SELECT doc_id, tk[i + 1] || ' ' || tk[i + 2] AS bg
       |  FROM t, unnest(range(0, greatest(len(tk) - 1, 0))) z(i)),
       |deny AS (SELECT * FROM (VALUES $denyVals) d(phrase)),
       |h AS (
       |  SELECT doc_id, COUNT(*) AS n_hits,
       |    COUNT(DISTINCT phrase) AS n_phrases
       |  FROM bg JOIN deny ON bg.bg = deny.phrase
       |  GROUP BY 1)
       |SELECT t.doc_id,
       |  CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       |  CAST(COALESCE(h.n_phrases, 0) AS BIGINT) AS n_phrases,
       |  CASE WHEN COALESCE(h.n_hits, 0) = 0 THEN 'kept'
       |       WHEN COALESCE(h.n_hits, 0) <= $safetyMaxHits THEN 'flagged'
       |       ELSE 'dropped' END AS disposition
       |FROM t LEFT JOIN h ON t.doc_id = h.doc_id
       |ORDER BY t.doc_id""".stripMargin
  }

  /** Inter-annotator agreement (Cohen's kappa) — the annotation-QC
    * gate every labeling pipeline runs before trusting labels: how
    * much do two annotators agree BEYOND chance (raw agreement
    * flatters any pair that both favor the majority class; kappa
    * subtracts the chance floor). The two "annotators" here are
    * deterministic rubrics over the documents table — a length
    * tercile and a vocabulary-richness tercile — so both engines
    * label identically and the statistic itself is what's tested.
    * Output is one row: n, the full 3×3 confusion matrix, observed/
    * expected agreement in ppm, kappa in milli.
    *
    * Exactness: all counts integer; expected agreement's marginal
    * products run in DECIMAL(38,0) (n_a·n_b·10⁶ outgrows long at
    * corpus scale) and land as integral ppm via `div`; kappa_milli =
    * (po−pe)·1000 div (10⁶−pe) in pure integers (both engines'
    * integral division truncates toward zero — q_yoy precedent).
    *
    * Scale shape: labels are a codegen'd scan-side projection; ONE
    * global aggregate with map-side combine collapses the corpus to
    * a single row of 16 counters (cells + marginals + n); the kappa
    * arithmetic is a projection on that row. */
  def pipelineAnnotatorAgreement(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    val labeled = Tables.load(s, dir, "documents")
      .select(col("n_chars"),
        size(array_distinct(TextOps.toks(col("text"))))
          .cast(LongType).as("nu"))
      .select(
        least(expr("n_chars div 200"), lit(2L)).as("la"),
        least(expr("nu div 11"), lit(2L)).as("lb"))
    def cell(i: Int, j: Int) =
      sum(when(col("la") === i && col("lb") === j, 1L).otherwise(0L))
        .as(s"c$i$j")
    def ma(i: Int) =
      sum(when(col("la") === i, 1L).otherwise(0L)).as(s"na$i")
    def mb(j: Int) =
      sum(when(col("lb") === j, 1L).otherwise(0L)).as(s"nb$j")
    val cells = for { i <- 0 to 2; j <- 0 to 2 } yield cell(i, j)
    val sums = labeled.agg(count(lit(1)).as("n"),
      (cells ++ (0 to 2).map(ma) ++ (0 to 2).map(mb)): _*)
    sums
      .withColumn("po_ppm", expr("((c00 + c11 + c22) * 1000000) div n"))
      .withColumn("pe_ppm", expr(
        """cast((cast(na0 as decimal(38,0)) * nb0 +
          |       cast(na1 as decimal(38,0)) * nb1 +
          |       cast(na2 as decimal(38,0)) * nb2) * 1000000
          |  div (cast(n as decimal(38,0)) * n) as bigint)""".stripMargin))
      .withColumn("kappa_milli",
        expr("((po_ppm - pe_ppm) * 1000) div (1000000 - pe_ppm)"))
      .select(col("n"), col("c00"), col("c01"), col("c02"),
        col("c10"), col("c11"), col("c12"),
        col("c20"), col("c21"), col("c22"),
        col("po_ppm"), col("pe_ppm"), col("kappa_milli"))
  }

  val pipelineAnnotatorAgreementSql: String = {
    val cells = (for { i <- 0 to 2; j <- 0 to 2 } yield
      s"CAST(SUM(CASE WHEN la = $i AND lb = $j THEN 1 ELSE 0 END) AS BIGINT) AS c$i$j")
      .mkString(",\n      |  ")
    val margs = ((0 to 2).map(i =>
      s"CAST(SUM(CASE WHEN la = $i THEN 1 ELSE 0 END) AS BIGINT) AS na$i") ++
      (0 to 2).map(j =>
        s"CAST(SUM(CASE WHEN lb = $j THEN 1 ELSE 0 END) AS BIGINT) AS nb$j"))
      .mkString(",\n      |  ")
    s"""WITH t AS (
       |  SELECT LEAST(n_chars // 200, 2) AS la,
       |    LEAST(len(list_distinct(list_filter(string_split(text, ' '),
       |      x -> x <> ''))) // 11, 2) AS lb
       |  FROM documents),
       |s AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |  $cells,
       |  $margs
       |  FROM t),
       |p AS (
       |  SELECT *,
       |    ((c00 + c11 + c22) * 1000000) // n AS po_ppm,
       |    CAST((CAST(na0 AS HUGEINT) * nb0 +
       |          CAST(na1 AS HUGEINT) * nb1 +
       |          CAST(na2 AS HUGEINT) * nb2) * 1000000
       |      // (CAST(n AS HUGEINT) * n) AS BIGINT) AS pe_ppm
       |  FROM s)
       |SELECT n, c00, c01, c02, c10, c11, c12, c20, c21, c22,
       |  CAST(po_ppm AS BIGINT) AS po_ppm, pe_ppm,
       |  CAST(((po_ppm - pe_ppm) * 1000) // (1000000 - pe_ppm)
       |    AS BIGINT) AS kappa_milli
       |FROM p""".stripMargin
  }

  /** Span-corruption geometry: a span starts every [[spanStride]]
    * positions (per-doc phase = doc_id mod stride) and masks up to
    * [[spanLen]] tokens — stride > len means spans never overlap. */
  val spanStride = 20
  val spanLen = 3

  /** Span-corruption planning — the T5/UL2 denoising-objective prep
    * step: decide, deterministically and reproducibly, WHICH token
    * spans of each document get masked, and account for the noise
    * density actually achieved (training-recipe budgets are quoted
    * as mask ratios; the plan is what guarantees the quote). Spans
    * start every 20 positions at a per-doc phase with length 3
    * clipped at the doc end — deterministic integer geometry, no RNG,
    * so re-runs and both engines agree exactly.
    *
    * Per doc: token count, span count, masked-token count, achieved
    * mask ratio in ppm.
    *
    * Scale shape: pure scan-side array arithmetic (sequence/filter/
    * aggregate over positions — codegen'd, no UDF, no explode: the
    * position list never leaves its row); ordered output is the only
    * exchange. */
  def pipelineSpanCorruption(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.LongType
    Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        size(TextOps.toks(col("text"))).cast(LongType).as("n_tokens"))
      .withColumn("starts", expr(
        s"""filter(sequence(0L, n_tokens - 1),
           |       p -> p % $spanStride = doc_id % $spanStride)"""
          .stripMargin))
      .select(col("doc_id"), col("n_tokens"),
        size(col("starts")).cast(LongType).as("n_spans"),
        expr(s"""aggregate(starts, 0L,
           |  (acc, p) -> acc + least(cast($spanLen as bigint),
           |                          n_tokens - p))""".stripMargin)
          .as("n_masked"))
      .withColumn("mask_ppm", expr(
        "case when n_tokens > 0 then (n_masked * 1000000) div n_tokens " +
          "else 0L end"))
      .orderBy("doc_id")
  }

  val pipelineSpanCorruptionSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
       |      AS BIGINT) AS n_tokens
       |  FROM documents),
       |sp AS (
       |  SELECT doc_id, n_tokens, p
       |  FROM t, unnest(range(0, n_tokens)) AS z(p)
       |  WHERE p % $spanStride = doc_id % $spanStride),
       |agg AS (
       |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
       |    CAST(SUM(LEAST($spanLen, n_tokens - p)) AS BIGINT)
       |      AS n_masked
       |  FROM sp GROUP BY doc_id)
       |SELECT t.doc_id, t.n_tokens,
       |  COALESCE(a.n_spans, 0) AS n_spans,
       |  COALESCE(a.n_masked, 0) AS n_masked,
       |  CASE WHEN t.n_tokens > 0
       |    THEN CAST((COALESCE(a.n_masked, 0) * 1000000) // t.n_tokens
       |      AS BIGINT)
       |    ELSE 0 END AS mask_ppm
       |FROM t LEFT JOIN agg a ON t.doc_id = a.doc_id
       |ORDER BY t.doc_id""".stripMargin

  /** Packing-efficiency audit over text_pack_sequences' output — the
    * pre-training sanity report a curator reads before a run: per
    * training sequence, how many documents start in it, the carry-in
    * from a document spanning across its left boundary, tokens
    * contributed by its starters, and the carry-out past its right
    * boundary. Sequences fully swallowed by one long document have
    * no starters and are ABSENT by construction — exactly the rows a
    * truncation-policy review needs to notice.
    *
    * Exactness: pure integer token arithmetic over the already-green
    * pack frame; the oracle recomposes the SAME pack SQL and
    * aggregates it (the pipeline_train_corpus composition rule).
    *
    * Scale shape: the pack scan's cost dominates (audited at its own
    * key); this adds ONE sequence-grain aggregate with map-side
    * combine. */
  def pipelinePackStats(s: SparkSession, dir: String): DataFrame = {
    TextOps.textPackSequences(s, dir)
      .groupBy("seq_id")
      .agg(count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("first_doc"),
        min(col("seq_offset")).as("carry_in"),
        sum(col("n_tokens")).as("tokens_started"),
        greatest(max(col("seq_offset") + col("n_tokens")) -
          lit(TextOps.packBudget.toLong), lit(0L)).as("carry_out"))
      .orderBy("seq_id")
  }

  val pipelinePackStatsSql: String =
    s"""WITH p AS (${TextOps.textPackSequencesSql})
       |SELECT seq_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  MIN(doc_id) AS first_doc,
       |  CAST(MIN(seq_offset) AS BIGINT) AS carry_in,
       |  CAST(SUM(n_tokens) AS BIGINT) AS tokens_started,
       |  CAST(GREATEST(MAX(seq_offset + n_tokens)
       |    - ${TextOps.packBudget}, 0) AS BIGINT) AS carry_out
       |FROM p GROUP BY 1 ORDER BY 1""".stripMargin

  /** Chat-template markers (ChatML-shaped, space-delimited so the
    * whitespace tokenizer sees each marker as one token). */
  private val chatSystem = "<|system|> You are a helpful assistant."
  private val chatUser = "<|user|>"
  private val chatAssistant = "<|assistant|>"
  private val chatEnd = "<|end|>"

  /** SFT chat-template rendering — the instruction-tuning assembly
    * step between a cleaned corpus and the trainer: each document
    * becomes one rendered conversation string (system + user +
    * assistant turns under ChatML-style markers) plus the two
    * numbers the training loop actually consumes — total token
    * count and `mask_from`, the token offset where the assistant
    * span begins (everything before it is loss-masked; an
    * off-by-one here silently trains on the prompt). The
    * instruction/response split point varies per document
    * (4 + doc_id % 9 tokens) so the mask offset is a real column,
    * not a constant.
    *
    * Exactness: rendering is pure string/array algebra (slice +
    * array_join) mirrored in DuckDB list SQL; token counts are
    * integers; the rendered STRING itself is hash-gated, so marker
    * placement, spacing, and the split point can never drift.
    *
    * Scale shape: one narrow projection per document — no joins, no
    * shuffle beyond the ordered output; the same per-row cost at
    * any corpus size. */
  def pipelineChatFormat(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .withColumn("tokens", TextOps.toks(col("text")))
      .withColumn("n", size(col("tokens")))
      .withColumn("instr_n", (lit(4) + col("doc_id") % 9).cast("int"))
      .filter(col("n") > col("instr_n"))
      .select(col("doc_id"),
        concat(
          lit(chatSystem + " " + chatUser + " "),
          array_join(expr("slice(tokens, 1, instr_n)"), " "),
          lit(" " + chatAssistant + " "),
          array_join(expr("slice(tokens, instr_n + 1, n - instr_n)"), " "),
          lit(" " + chatEnd)).as("rendered"),
        (col("n").cast("long") + 9L).as("n_tokens"),
        (col("instr_n").cast("long") + 8L).as("mask_from"))
      .orderBy("doc_id")

  val pipelineChatFormatSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    list_filter(string_split(text, ' '), x -> x <> '') AS l,
       |    CAST(4 + doc_id % 9 AS INT) AS instr_n
       |  FROM documents),
       |f AS (SELECT *, len(l) AS n FROM t WHERE len(l) > instr_n)
       |SELECT doc_id,
       |  '$chatSystem $chatUser ' ||
       |    array_to_string(l[1:instr_n], ' ') ||
       |    ' $chatAssistant ' ||
       |    array_to_string(l[instr_n + 1:n], ' ') ||
       |    ' $chatEnd' AS rendered,
       |  CAST(n + 9 AS BIGINT) AS n_tokens,
       |  CAST(instr_n + 8 AS BIGINT) AS mask_from
       |FROM f ORDER BY doc_id""".stripMargin

  /** Per-sequence attention-reset spans for the packed corpus — the
    * table a trainer actually consumes alongside text_pack_sequences:
    * packing concatenates unrelated documents into one training
    * sequence, so attention must be BLOCK-DIAGONAL (a token may not
    * attend across a document boundary), and the trainer needs, per
    * sequence, the (start, length) of every document span inside it —
    * including the split spans of documents that straddle a sequence
    * boundary (the carry-in/carry-out rows pipeline_pack_stats only
    * counts). Span arithmetic is pure integer interval clipping on
    * the pack scan's global offsets.
    *
    * Scale shape: reuses the audited distributed pack scan, then ONE
    * narrow explode over the (tiny) per-doc sequence range — a doc
    * adds O(its sequence count) thin rows; no joins, no extra
    * corpus shuffle beyond the ordered output. */
  def pipelineAttentionSpans(s: SparkSession, dir: String): DataFrame = {
    val b = TextOps.packBudget
    TextOps.textPackSequences(s, dir)
      .filter(col("n_tokens") > 0)
      .withColumn("start", col("seq_id") * b + col("seq_offset"))
      .withColumn("k",
        explode(expr(s"sequence(seq_id, (start + n_tokens - 1) div $b)")))
      .select(col("k").as("seq_id"), col("doc_id"),
        greatest(col("start") - col("k") * b, lit(0L)).as("span_start"),
        (least((col("k") + 1) * b, col("start") + col("n_tokens")) -
          greatest(col("k") * b, col("start"))).as("span_len"))
      .orderBy("seq_id", "span_start")
  }

  val pipelineAttentionSpansSql: String = {
    val b = TextOps.packBudget
    s"""WITH p AS (${TextOps.textPackSequencesSql}),
       |e AS (
       |  SELECT doc_id, n_tokens, seq_id * $b + seq_offset AS start
       |  FROM p WHERE n_tokens > 0),
       |sp AS (
       |  SELECT doc_id, n_tokens, start,
       |    unnest(range(start // $b, (start + n_tokens - 1) // $b + 1))
       |      AS k
       |  FROM e)
       |SELECT CAST(k AS BIGINT) AS seq_id, doc_id,
       |  CAST(GREATEST(start - k * $b, 0) AS BIGINT) AS span_start,
       |  CAST(LEAST((k + 1) * $b, start + n_tokens)
       |    - GREATEST(k * $b, start) AS BIGINT) AS span_len
       |FROM sp ORDER BY 1, 3""".stripMargin
  }

  /** Two-phase pretraining split by quality-ranked token budget —
    * the midtraining/anneal recipe: rank the corpus by the shared
    * quality score, and the top-quality quarter OF TOKENS (not of
    * documents — budgets are token-denominated) becomes the anneal
    * phase trained last at decayed LR; everything else is main-phase
    * data. A document is anneal if its span STARTS before the cutoff
    * (packing's boundary rule). Self-scaling: the cutoff is total/4,
    * so both phases are populated at any corpus size.
    *
    * Scale shape: the quality-ranked global token cumsum is
    * packFrame's distributed exclusive scan, range-partitioned on
    * (quality DESC, doc_id) — never a single-partition window; the
    * quality score and its ordering are the SAME double formula both
    * engines compute bitwise, so the rank order can't diverge. */
  def pipelineAnnealPhase(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        size(TextOps.toks(col("text"))).as("n_tokens"),
        TextOps.qualityExpr(col("text")).as("quality"))
    val (scanned, total) = graft.plans.GlobalRank.withExclusiveSum(
      s, counts, Seq(col("quality").desc, col("doc_id")),
      col("n_tokens"), "start")
    val cut = total / 4
    scanned
      .select(col("doc_id"), col("n_tokens"),
        col("start").as("start_token"),
        when(col("start") < cut, "anneal").otherwise("main").as("phase"))
      .orderBy("doc_id")
  }

  val pipelineAnnealPhaseSql: String =
    s"""WITH s AS (${TextOps.qualityStatsSql("documents")}),
       |q AS (
       |  SELECT doc_id, CAST(n_toks AS INT) AS n_tokens,
       |    ${TextOps.qualityFormulaSql} AS quality
       |  FROM s),
       |c AS (
       |  SELECT doc_id, n_tokens,
       |    SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id
       |      ROWS UNBOUNDED PRECEDING) - n_tokens AS start
       |  FROM q),
       |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) // 4 AS cut FROM q)
       |SELECT doc_id, n_tokens, CAST(start AS BIGINT) AS start_token,
       |  CASE WHEN start < cut THEN 'anneal' ELSE 'main' END AS phase
       |FROM c CROSS JOIN tot ORDER BY doc_id""".stripMargin

  /** Randomized-response coin threshold, per mille: p = 750/1000
    * means each unit reports its true bit with probability 3/4 and
    * the flipped bit otherwise — ε = ln(p/(1−p)) = ln 3 local DP. */
  val dpCoinPerMille = 750

  /** The debias estimator est = (obs − n(1−p))/(2p−1) rendered in
    * per-mille integers — DERIVED from [[dpCoinPerMille]] (not a
    * hard-coded p=3/4 simplification) so retuning the coin cannot
    * silently mis-debias every estimate; one shared copy valid in
    * both dialects, integer numerator, single final double division.
    * At m=750 this is numerically identical to the old (4·obs − n)/2:
    * the numerator is 250·(4·obs − n) and IEEE division by 500 is
    * exact for it. */
  val dpEstSql: String =
    s"cast(1000 * observed - ${1000 - dpCoinPerMille} * n_docs as double)" +
      s" / cast(${2 * dpCoinPerMille - 1000} as double)"

  /** Differentially-private counting via randomized response (Warner
    * 1965; the local-DP mechanism RAPPOR-class telemetry uses) — the
    * privacy-preserving statistics step a training-data pipeline runs
    * when the per-document bit is sensitive (licensing/PII flags,
    * opt-out markers): each doc reports its true bit only with
    * probability p, the per-group observed count is then DEBIASED by
    * est = (obs − n(1−p))/(2p−1), and the exact truth rides along as
    * the error column.
    *
    * Determinism note, stated honestly: production draws real
    * randomness per report; here the coin is the portable KMV hash of
    * doc_id taken per mille, so BOTH engines flip identical coins and
    * the whole mechanism — flips, observed counts, debiasing — is
    * hash-exact [O]. What the key proves is the pipeline's arithmetic
    * (the estimator is kept integer until ONE final division — see
    * [[dpEstSql]]), not the entropy source.
    *
    * Scale shape: per-row codegen'd coin + flip fused into the scan,
    * ONE map-side-combined aggregate at group grain; nothing else. */
  def pipelineDpCount(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("lang"), col("doc_id"), col("n_chars"))
      .withColumn("truth", expr("case when n_chars >= 400 then 1 else 0 end"))
      .withColumn("coin",
        expr(s"(${SketchOps.kmvHashSqlOn("doc_id")}) % 1000"))
      .withColumn("reported", expr(
        s"case when coin < $dpCoinPerMille then truth else 1 - truth end"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("truth")).as("true_count"),
        sum(col("reported")).as("observed"))
      .withColumn("est", expr(dpEstSql))
      .withColumn("err", expr("est - cast(true_count as double)"))

  val pipelineDpCountSql: String =
    s"""WITH r AS (
       |  SELECT lang, n_chars,
       |    CASE WHEN n_chars >= 400 THEN 1 ELSE 0 END AS truth,
       |    (${SketchOps.kmvHashSqlOn("doc_id")}) % 1000 AS coin
       |  FROM documents),
       |f AS (
       |  SELECT lang, truth,
       |    CASE WHEN coin < $dpCoinPerMille THEN truth
       |         ELSE 1 - truth END AS reported
       |  FROM r),
       |g AS (
       |  SELECT lang, COUNT(*) AS n_docs,
       |    CAST(SUM(truth) AS BIGINT) AS true_count,
       |    CAST(SUM(reported) AS BIGINT) AS observed
       |  FROM f GROUP BY 1)
       |SELECT lang, n_docs, true_count, observed,
       |  $dpEstSql AS est,
       |  $dpEstSql
       |    - cast(true_count as double) AS err
       |FROM g""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pipeline_dp_count" -> (pipelineDpCount _),
    "pipeline_anneal_phase" -> (pipelineAnnealPhase _),
    "pipeline_attention_spans" -> (pipelineAttentionSpans _),
    "pipeline_chat_format" -> (pipelineChatFormat _),
    "pipeline_pack_stats" -> (pipelinePackStats _),
    "pipeline_span_corruption" -> (pipelineSpanCorruption _),
    "pipeline_annotator_agreement" -> (pipelineAnnotatorAgreement _),
    "pipeline_temp_sampling" -> (pipelineTempSampling _),
    "pipeline_filter_cascade" -> (pipelineFilterCascade _),
    "pipeline_length_buckets" -> (pipelineLengthBuckets _),
    "pipeline_pref_pairs" -> (pipelinePrefPairs _),
    "pipeline_curriculum" -> (pipelineCurriculum _),
    "pipeline_weighted_sample" -> (pipelineWeightedSample _),
    "pipeline_epoch_shuffle" -> (pipelineEpochShuffle _),
    "pipeline_dataset_card" -> (pipelineDatasetCard _),
    "pipeline_train_corpus" -> (pipelineTrainCorpus _),
    "pipeline_split_safe" -> (pipelineSplitSafe _),
    "pipeline_stratified_sample" -> (pipelineStratifiedSample _),
    "pipeline_decontaminate" -> (pipelineDecontaminate _),
    "pipeline_repetition_budget" -> (pipelineRepetitionBudget _),
    "pipeline_rag_ingest" -> (pipelineRagIngest _),
    "pipeline_safety_filter" -> (pipelineSafetyFilter _))

  val oracles: Map[String, String] = Map(
    "pipeline_dp_count" -> pipelineDpCountSql,
    "pipeline_anneal_phase" -> pipelineAnnealPhaseSql,
    "pipeline_attention_spans" -> pipelineAttentionSpansSql,
    "pipeline_chat_format" -> pipelineChatFormatSql,
    "pipeline_pack_stats" -> pipelinePackStatsSql,
    "pipeline_span_corruption" -> pipelineSpanCorruptionSql,
    "pipeline_annotator_agreement" -> pipelineAnnotatorAgreementSql,
    "pipeline_pref_pairs" -> pipelinePrefPairsSql,
    "pipeline_length_buckets" -> pipelineLengthBucketsSql,
    "pipeline_filter_cascade" -> pipelineFilterCascadeSql,
    "pipeline_temp_sampling" -> pipelineTempSamplingSql,
    "pipeline_curriculum" -> pipelineCurriculumSql,
    "pipeline_weighted_sample" -> pipelineWeightedSampleSql,
    "pipeline_epoch_shuffle" -> pipelineEpochShuffleSql,
    "pipeline_dataset_card" -> pipelineDatasetCardSql,
    "pipeline_train_corpus" -> pipelineTrainCorpusSql,
    "pipeline_split_safe" -> pipelineSplitSafeSql,
    "pipeline_stratified_sample" -> pipelineStratifiedSampleSql,
    "pipeline_decontaminate" -> pipelineDecontaminateSql,
    "pipeline_repetition_budget" -> pipelineRepetitionBudgetSql,
    "pipeline_rag_ingest" -> pipelineRagIngestSql,
    "pipeline_safety_filter" -> pipelineSafetyFilterSql)
}
