package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal column plumbing: media payloads as opaque `binary`
  * columns with typed metadata, batch-decoded per partition.
  *
  * The real pattern at 100 TB: parquet stores (id, binary payload,
  * metadata struct); decode/resize/feature-extract runs as a
  * partition-batched function (Scala mapPartitions here; mapInPandas
  * from PySpark) so per-batch library init (codec contexts, model
  * weights) amortizes across rows, and partitioning controls batch
  * shape. No media codecs ship in this container, so `decodeStub`
  * is a STUB: a deterministic fake that stands in for an image
  * decoder while keeping schema, batching, and partition flow real.
  */
object MultimodalOps {

  case class MediaRow(doc_id: Long, payload: Array[Byte],
      n_bytes: Int, magic_hex: String, payload_crc: Long)

  case class DecodedRow(doc_id: Long, n_bytes: Int, magic_hex: String,
      payload_crc: Long, width: Int, height: Int, n_frames: Int,
      decoder: String)

  /** ==== STUB ==== A real build links an image/audio codec here and
    * decodes `payload`. This deterministic fake derives "dimensions"
    * from the payload hash so tests have stable expectations. The
    * signature — Iterator[batch] -> Iterator[decoded] once per
    * partition — is exactly what a codec-backed version keeps. */
  def decodeStub(rows: Iterator[MediaRow]): Iterator[DecodedRow] = {
    // per-partition init would happen here (codec context, model...)
    rows.map { r =>
      val h = java.util.Arrays.hashCode(r.payload)
      DecodedRow(r.doc_id, r.n_bytes, r.magic_hex, r.payload_crc,
        width = 64 + math.floorMod(h, 448),
        height = 64 + math.floorMod(h >> 9, 448),
        n_frames = 1 + math.floorMod(h >> 18, 8),
        decoder = "stub-v0")
    }
  }

  /** sampled_frames is a comma-joined string (not Seq[Int]) so the
    * driver's pandas canonicalizer can sort/hash the output — raw
    * array cells crash its row ordering. */
  case class ProcessedRow(doc_id: Long, n_bytes: Int, magic_hex: String,
      payload_crc: Long, width: Int, height: Int, n_frames: Int,
      out_width: Int, out_height: Int, sampled_frames: String,
      decoder: String)

  /** ==== STUB ==== resize + uniform frame-sampling over decoded
    * media: the real version transforms pixel buffers; this keeps the
    * exact pipeline shape (decoded batch in, processed batch out,
    * per-partition) with deterministic arithmetic. Target box
    * 224×224, aspect-preserving; ≤ 4 frames sampled uniformly. */
  def resizeAndSampleStub(rows: Iterator[DecodedRow]): Iterator[ProcessedRow] =
    rows.map { r =>
      val scale = 224.0 / math.max(r.width, r.height)
      val sampled = 0 until math.min(r.n_frames, 4) map { i =>
        i * r.n_frames / math.min(r.n_frames, 4)
      }
      ProcessedRow(r.doc_id, r.n_bytes, r.magic_hex, r.payload_crc,
        r.width, r.height, r.n_frames,
        out_width = math.max(1, math.round(r.width * scale).toInt),
        out_height = math.max(1, math.round(r.height * scale).toInt),
        sampled_frames = sampled.mkString(","),
        decoder = r.decoder + "+resize224+sample4")
    }

  /** Binary payload + metadata extraction + partition-batched decode.
    * documents.text stands in for the media bytes (same plumbing). */
  def mmBinaryMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media: Dataset[MediaRow] = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"))
      .select(col("doc_id"), col("payload"),
        length(col("payload")).cast("int").as("n_bytes"),
        hex(substring(col("payload"), 1, 4)).as("magic_hex"),
        crc32(col("payload")).as("payload_crc"))
      .as[MediaRow]
    // partition count controls decode batch shape; at scale set this
    // from payload-bytes-per-task, not row count. Decode, resize and
    // frame-sample chain within one partition pass — no re-shuffle
    // between media stages.
    media.mapPartitions(it => resizeAndSampleStub(decodeStub(it))).toDF()
      .select("doc_id", "n_bytes", "magic_hex", "payload_crc",
        "width", "height", "n_frames", "out_width", "out_height",
        "sampled_frames", "decoder")
  }

  /** Media ↔ embedding fusion manifest: each document's binary
    * metadata joined to its vector row — the per-sample record a
    * multimodal training pipeline materializes (payload locator +
    * integrity fields + embedding stats). doc_id and vec_id share a
    * domain in the fixture, standing in for the media↔embedding key.
    * Every field here is SQL-expressible (unlike the stub-decoded
    * dims), so this join is oracle-checked end-to-end. */
  def mmEmbedFusion(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions._
    val media = Tables.load(s, dir, "documents")
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"))
      .select(col("doc_id"),
        length(col("payload")).cast("int").as("n_bytes"),
        hex(substring(col("payload"), 1, 4)).as("magic_hex"))
    val vecs = Tables.load(s, dir, "embeddings")
      .select(col("vec_id"), size(col("embedding")).as("dim"),
        sqrt(dotD(col("embedding"), col("embedding"))).as("nrm"))
    media.join(vecs, media("doc_id") === vecs("vec_id"))
      .select(col("doc_id"), col("n_bytes"), col("magic_hex"),
        col("dim"), col("nrm"))
      .orderBy("doc_id")
  }

  /** DuckDB slices the first 4 CHARS where Spark slices 4 BYTES —
    * equal because the fixture corpus is pure ASCII (asserted: zero
    * rows with octet_length(encode(text)) <> length(text)). */
  val mmEmbedFusionSql: String =
    """SELECT doc_id, octet_length(encode(text)) AS n_bytes,
      |  hex(encode(substr(text, 1, 4))) AS magic_hex,
      |  len(embedding) AS dim,
      |  sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
      |FROM documents JOIN embeddings ON vec_id = doc_id
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_binary_meta" -> (mmBinaryMeta _),
    "mm_embed_fusion" -> (mmEmbedFusion _))

  val oracles: Map[String, String] = Map(
    "mm_embed_fusion" -> mmEmbedFusionSql)
}
