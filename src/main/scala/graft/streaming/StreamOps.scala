package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface: the `events` table replayed as a
  * file stream through a watermarked windowed aggregation — the
  * streaming twin of Relational.qEventsWindow.
  *
  * The plan is the canonical Spark streaming shape: readStream (file
  * source, bounded here, unbounded Kafka/files in production) →
  * event-time window + watermark (bounds state: late data beyond 1
  * day is dropped, closed windows are evicted from the state store) →
  * sink. At scale the same plan runs continuously with checkpointing;
  * state size stays O(open windows × event types), not O(stream).
  */
object StreamOps {

  /** events.parquet's physical schema under nanosAsLong (ts is int64
    * nanos; the file source cannot infer streaming schemas). */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private val runId = new AtomicInteger(0)

  /** Hourly event counts/sums per type, computed by an actual
    * streaming query into a memory sink, returned as the final
    * result table once the bounded stream drains. */
  def streamEventsWindow(spark: SparkSession, sfDir: String): DataFrame = {
    val name = s"stream_events_${runId.incrementAndGet()}"
    val events = spark.readStream
      .schema(eventsRawSchema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    val agg = events
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
    val q = agg.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
    } finally {
      q.stop()
      q.awaitTermination()
    }
    spark.table(name).orderBy("window_start", "event_type")
  }

  /** Batch twin for stream/batch parity checks (same agg over a
    * static read; Structured Streaming's semantics promise equality
    * on a drained bounded source). */
  def batchEventsWindow(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.load(spark, sfDir, "events")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))
      .orderBy("window_start", "event_type")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_events" -> (streamEventsWindow _))
}
