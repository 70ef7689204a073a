package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities: salting for hot keys.
  *
  * AQE's skew-join splitting handles most runtime skew; salting is
  * the declarative fallback when one key dominates so heavily that a
  * single partition would still OOM (the classic NULL-key or
  * power-law fact table at 100 TB). Both transforms are exact —
  * results match their unsalted equivalents — and use deterministic
  * content-derived salts (no rand(), so retried tasks stay stable).
  */
object Skew {

  /** Two-phase salted aggregation: partial counts over (key, salt)
    * spread a hot key across `factor` reducers, then a cheap final
    * combine over the partials. */
  def saltedCount(df: DataFrame, key: String, factor: Int = 16): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(spark_partition_id(), monotonically_increasing_id()),
          lit(factor)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("n"))

  /** Salted broadcast-free join: the big (skewed) side gets a
    * deterministic salt in [0, factor); the small side is replicated
    * `factor` times so every (key, salt) bucket finds its match. The
    * shuffle then keys on (key, salt), splitting each hot key across
    * `factor` partitions. Exact: each big row joins its key's rows
    * exactly once. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      factor: Int = 16): DataFrame = {
    val salted = big.withColumn("__salt",
      pmod(xxhash64(spark_partition_id(), monotonically_increasing_id()),
        lit(factor)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
