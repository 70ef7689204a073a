package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator for stress sweeps beyond the provided fixtures:
  * replicates a source sf directory `factor`× with shifted ids, so
  * operator scaling curves extend to sizes the driver doesn't ship
  * (e.g. sf0.1 → sf1). Usage:
  *
  *   runMain graft.GenScale <srcSfDir> <outDir> <factor>
  *
  * Replication is NOT naive copying where that would distort an
  * operator's workload shape:
  *  - documents text is vowel-rotated per copy — verbatim copies
  *    would plant factor-sized exact-dup cliques and the near-dup
  *    queries would measure an artificial candidate explosion, not
  *    scaling;
  *  - embeddings get ±0.25 deterministic per-element noise per copy
  *    (hash-derived, copy 0 untouched) so cross-copy cosine falls
  *    well under the near-dup threshold;
  *  - facts (orders, lineitem, events) shift their keys in lockstep
  *    so joins stay consistent; dims (region, nation, customer,
  *    supplier, part) stay fixed, exactly as TPC-H scaling does.
  * events keeps its raw int64-nanos ts column (the Tables.load
  * contract), so copies densify each user's timeline 10× — sessions
  * gain events, as-of right arrays gain versions: the stress shape a
  * 10× data growth actually has.
  */
object GenScale {

  private val shift = 10000000L

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, factorStr) = args
    val factor = factorStr.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // raw reads: events must keep its int64 ts exactly as stored
    def raw(name: String): DataFrame =
      spark.read.parquet(s"$srcDir/$name.parquet")

    def out(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
      println(s"[gen] $name: ${spark.read.parquet(s"$outDir/$name.parquet").count()} rows")
    }

    def copies(df: DataFrame)(f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until factor).map(i => f(df, i)).reduce(_ unionAll _)

    // dims: fixed, like TPC-H
    Seq("region", "nation", "customer", "supplier", "part")
      .foreach(t => out(t, raw(t)))

    out("orders", copies(raw("orders")) { (d, i) =>
      d.withColumn("o_orderkey", col("o_orderkey") + i * shift)
    })
    out("lineitem", copies(raw("lineitem")) { (d, i) =>
      d.withColumn("l_orderkey", col("l_orderkey") + i * shift)
    })
    out("events", copies(raw("events")) { (d, i) =>
      d.withColumn("event_id", col("event_id") + i * shift)
    })

    // full alphabet+digit rotation per copy: EVERY token mutates, so
    // no shingle survives across copies (a vowel-only rotation left
    // consonant/digit tokens identical, planting cross-copy shingle
    // collisions that exploded the near-dup candidate space ~6x —
    // a generator artifact, not an operator cost)
    val alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    def rot(i: Int): String =
      alpha.drop(i % alpha.length) + alpha.take(i % alpha.length)
    out("documents", copies(raw("documents")) { (d, i) =>
      d.withColumn("doc_id", col("doc_id") + i * shift)
        .withColumn("text",
          if (i == 0) col("text")
          else translate(col("text"), alpha, rot(7 * i + 1)))
    })
    out("embeddings", copies(raw("embeddings")) { (d, i) =>
      val noised =
        if (i == 0) col("embedding")
        else transform(col("embedding"), (x, j) =>
          x + ((pmod(xxhash64(j, lit(i)), lit(1000)).cast("double") / 1000.0
            - 0.5) * 0.5).cast("float"))
      d.withColumn("vec_id", col("vec_id") + i * shift)
        .withColumn("embedding", noised)
    })

    spark.stop()
  }
}
