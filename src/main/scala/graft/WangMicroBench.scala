package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Row-path microbenchmark for the Wang-mix expression — the per-row
  * cost the map-only split/sample/mixture/pack stages pay over the
  * ENTIRE corpus. OpsScaleCheck's operators are exchange/sort-bound, so
  * an expression-level change drowns in shuffle wall time there; this
  * main times stages where the hash IS the work:
  *
  *  - `hash_agg`: sum(wang_hash(id, 64)) over a range — pure expression
  *    throughput inside one fused stage;
  *  - `sample_filter`: count kept by SplitOps.hashSample(0.25) — the
  *    exact expression tree of the corpus-wide sampling path (null
  *    guard + premixed-seed xor + hash + shift + compare).
  *
  * Prints one JSON line; min over SPARK_GRAFT_MICRO_REPS (default 3)
  * reps per op. Rows via SPARK_GRAFT_MICRO_ROWS (default 1e9).
  */
object WangMicroBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_MICRO_ROWS", "1000000000").toLong
    val reps = sys.env.getOrElse("SPARK_GRAFT_MICRO_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.registerAll(spark)

    def minOf(f: () => Unit): Double = (1 to reps).map { _ =>
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }.min

    val hashSec = minOf { () =>
      // bit_xor, not sum: summing random 64-bit hashes overflows Long
      // (ARITHMETIC_OVERFLOW under ANSI); xor is overflow-free and keeps
      // the hash un-eliminable
      spark.range(n)
        .select(api.wang_hash(col("id"), 64).as("h"))
        .agg(expr("bit_xor(h)")).head()
    }
    val sampleSec = minOf { () =>
      spark.range(n).agg(sum(when(
        graft.ops.SplitOps.hashSample(col("id"), 0.25, seed = 7L), 1L)
        .otherwise(0L))).head()
    }
    println(s"""{"metric":"wang_micro","rows":$n,"reps":$reps,"hash_agg_sec":${Bench.jsonNum(hashSec)},"hash_agg_mrows_per_sec":${Bench.jsonNum(n / hashSec / 1e6)},"sample_filter_sec":${Bench.jsonNum(sampleSec)},"sample_filter_mrows_per_sec":${Bench.jsonNum(n / sampleSec / 1e6)},"cpus":$cpus}""")
    spark.stop()
  }
}
