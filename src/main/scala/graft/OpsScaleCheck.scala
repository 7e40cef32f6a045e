package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale observables for the round-5 pipeline operators on synthetic
  * multi-million-row inputs (the gate's documents table tops out at 5k
  * docs; this is the 1000x rehearsal): sequence packing and bounded
  * per-group capping at 10M rows, with their correctness INVARIANTS
  * asserted on the full output — full token tiling for packing (every
  * input token lands in exactly one span; every sequence is full except
  * each shard's last) and exact per-group counts for the cap. Prints one
  * JSON line. Wall times are min-of-2 (shared host).
  *
  * Input is deterministic (pure functions of the row id), so the run is
  * reproducible anywhere: `sbt -batch "runMain graft.OpsScaleCheck"`.
  */
object OpsScaleCheck {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_SCALECHECK_DOCS", "10000000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // driver heap comes from build.sbt's fork javaOptions (SPARK_DRIVER_MEM
      // env) — setting spark.driver.memory after JVM launch is a no-op
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftFunctions.registerAll(spark)

    // deterministic doc set: token counts 1..997 (mean ~499), 20 sources
    val docs = spark.range(nDocs)
      .select(col("id"),
        (pmod(col("id") * 2654435761L, lit(997L)) + 1L).as("n_toks"),
        concat(lit("src"), pmod(col("id"), lit(20)).cast("string")).as("source"))

    def minOf2(f: () => Unit): Double = {
      def once(): Double = {
        val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }

    val seqLen = 2048L
    val nShards = 256
    var packRow: org.apache.spark.sql.Row = null
    val packSec = minOf2 { () =>
      packRow = graft.ops.PackOps
        .packSummary(docs, col("id"), col("n_toks"), seqLen, nShards)
        .agg(count(lit(1)).as("n_seqs"), sum(col("n_tokens")).as("toks"),
          sum(when(col("n_tokens") === seqLen, 1L).otherwise(0L)).as("full"))
        .head()
    }
    val totalToks = docs.agg(sum(col("n_toks"))).head().getLong(0)
    val nSeqs = packRow.getLong(0)
    val packedToks = packRow.getLong(1)
    val fullSeqs = packRow.getLong(2)
    // tiling: every token packed exactly once; every sequence full except
    // (at most) one tail per shard
    require(packedToks == totalToks,
      s"packing dropped tokens: $packedToks != $totalToks")
    require(nSeqs - fullSeqs <= nShards,
      s"more non-full sequences (${nSeqs - fullSeqs}) than shards ($nShards)")

    val capN = 1000L
    var capRows: Array[org.apache.spark.sql.Row] = null
    val capSec = minOf2 { () =>
      capRows = graft.ops.SplitOps
        .capPerGroupBounded(docs, col("id"), col("source"), capN)
        .groupBy(col("source")).agg(count(lit(1)).as("n"))
        .collect()
    }
    require(capRows.length == 20 && capRows.forall(_.getLong(1) == capN),
      s"cap must keep exactly $capN per source: ${capRows.mkString(",")}")

    println(s"""{"metric":"ops_scale_check","docs":$nDocs,"total_tokens":$totalToks,"pack_sec":${f"$packSec%.4f"},"pack_mtokens_per_sec":${f"${totalToks / packSec / 1e6}%.1f"},"n_seqs":$nSeqs,"nonfull_seqs":${nSeqs - fullSeqs},"cap_sec":${f"$capSec%.4f"},"cap_mdocs_per_sec":${f"${nDocs / capSec / 1e6}%.1f"},"cpus":$cpus}""")
    spark.stop()
  }
}
