package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic, fully-distributed synthesis of the input_hint table
  * (BASELINE.json): (doc_id string, tokens array<int>, n_tok int,
  * source string). No driver-side data, no RNG state — every value is a
  * pure function of (row id, seed) through xxhash64, so any executor
  * count/partitioning produces the identical table (the property the
  * two-parallelism scaling evidence relies on).
  *
  * Token ids are drawn heavy-tailed (u^zipfPow * vocab — zipf-ish head)
  * mirroring the reference binary's forced duplicates
  * (/root/reference/src/main.rs:96-105); one source holds ~half the rows
  * (FIXTURES.md F1's deliberate skew).
  */
object TokenGen {

  val Sources: Seq[String] =
    Seq("web", "books", "code", "wiki", "forums", "news", "papers", "social")

  /** Write the generated table range-partitioned by doc_id — the layout
    * the north rule names (`repartitionByRange on doc_id`): doc ranges
    * map to contiguous files, so doc_id range predicates prune files. */
  def writeRangeLayout(df: DataFrame, dir: String, partitions: Int = 64): Unit =
    df.repartitionByRange(partitions, org.apache.spark.sql.functions.col("doc_id"))
      .write.mode("overwrite").parquet(dir)

  def generate(spark: SparkSession, nDocs: Long, vocab: Int = 50000,
      minTok: Int = 16, maxTok: Int = 256, seed: Long = 42L,
      numPartitions: Int = 0): DataFrame = {
    require(minTok >= 0 && maxTok > minTok,
      s"token-count range must satisfy 0 <= minTok < maxTok, got [$minTok, $maxTok)")
    val base = if (numPartitions > 0) spark.range(0, nDocs, 1, numPartitions)
      else spark.range(nDocs)
    // draws are in [minTok, maxTok-1] (pmod over the span)
    val span = (maxTok - minTok).max(1)
    val nTok = (lit(minTok) + pmod(xxhash64(col("id"), lit(seed + 1)), lit(span))).cast("int")
    val srcPick = pmod(xxhash64(col("id"), lit(seed + 2)), lit(100))
    val source = when(srcPick < 50, lit(Sources.head))
      .otherwise(element_at(
        array(Sources.tail.map(lit(_)): _*),
        (pmod(xxhash64(col("id"), lit(seed + 3)), lit(Sources.size - 1)) + 1).cast("int")))
    // nTok = 0 must give an EMPTY array: sequence(1, 0) counts DOWN to
    // [1, 0] in Spark, which would put 2 tokens on a row claiming
    // n_tok=0 and break the array/n_tok/packed invariant
    val tokens = when(nTok === 0,
      array().cast(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.IntegerType, containsNull = false)))
      .otherwise(transform(sequence(lit(1), nTok), i => {
        val ui = shiftrightunsigned(xxhash64(col("id"), i, lit(seed + 4)), 11)
          .cast("double") / lit(9007199254740992.0)
        // zipf-ish: u^2.5 concentrates mass near token 0 (heavy head)
        (pow(ui, lit(2.5)) * lit(vocab)).cast("int")
      }))
    base.select(
      format_string("doc_%012d", col("id")).as("doc_id"),
      tokens.as("tokens"),
      nTok.as("n_tok"),
      source.as("source"),
      // the DEFAULT build input: same ids packed little-endian into one
      // BINARY cell — parquet scans it on the vectorized primitive path
      // (4-6x the nested-array assembly path); `tokens` stays for
      // operators that need per-element access
      graft.ops.TextOps.toColumn(graft.functions.PackIntsLE(
        graft.ops.TextOps.expression(tokens))).as("packed"))
  }
}
