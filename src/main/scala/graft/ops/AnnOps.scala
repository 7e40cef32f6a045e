package graft.ops

import graft.functions.{CosineSim, VecLshBucket}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k with the (small) query set broadcast
  * — corpus-side is a single scan, no corpus shuffle. Scale path:
  * random-hyperplane LSH buckets (or an IVF-style coarse quantizer over
  * the same buckets) so each query only scans its bucket; recall traded
  * via number of planes / probes.
  */
object AnnOps {

  def cosine(a: Column, b: Column): Column =
    TextOps.toColumn(CosineSim(TextOps.expression(a), TextOps.expression(b)))

  def lshBucket(vec: Column, nPlanes: Int, seed: Long = 42L): Column =
    TextOps.toColumn(VecLshBucket(TextOps.expression(vec),
      TextOps.expression(lit(nPlanes)), seed))

  /** Exact top-k by cosine: queries broadcast against the corpus, windowed
    * rank per query (ties broken by corpus id for determinism).
    * Output: query_id, rank, neighbor_id, cos. */
  def bruteForceTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
      queries: DataFrame, queryId: Column, queryVec: Column,
      k: Int, excludeSelf: Boolean = true): DataFrame = {
    val c = corpus.select(corpusId.as("neighbor_id"), corpusVec.as("cv"))
    val q = queries.select(queryId.as("query_id"), queryVec.as("qv"))
    val scored = c.join(broadcast(q),
        if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** LSH-bucketed ANN: queries only scan their bucket. Same output shape
    * as bruteForceTopK; recall < 1 by design (measured in tests). */
  def lshTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
      queries: DataFrame, queryId: Column, queryVec: Column,
      k: Int, nPlanes: Int = 8, seed: Long = 42L): DataFrame = {
    val c = corpus.select(corpusId.as("neighbor_id"), corpusVec.as("cv"),
      lshBucket(corpusVec, nPlanes, seed).as("bucket"))
    val q = queries.select(queryId.as("query_id"), queryVec.as("qv"),
      lshBucket(queryVec, nPlanes, seed).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cos"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }
}
