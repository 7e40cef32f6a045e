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

  /** IVF-style ANN: a deterministic sample of corpus vectors serves as
    * the coarse centroid codebook (no iterative k-means — at pipeline
    * scale a hashed sample is the standard cheap initializer); every
    * corpus vector is assigned to its nearest centroid once (broadcast
    * codebook, one scan), queries probe their `nProbe` nearest centroid
    * cells. Recall rises with nProbe; cost per query is ~nProbe/nCells
    * of the corpus. Output shape matches bruteForceTopK. */
  def ivfTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
      queries: DataFrame, queryId: Column, queryVec: Column,
      k: Int, nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val c = corpus.select(corpusId.as("cid"), corpusVec.as("cv"))
    // deterministic codebook: the nCells corpus vectors with smallest id hash
    val centroids = c.select(col("cid"), col("cv"),
        xxhash64(col("cid")).as("h"))
      .orderBy(col("h")).limit(nCells)
      .select(col("cid").as("cell"), col("cv").as("centroid"))
    // assignment: nearest centroid per corpus vector (broadcast codebook)
    val w = Window.partitionBy(col("cid"))
      .orderBy(col("sim").desc, col("cell").asc)
    val assigned = c.crossJoin(broadcast(centroids))
      .select(col("cid"), col("cv"), col("cell"),
        cosine(col("cv"), col("centroid")).as("sim"))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("cell"), col("cid"), col("cv"))
    // queries probe their nProbe nearest cells
    val qw = Window.partitionBy(col("query_id"))
      .orderBy(col("qsim").desc, col("cell").asc)
    val probes = queries.select(queryId.as("query_id"), queryVec.as("qv"))
      .crossJoin(broadcast(centroids))
      .select(col("query_id"), col("qv"), col("cell"),
        cosine(col("qv"), col("centroid")).as("qsim"))
      .withColumn("rn", row_number().over(qw))
      .where(col("rn") <= nProbe)
      .select(col("cell"), col("query_id"), col("qv"))
    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .where(col("cid") =!= col("query_id"))
      .select(col("query_id"), col("cid").as("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos"))
    val rw = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(rw))
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
