package graft.ops

import graft.agg.VecMeanAgg
import graft.functions.{CosineSim, NearestCentroid, VecLshBucket}
import org.apache.spark.sql.{Column, DataFrame, Row}
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

  /** Rank scored (query_id, neighbor_id, cos) candidates per query and
    * keep the top k — ties broken by neighbor_id so the answer is
    * deterministic. Single-sourced: every ANN variant must trim with the
    * SAME dedup/ordering contract or their recall comparisons lie. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"), col("cos"))
  }

  /** Drop null embeddings from a (id, vec) side. CosineSim is
    * null-intolerant (null in -> cos null), and row_number ranks
    * NULLS-LAST rows too — so a null QUERY vector would claim the k
    * smallest corpus ids as "neighbors" with cos=null, and a null corpus
    * vector would pad top-k lists wherever fewer than k real candidates
    * exist. One dirty row must not fabricate results (same contract as
    * the ivfCodebook null guard). */
  private def nonNullVecs(side: DataFrame, vecCol: String): DataFrame =
    side.where(col(vecCol).isNotNull)

  /** Exact top-k by cosine: queries broadcast against the corpus, windowed
    * rank per query (ties broken by corpus id for determinism).
    * Output: query_id, rank, neighbor_id, cos. */
  def bruteForceTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
      queries: DataFrame, queryId: Column, queryVec: Column,
      k: Int, excludeSelf: Boolean = true): DataFrame = {
    val c = nonNullVecs(corpus.select(corpusId.as("neighbor_id"), corpusVec.as("cv")), "cv")
    val q = nonNullVecs(queries.select(queryId.as("query_id"), queryVec.as("qv")), "qv")
    val scored = c.join(broadcast(q),
        if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cos"))
    rankTopK(scored, k)
  }

  /** Nearest-centroid cell of a vector against a plan-embedded codebook
    * (broadcast-sized: nCells x dim doubles) — one pass, zero shuffle. */
  def nearestCell(vec: Column, codebook: Array[Array[Double]]): Column =
    TextOps.toColumn(NearestCentroid(TextOps.expression(vec),
      codebook.map(_.toSeq).toSeq))

  /** Element-wise mean of an array column (see [[graft.agg.VecMeanAgg]]). */
  def vecMean(vec: Column): Column =
    TextOps.toColumn(VecMeanAgg(TextOps.expression(vec))
      .toAggregateExpression())

  private def rowToVec(r: Row): Array[Double] =
    r.getSeq[Any](0).iterator.map {
      case n: java.lang.Number => n.doubleValue()
      case other => throw new IllegalArgumentException(s"non-numeric $other")
    }.toArray

  /** IVF coarse-quantizer codebook: deterministic hash-sample of corpus
    * vectors refined by `kmeansIters` rounds of spherical k-means. Each
    * round is ONE corpus pass (nearest-cell expression, no shuffle of
    * vectors) + a partial/final [[VecMeanAgg]] (the shuffle carries
    * nCells x (dim+1) doubles per partition, not the corpus) + a
    * driver-side collect of the nCells new centroids. Cells that lose all
    * members keep their previous centroid. */
  def ivfCodebook(corpus: DataFrame, vec: Column, id: Column,
      nCells: Int, kmeansIters: Int = 2): Array[Array[Double]] =
    // the sample + per-iteration mean aggregations shuffle nCells x
    // (dim+1) doubles — KB-sized at any corpus scale, no joins: AQE off
    // removes the re-planning job per k-means round (guide §2.2)
    graft.util.Adaptive.withoutAqe(corpus.sparkSession) {
      ivfCodebookImpl(corpus, vec, id, nCells, kmeansIters)
    }

  private def ivfCodebookImpl(corpus: DataFrame, vec: Column, id: Column,
      nCells: Int, kmeansIters: Int): Array[Array[Double]] = {
    // one dirty row (null embedding) must not kill the job: nulls can
    // neither seed the codebook (rowToVec NPE) nor form a null
    // nearest-cell group (getInt on null)
    val c = corpus.select(id.as("cid"), vec.as("cv")).where(col("cv").isNotNull)
    var codebook: Array[Array[Double]] = c
      .select(col("cv"), xxhash64(col("cid")).as("h"), col("cid"))
      .orderBy(col("h"), col("cid")).limit(nCells)
      .select(col("cv")).collect().map(rowToVec)
    var iter = 0
    while (iter < kmeansIters) {
      val means = c
        .select(nearestCell(col("cv"), codebook).as("cell"), col("cv"))
        .groupBy(col("cell"))
        .agg(vecMean(col("cv")).as("mean"))
        .collect()
      val next = codebook.clone()
      means.foreach { r =>
        val cell = r.getInt(0)
        val m = r.getSeq[Any](1).iterator.map(_.asInstanceOf[Double]).toArray
        if (m.nonEmpty) next(cell) = m
      }
      codebook = next
      iter += 1
    }
    codebook
  }

  /** IVF-style ANN: spherical-k-means codebook ([[ivfCodebook]]); every
    * corpus vector is assigned to its nearest centroid by the broadcast
    * codebook expression (ONE pass, no Exchange/Window in the assignment
    * stage); queries probe their `nProbe` nearest centroid cells. Recall
    * rises with nProbe (nProbe = nCells is exhaustive and exactly equals
    * brute force); cost per query is ~nProbe/nCells of the corpus.
    * Output shape matches bruteForceTopK. */
  def ivfTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
      queries: DataFrame, queryId: Column, queryVec: Column,
      k: Int, nCells: Int = 16, nProbe: Int = 4,
      kmeansIters: Int = 2): DataFrame = {
    val c = nonNullVecs(corpus.select(corpusId.as("cid"), corpusVec.as("cv")), "cv")
    val codebook = ivfCodebook(corpus, corpusVec, corpusId, nCells, kmeansIters)
    // an empty / all-null-embedding corpus seeds no codebook: the answer
    // is "no neighbors", not an analysis failure from the (correctly)
    // non-empty-codebook-checked nearest_centroid expression — fall back
    // to brute force over the empty corpus, which returns the same
    // empty frame with the right schema
    if (codebook.isEmpty)
      return bruteForceTopK(corpus, corpusId, corpusVec,
        queries, queryId, queryVec, k)
    // corpus assignment: single codegen'd pass, zero shuffle
    val assigned = c.select(nearestCell(col("cv"), codebook).as("cell"),
      col("cid"), col("cv"))
    // queries probe their nProbe nearest cells (query set is small and
    // broadcast; the tiny crossJoin+window here is queries x nCells rows)
    val centroids = codebook.zipWithIndex.map { case (v, i) => (i, v.toSeq) }
      .toSeq
    val centroidDf = queries.sparkSession.createDataFrame(centroids)
      .toDF("cell", "centroid")
    val qw = Window.partitionBy(col("query_id"))
      .orderBy(col("qsim").desc, col("cell").asc)
    val probes = nonNullVecs(
        queries.select(queryId.as("query_id"), queryVec.as("qv")), "qv")
      .crossJoin(broadcast(centroidDf))
      .select(col("query_id"), col("qv"), col("cell"),
        cosine(col("qv"), col("centroid")).as("qsim"))
      .withColumn("rn", row_number().over(qw))
      .where(col("rn") <= nProbe)
      .select(col("cell"), col("query_id"), col("qv"))
    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .where(col("cid") =!= col("query_id"))
      .select(col("query_id"), col("cid").as("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos"))
    rankTopK(scored, k)
  }

  // ------------------------------------------------------------ persisted IVF

  /** Parameter string recorded in the index meta — build/serve drift
    * rejects loudly (the BuildSketches.paramString pattern). */
  private[ops] def ivfParamString(nCells: Int, kmeansIters: Int): String =
    s"ivf;cells=$nCells;iters=$kmeansIters"

  private[ops] def codebookPath(indexDir: String) = s"$indexDir/codebook"
  private[ops] def assignPath(indexDir: String) = s"$indexDir/assignments"
  private[ops] def metaPath(indexDir: String) = s"$indexDir/meta"

  /** Build (or resume) a PERSISTED IVF index — production similarity
    * search builds the index once and serves many query batches, instead
    * of re-paying the k-means + assignment inside every query the way
    * [[ivfTopK]] does.
    *
    * Layout (the BuildSketches checkpoint pattern, lineage-stamped):
    *  - `codebook/`    — (cell, centroid), written after the k-means;
    *  - `assignments/` — (cid, cv) PARTITIONED BY cell, so a serve
    *    probing p of n cells reads only p/n of the corpus bytes
    *    (partition pruning — the scale win of IVF made physical);
    *  - `meta/`        — one commit-marker row (params, order-insensitive
    *    input hash, n_vecs), written LAST: the index is valid iff the
    *    marker exists.
    *
    * Resume/idempotence: a committed index re-builds as a no-op when the
    * input hash + params match, and REJECTS on drift (a stale index
    * silently serving a changed corpus is the production failure mode
    * this guards). An uncommitted dir (killed build) resumes by reusing
    * a stored codebook when its params match — the k-means passes are
    * the expensive stage — and re-deriving assignments from it
    * (overwrite, so the retry is idempotent). */
  def buildIvfIndex(spark: org.apache.spark.sql.SparkSession,
      corpus: DataFrame, corpusId: Column, corpusVec: Column,
      indexDir: String, nCells: Int = 16, kmeansIters: Int = 2): Unit =
    // AQE off for the whole build (guide §2.2/§1.2 job diet): every
    // action here is control-sized at ANY corpus scale — fingerprint
    // agg, codebook sample, k-means partials of nCells x (dim+1)
    // doubles, commit-marker I/O — and none contains a join whose
    // strategy AQE could improve, so adaptive execution only adds a
    // re-planning job per exchange
    graft.util.Adaptive.withoutAqe(spark) {
    import org.apache.spark.sql.SaveMode
    val params = ivfParamString(nCells, kmeansIters)
    val c = nonNullVecs(corpus.select(corpusId.as("cid"), corpusVec.as("cv")), "cv")
    val fp = c.agg(
      coalesce(expr("bit_xor(xxhash64(cid, cv))"), lit(0L)).as("h"),
      count(lit(1)).as("n")).head()
    val (inHash, nVecs) = (fp.getLong(0), fp.getLong(1))
    require(nVecs > 0, s"buildIvfIndex: nothing to index at $indexDir — " +
      "the corpus has no non-null embedding rows")

    graft.util.ParquetState.readIfAny(spark, metaPath(indexDir)).foreach { m =>
      // pre-batch-layout indexes carry a single unlabeled meta row; the
      // base row IS that row (appendIvfBatch rejects the old layout, so
      // no other batches can exist)
      val base = if (m.columns.contains("batch_id"))
        m.where(col("batch_id") === BaseBatch) else m
      val r = base
        .select(col("ann_params"), col("input_hash"), col("n_vecs")).head()
      require(r.getString(0) == params && r.getLong(1) == inHash &&
          r.getLong(2) == nVecs,
        s"index at $indexDir is committed for params '${r.getString(0)}' / " +
          s"input ${r.getLong(1)}/${r.getLong(2)} but this build uses " +
          s"'$params' / ${inHash}/${nVecs} — a drifted index must be " +
          "rebuilt in a fresh dir, never silently overwritten")
      return // committed + identical: no-op (appended batches preserved)
    }

    // reuse a stored codebook from a killed build iff BOTH its params
    // and its corpus fingerprint match this build's: the codebook is the
    // trained quantizer, so a corpus that drifted between the kill and
    // the retry must retrain — silently reusing an old-corpus codebook
    // would commit an index whose marker claims the NEW corpus while
    // recall at nProbe < nCells degrades unboundedly (exactly the stale-
    // index failure mode the meta marker guards against)
    val stored = graft.util.ParquetState.readIfAny(spark, codebookPath(indexDir))
      .filter { cb =>
        val p = cb.select(col("ann_params")).distinct().collect().map(_.getString(0))
        require(p.sameElements(Array(params)),
          s"uncommitted codebook at $indexDir was built with " +
            s"'${p.mkString(",")}' but this build uses '$params' — " +
            "rebuild in a fresh dir")
        // a fingerprint-mismatched (or pre-fingerprint) codebook is
        // stale, not an error: the kill happened, the corpus moved on —
        // retrain from scratch
        cb.columns.contains("input_hash") && {
          val h = cb.select(col("input_hash")).distinct().collect().map(_.getLong(0))
          h.sameElements(Array(inHash))
        }
      }
    val codebook: Array[Array[Double]] = stored match {
      case Some(cb) =>
        cb.orderBy(col("cell")).collect()
          .map(r => r.getSeq[Double](1).toArray)
      case None =>
        val fresh = ivfCodebook(corpus, corpusVec, corpusId, nCells, kmeansIters)
        val rows = fresh.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq
        spark.createDataFrame(rows).toDF("cell", "centroid")
          .withColumn("ann_params", lit(params))
          .withColumn("input_hash", lit(inHash))
          .write.mode(SaveMode.Overwrite).parquet(codebookPath(indexDir))
        fresh
    }

    c.select(nearestCell(col("cv"), codebook).as("cell"), col("cid"), col("cv"))
      .withColumn("batch_id", lit(BaseBatch))
      .write.mode(SaveMode.Overwrite).partitionBy("batch_id", "cell")
      .parquet(assignPath(indexDir))

    val marker = spark.createDataFrame(Seq((BaseBatch, params, inHash, nVecs)))
      .toDF("batch_id", "ann_params", "input_hash", "n_vecs")
    marker.write.mode(SaveMode.Overwrite).parquet(metaPath(indexDir))
    }

  /** The initial build's reserved batch id. */
  private[ops] val BaseBatch = "base"

  /** Append a DELTA of new vectors to a committed index — the growing-
    * corpus path: production similarity corpora gain a shard per day,
    * and re-running the k-means + full re-assignment per shard is the
    * same economics bug the persisted index fixed for serving
    * (IncrementalDedup's batch-lineage pattern, applied here).
    *
    * The delta is quantized against the EXISTING codebook (no retrain):
    * with nProbe = nCells serving stays exact over the grown corpus
    * regardless (every cell is probed), and at nProbe < nCells recall
    * over the delta degrades only as far as the base-trained centroids
    * misfit it — the standard IVF trade; retrain by rebuilding in a
    * fresh dir when the drift observable (per-batch counts in `meta/`)
    * says the appended mass rivals the base.
    *
    * Layout/commit contract (mirrors IncrementalDedup):
    *  - assignments append as a (batch_id, cell)-partitioned write;
    *  - one meta marker row per batch, appended AFTER the assignment
    *    write: a batch is part of the index iff its marker exists, and
    *    the serve path reads ONLY committed batches — a kill between
    *    the two writes leaves an invisible partial partition that the
    *    re-run overwrites (dynamic partition overwrite, idempotent);
    *  - a committed batchId re-runs as a no-op (input-hash checked:
    *    same id + different input rejects loudly);
    *  - params come from the stored meta, never from the caller —
    *    there is nothing the caller could drift;
    *  - delta ids must be new: an id already assigned (any batch)
    *    rejects loudly (the pair-op/global-id contract). */
  def appendIvfBatch(spark: org.apache.spark.sql.SparkSession,
      delta: DataFrame, deltaId: Column, deltaVec: Column,
      indexDir: String, batchId: String): Unit =
    // AQE off — same rationale as buildIvfIndex (the id-clash semi-join
    // is an ids-only column join whose static plan is fine at scale)
    graft.util.Adaptive.withoutAqe(spark) {
    import org.apache.spark.sql.SaveMode
    require(batchId.matches("[A-Za-z][A-Za-z0-9_.-]*") && batchId != BaseBatch,
      s"batchId must match [A-Za-z][A-Za-z0-9_.-]* and not '$BaseBatch' " +
        s"(got '$batchId'): it becomes a partition directory name")
    val meta = graft.util.ParquetState.readIfAny(spark, metaPath(indexDir))
      .getOrElse(throw new IllegalStateException(
        s"no committed index at $indexDir — run buildIvfIndex before " +
          "appending deltas"))
    require(meta.columns.contains("batch_id"),
      s"index at $indexDir was committed by the pre-batch layout (no " +
        "batch lineage in meta/) — rebuild it in a fresh dir to enable " +
        "incremental appends; mixing layouts would serve unlabeled rows")
    // ONE driver read of the (tiny) meta log serves the committed map
    // AND the stored params
    val metaRows = meta.select(col("batch_id"), col("input_hash"),
      col("n_vecs"), col("ann_params")).collect()
    val committed = metaRows
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    require(committed.contains(BaseBatch),
      s"index at $indexDir has no committed base build")
    val params = metaRows.find(_.getString(0) == BaseBatch).get.getString(3)

    val d = nonNullVecs(delta.select(deltaId.as("cid"), deltaVec.as("cv")), "cv")
    val fp = d.agg(
      coalesce(expr("bit_xor(xxhash64(cid, cv))"), lit(0L)).as("h"),
      count(lit(1)).as("n"), countDistinct(col("cid")).as("nd")).head()
    val (inHash, nVecs) = (fp.getLong(0), fp.getLong(1))
    require(nVecs > 0, s"appendIvfBatch: delta '$batchId' has no non-null " +
      "embedding rows — an empty shard is not an index batch")
    require(fp.getLong(2) == nVecs,
      s"delta '$batchId' carries duplicated vector id(s) — ids must be unique")

    committed.get(batchId) match {
      case Some((h, n)) =>
        require(h == inHash && n == nVecs,
          s"batch '$batchId' is already committed in $indexDir with a " +
            s"DIFFERENT input (hash/count ${h}/${n} vs ${inHash}/${nVecs}) " +
            "— batch ids must be stable per input shard")
        return // idempotent re-run
      case None => ()
    }
    // global id uniqueness across committed batches (column-pruned scan
    // of the id column only; uncommitted partials excluded so a killed
    // append does not block its own retry)
    val assigned = spark.read.parquet(assignPath(indexDir))
      .where(col("batch_id").isin(committed.keys.toSeq: _*))
    val clash = assigned.select(col("cid"))
      .join(d.select(col("cid")), Seq("cid"), "left_semi").take(1)
    require(clash.isEmpty,
      s"delta '$batchId' carries vector id ${clash.headOption.map(_.get(0)).getOrElse("?")} " +
        s"already indexed at $indexDir — ids must be globally unique")

    // a killed earlier attempt may have left visible files under this
    // (uncommitted) batch partition. If the shard was regenerated with
    // DIFFERENT content since, dynamic overwrite would replace only the
    // cells the NEW delta touches and ghost rows from the old attempt
    // would be committed under this batch's marker — wipe the whole
    // uncommitted partition first, statically, so the write below is the
    // partition's only content no matter what the first attempt wrote
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(indexDir), spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(
      s"${assignPath(indexDir)}/batch_id=$batchId"), true)

    val codebook = spark.read.parquet(codebookPath(indexDir))
      .orderBy(col("cell")).collect().map(_.getSeq[Double](1).toArray)
    d.select(nearestCell(col("cv"), codebook).as("cell"), col("cid"), col("cv"))
      .withColumn("batch_id", lit(batchId))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id", "cell")
      .parquet(assignPath(indexDir))

    spark.createDataFrame(Seq((batchId, params, inHash, nVecs)))
      .toDF("batch_id", "ann_params", "input_hash", "n_vecs")
      .write.mode(SaveMode.Append).parquet(metaPath(indexDir))
    }

  /** Serve top-k queries from a PERSISTED index ([[buildIvfIndex]]).
    * The stored codebook broadcasts into the probe ranking; the
    * assignment read carries an explicit cell filter, so parquet
    * partition pruning touches only the probed cells' files. With
    * nProbe = nCells the answer equals brute force exactly (the gate
    * query pins this against the brute-force oracle). */
  def ivfTopKFromIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, queries: DataFrame, queryId: Column, queryVec: Column,
      k: Int, nProbe: Int = 4): DataFrame = {
    val meta = graft.util.ParquetState.readIfAny(spark, metaPath(indexDir))
      .getOrElse(throw new IllegalStateException(
        s"no committed index at $indexDir (missing meta marker) — run " +
          "buildIvfIndex first; a killed build leaves no marker by design"))
    // the index = the COMMITTED batches (base build + appended deltas):
    // a killed append leaves assignment files without a marker row, and
    // reading them would serve uncommitted, possibly-partial data.
    // Pre-batch-layout indexes (single unlabeled meta row, cell-only
    // assignment partitioning) have no appends by construction — serve
    // them whole (empty filter below).
    val batchAware = meta.columns.contains("batch_id")
    val committedBatches = if (batchAware)
      meta.select(col("batch_id")).collect().map(_.getString(0)).toSeq
    else Seq.empty
    require(!batchAware || committedBatches.contains(BaseBatch),
      s"index at $indexDir has no committed base build")
    val cb = spark.read.parquet(codebookPath(indexDir))
      .orderBy(col("cell")).collect()
    val codebook = cb.map(r => r.getSeq[Double](1).toArray)
    val centroidDf = spark.createDataFrame(
      codebook.zipWithIndex.map { case (v, i) => (i, v.toSeq) }.toSeq)
      .toDF("cell", "centroid")
    val qw = Window.partitionBy(col("query_id"))
      .orderBy(col("qsim").desc, col("cell").asc)
    // the probe set is query-batch-sized (queries x nProbe) by the serve
    // contract, so materialize it ONCE on the driver and serve both
    // consumers (the literal cell filter and the broadcast join side)
    // from the local rows — leaving it lazy would execute the query-side
    // scan + centroid ranking twice, once for the collect and once
    // inside the join
    val probePlan = nonNullVecs(
        queries.select(queryId.as("query_id"), queryVec.as("qv")), "qv")
      .crossJoin(broadcast(centroidDf))
      .select(col("query_id"), col("qv"), col("cell"),
        cosine(col("qv"), col("centroid")).as("qsim"))
      .withColumn("rn", row_number().over(qw))
      .where(col("rn") <= nProbe)
      .select(col("cell"), col("query_id"), col("qv"))
    // control action: query-batch-sized by the serve contract — AQE off
    // saves its re-planning jobs; the serve join itself stays lazy and
    // runs under the caller's conf
    val probeRows = graft.util.Adaptive.withoutAqe(spark) { probePlan.collect() }
    val probes = spark.createDataFrame(
      java.util.Arrays.asList(probeRows: _*), probePlan.schema)
    // literal cell filter for partition pruning — the join alone would
    // filter ROWS but still list/scan every cell's files
    val probedCells = probeRows.map(_.getInt(0)).distinct.toSeq
    // an empty probe set (empty/all-null query batch) leaves an
    // always-false isin: the plan prunes every partition and the result
    // is empty with the regular schema
    val assigned = spark.read.parquet(assignPath(indexDir))
      .where((if (batchAware) col("batch_id").isin(committedBatches: _*)
        else lit(true)) && col("cell").isin(probedCells: _*))
    val scored = assigned.join(broadcast(probes), Seq("cell"))
      .where(col("cid") =!= col("query_id"))
      .select(col("query_id"), col("cid").as("neighbor_id"),
        cosine(col("qv"), col("cv")).as("cos"))
    rankTopK(scored, k)
  }

  /** Size hyperplane-LSH parameters for a corpus: the sf1-class bench
    * showed WHY this matters — with planesPerBand fixed at 6, bucket
    * occupancy is n/2^6 and the candidate volume grows QUADRATICALLY in
    * n through random collisions (the 38× wall at a mere 10× corpus).
    * Planes must scale with log2(n) to hold occupancy flat; bands then
    * buy the recall back (each extra plane halves a band's match
    * probability at the threshold).
    *
    * Closed forms (standard random-hyperplane analysis): per-plane
    * collision probability at cosine c is p = 1 − acos(c)/π; a band of
    * r planes matches with p^r; b bands (OR-construction) recall
    * 1 − (1 − p^r)^b. Random far pairs collide per band with ~2^-r, so
    * expected occupancy per band-bucket is n/2^r.
    *
    * @return (bands, planesPerBand) with planesPerBand =
    *         max(1, ceil(log2(n / maxOccupancy))) and bands the
    *         smallest b reaching targetRecall at minCos. */
  def lshParamsFor(n: Long, minCos: Double, targetRecall: Double = 0.999,
      maxOccupancy: Long = 1000L): (Int, Int) = {
    require(n > 0 && maxOccupancy > 0)
    require(minCos > -1.0 && minCos < 1.0,
      s"minCos must be in (-1, 1), got $minCos")
    require(targetRecall > 0.0 && targetRecall < 1.0,
      s"targetRecall must be in (0, 1), got $targetRecall")
    val r = math.max(1,
      math.ceil(math.log(n.toDouble / maxOccupancy) / math.log(2.0)).toInt)
    val p = 1.0 - math.acos(minCos) / math.Pi
    val pBand = math.pow(p, r)
    val bDouble =
      math.ceil(math.log1p(-targetRecall) / math.log1p(-pBand))
    // reject the whole infeasible regime loudly — a huge-but-finite band
    // count is as useless as an overflowed one (each band is a full
    // explode+join pass over the corpus), and Double→Int silently
    // saturates at Int.MaxValue
    val MaxBands = 4096
    require(bDouble.isFinite && bDouble <= MaxBands,
      s"reaching recall $targetRecall at cos=$minCos with $r planes/band " +
        f"(band match probability $pBand%.2e) needs ${bDouble}%.0f bands " +
        s"(> $MaxBands) — no realistic band count works; raise " +
        "maxOccupancy or minCos, or lower targetRecall")
    (math.max(1, bDouble.toInt), r)
  }

  /** LSH-bucketed ANN: queries only scan the corpus vectors sharing a
    * bucket in at least one of `nTables` independent hash tables (the
    * standard OR-construction: per-pair hit probability
    * 1 - (1 - (1-θ/π)^nPlanes)^nTables). `nTables = 1` is the classic
    * single-table variant; more tables buy recall for candidate volume.
    * Scale shape: the corpus side carries only (table, bucket, id) into
    * the bucket join — bare (query, neighbor) pairs are deduplicated
    * across tables BEFORE the corpus payload (the vectors) is re-joined,
    * so vectors never ride through the multi-table explosion. Same output
    * shape as bruteForceTopK; recall < 1 by design (measured in tests
    * and bounded at the gate by the recall bound-check query). */
  def lshTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
      queries: DataFrame, queryId: Column, queryVec: Column,
      k: Int, nPlanes: Int = 8, nTables: Int = 1, seed: Long = 42L): DataFrame = {
    require(nTables >= 1, s"nTables must be >= 1, got $nTables")
    val c = nonNullVecs(corpus.select(corpusId.as("neighbor_id"), corpusVec.as("cv")), "cv")
    val q = nonNullVecs(queries.select(queryId.as("query_id"), queryVec.as("qv")), "qv")
    def tableBuckets(vec: Column): Column = array((0 until nTables).map { t =>
      // distinct plane sets per table: large odd stride keeps seeds apart
      lshBucket(vec, nPlanes, seed + 0x9e3779b97f4a7c15L * (t + 1))
    }: _*)
    val cB = c.select(col("neighbor_id"),
      posexplode(tableBuckets(col("cv"))).as(Seq("tbl", "bucket")))
    val qB = q.select(col("query_id"),
      posexplode(tableBuckets(col("qv"))).as(Seq("tbl", "bucket")))
    val pairs = cB.join(broadcast(qB), Seq("tbl", "bucket"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
    // the candidate set is CORPUS-proportional — each query's buckets
    // hold ~|corpus|/2^nPlanes ids per table, so at 1B corpus rows and
    // the default 8 planes a 100-query batch already carries ~400M
    // pairs: forcing a broadcast here would hit the 8 GB broadcast wall
    // / driver OOM. The pairs instead shuffle by neighbor_id (8-byte
    // rows) and hash-build against the corpus scan (never sort-merge);
    // only the genuinely query-sized side (the query vectors) broadcasts.
    val scored = c.join(pairs.hint("shuffle_hash"), Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cos"))
    rankTopK(scored, k)
  }
}
