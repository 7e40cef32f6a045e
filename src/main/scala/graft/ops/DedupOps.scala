package graft.ops

import graft.functions.{MinHashSig, SetOverlap, ShingleHashSet, ShingleMinHash, SimHash64, SortedLongOverlap}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, each designed
  * around one shuffle:
  *
  *  - exact: group by 64-bit content fingerprint (8-byte shuffle key, not
  *    the document itself), keep the min-id representative;
  *  - MinHash + LSH: signature -> bands -> bucket join; only bucket-mates
  *    are compared, so the candidate set is ~linear instead of n²;
  *  - SimHash: 64-bit prints, banded by 16-bit quarters so any pair within
  *    Hamming distance 3 shares at least one band (pigeonhole);
  *  - n-gram Jaccard: exact set similarity inside cheap blocking keys.
  */
object DedupOps {

  def simhash(tokens: Column): Column =
    TextOps.toColumn(SimHash64(TextOps.expression(tokens)))

  def minhashSig(tokens: Column, nHashes: Int): Column =
    TextOps.toColumn(MinHashSig(TextOps.expression(tokens),
      TextOps.expression(lit(nHashes))))

  /** Fused string-free MinHash over word k-shingles (see ShingleMinHash). */
  def shingleMinhashSig(tokens: Column, k: Int, nHashes: Int): Column =
    TextOps.toColumn(ShingleMinHash(TextOps.expression(tokens),
      TextOps.expression(lit(k)), TextOps.expression(lit(nHashes))))

  /** Exact dedup: one row per distinct content, keeping the smallest id.
    * Output columns: fingerprint, kept_id, n_dups. */
  def exactDedup(df: DataFrame, text: Column, id: Column): DataFrame =
    df.groupBy(TextOps.fingerprint(text).as("fingerprint"))
      .agg(min(id).as("kept_id"), count(lit(1)).as("n_dups"))

  /** MinHash-LSH candidate pairs: signatures of `bands*rowsPerBand`
    * hashes, banded; pairs sharing >= 1 band bucket are candidates, then
    * filtered by estimated Jaccard (signature agreement) >= threshold.
    * Output: id_a, id_b, est_jaccard (ids ordered, distinct pairs). */
  def minhashCandidates(df: DataFrame, tokens: Column, id: Column,
      bands: Int = 8, rowsPerBand: Int = 4, threshold: Double = 0.5): DataFrame =
    minhashCandidatesFromSig(
      df.select(id.as("id"), minhashSig(tokens, bands * rowsPerBand).as("sig")),
      bands, rowsPerBand, threshold)

  /** Like [[minhashCandidates]] but fused over word k-shingles without
    * materializing shingle strings. */
  def minhashShingleCandidates(df: DataFrame, tokens: Column, id: Column,
      k: Int = 3, bands: Int = 8, rowsPerBand: Int = 4,
      threshold: Double = 0.5): DataFrame =
    minhashCandidatesFromSig(
      df.select(id.as("id"),
        shingleMinhashSig(tokens, k, bands * rowsPerBand).as("sig")),
      bands, rowsPerBand, threshold)

  private def minhashCandidatesFromSig(sigged: DataFrame,
      bands: Int, rowsPerBand: Int, threshold: Double): DataFrame = {
    val nHashes = bands * rowsPerBand
    // band key = hash of the band's slice of the signature
    val banded = sigged.select(
      col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat(lit("band"), b.cast("string"),
          concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)))))))
        .as(Seq("band", "bucket")))
    val a = banded.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (aggregate(zip_with(col("sig_a"), col("sig_b"),
            (x, y) => when(x === y, 1).otherwise(0)),
            lit(0), (acc, v) => acc + v).cast("double") / lit(nHashes))
          .as("est_jaccard"))
      .distinct()
      .where(col("est_jaccard") >= threshold)
  }

  /** SimHash near-dup pairs within Hamming distance <= maxDist (<= 3
    * guaranteed found via 4x16-bit banding). Output: id_a, id_b, dist. */
  def simhashPairs(df: DataFrame, tokens: Column, id: Column,
      maxDist: Int = 3): DataFrame = {
    val printed = df.select(id.as("id"), simhash(tokens).as("sh"))
    val bandCols = (0 until 4).map(i =>
      shiftrightunsigned(col("sh"), 16 * i).bitwiseAND(lit(0xffffL)))
    val banded = printed.select(col("id"), col("sh"),
      posexplode(array(bandCols: _*)).as(Seq("band", "bucket")))
    val a = banded.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("dist"))
      .distinct()
      .where(col("dist") <= maxDist)
  }

  /** Exact n-gram (word k-shingle) Jaccard pairs within blocking keys.
    * Blocking bounds the join fan-out; pairs in different blocks are not
    * compared (standard blocking trade-off, identical on the oracle side).
    * Output: id_a, id_b, inter, uni (set sizes; jaccard = inter/uni). */
  def ngramJaccardPairs(df: DataFrame, text: Column, id: Column,
      blockKeys: Seq[Column], k: Int = 3): DataFrame = {
    // hash each document's shingles ONCE into a sorted distinct long set;
    // pairs then overlap by a zero-allocation two-pointer walk (exact:
    // 64-bit shingle-hash collisions are ~1e-15 per pair at these sizes)
    val grams = TextOps.toColumn(ShingleHashSet(
      TextOps.expression(TextOps.tokens(text)), TextOps.expression(lit(k))))
    val base = df.select((blockKeys.zipWithIndex.map { case (c, i) => c.as(s"bk$i") } :+
      id.as("id") :+ grams.as("grams")): _*)
    val bk = blockKeys.indices.map(i => s"bk$i")
    val a = base.select((bk.map(col) :+ col("id").as("id_a") :+ col("grams").as("g_a")): _*)
    val b = base.select((bk.map(col) :+ col("id").as("id_b") :+ col("grams").as("g_b")): _*)
    a.join(b, bk)
      .where(col("id_a") < col("id_b"))
      .withColumn("ov", TextOps.toColumn(SortedLongOverlap(
        TextOps.expression(col("g_a")), TextOps.expression(col("g_b")))))
      .select(col("id_a"), col("id_b"),
        col("ov.inter").as("inter"), col("ov.uni").as("uni"))
  }

  /** Connected components over an undirected similarity-pair graph by
    * iterative min-label propagation — turns near-dup PAIRS into dup
    * GROUPS so one representative survives per cluster. Each round is one
    * shuffle (groupBy node); rounds needed = graph diameter in label
    * space, which for dedup clusters (small, dense) is ~log of the chain
    * length. Converges when no label changes.
    * Input: pairs (id_a, id_b); nodes: (id). Output: (id, component)
    * where component = min id reachable. */
  def connectedComponents(nodes: DataFrame, pairs: DataFrame,
      maxRounds: Int = 20): DataFrame = {
    val spark = nodes.sparkSession
    val edges = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
      .union(pairs.select(col("id_b").as("u"), col("id_a").as("v")))
      .distinct().cache()
    var labels = nodes.select(col("id"), col("id").as("component")).cache()
    var changed = 1L
    var round = 0
    while (changed > 0 && round < maxRounds) {
      // candidate label for u = min(label(u), min over neighbors v of label(v))
      val viaEdges = edges.join(labels, edges("v") === labels("id"))
        .select(col("u").as("id"), col("component"))
      val next = labels.select(col("id"), col("component"))
        .union(viaEdges)
        .groupBy(col("id"))
        .agg(min(col("component")).as("component"))
        .cache()
      changed = next.join(labels.withColumnRenamed("component", "old"), Seq("id"))
        .where(col("component") =!= col("old")).count()
      labels.unpersist()
      labels = next
      round += 1
    }
    edges.unpersist()
    labels
  }

  /** Full near-dup dedup: candidate pairs -> components -> one kept
    * representative (min id) per component.
    * Output: (id, component, kept) — kept = (id == component). */
  def dedupByPairs(nodes: DataFrame, pairs: DataFrame): DataFrame =
    connectedComponents(nodes, pairs)
      .select(col("id"), col("component"),
        (col("id") === col("component")).as("kept"))

  /** Embedding near-dup pairs: LSH-bucketed cosine (exact re-check inside
    * buckets). Output: id_a, id_b, cos. */
  def embeddingNearDups(df: DataFrame, vec: Column, id: Column,
      minCos: Double, nPlanes: Int = 12, seed: Long = 42L): DataFrame = {
    val bucketed = df.select(id.as("id"), vec.as("v"),
      AnnOps.lshBucket(vec, nPlanes, seed).as("bucket"))
    val a = bucketed.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = bucketed.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), AnnOps.cosine(col("v_a"), col("v_b")).as("cos"))
      .where(col("cos") >= minCos)
      .distinct()
  }
}
