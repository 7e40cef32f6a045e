package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sf-scale-up of a shipped testdata directory: each table
  * is replicated `R` times with every key column shifted by `r * stride`
  * (stride = the source keyspace size), so replica r is a disjoint,
  * join-consistent copy of the original star schema — l_orderkey always
  * finds its o_orderkey, o_custkey its c_custkey, inside the same
  * replica. This preserves the shipped distributions EXACTLY (per-key
  * frequencies, text/gram statistics, session shapes, value ranges)
  * while multiplying volume, which is what the sf1-class gate evidence
  * needs: the compare is Spark vs DuckDB over the SAME generated tables,
  * so correctness is self-contained; what replication buys is that every
  * data-derived margin (heavy-hitter thresholds, LSH recall, bucket
  * caps) keeps the same relative structure it was tuned against at
  * sf0.1 instead of drifting under an invented synthetic.
  *
  * Non-key columns are copied verbatim — in particular document texts
  * and embedding vectors, so sf1 carries exact cross-replica duplicate
  * texts/vectors (a realistic property of scraped corpora; the exact-
  * dedup and ANN queries handle ties deterministically by id).
  *
  * No RNG anywhere: the output is a pure function of (src, replicas),
  * reproducible bit-for-bit. Usage:
  *   runMain graft.jobs.SfScaleGen <srcSfDir> <outDir> <replicas>
  */
object SfScaleGen {
  /** key columns to shift, per table, with the stride = source keyspace
    * size (max+1, asserted below so a drifted fixture fails loudly). */
  private val keyCols: Map[String, Seq[(String, Long)]] = Map(
    "region" -> Nil,
    "nation" -> Nil, // fixed dims: geography does not grow with volume
    "customer" -> Seq("c_custkey" -> 0L),
    "supplier" -> Seq("s_suppkey" -> 0L),
    "part" -> Seq("p_partkey" -> 0L),
    "orders" -> Seq("o_orderkey" -> 0L, "o_custkey" -> 0L),
    "lineitem" -> Seq("l_orderkey" -> 0L, "l_partkey" -> 0L, "l_suppkey" -> 0L),
    "events" -> Seq("event_id" -> 0L, "user_id" -> 0L),
    "documents" -> Seq("doc_id" -> 0L),
    "embeddings" -> Seq("vec_id" -> 0L))

  /** the stride for a shifted FK is its referenced table's keyspace, not
    * this table's — resolved here by column name. */
  private def strideFor(spark: SparkSession, src: String): Map[String, Long] = {
    def keyspace(table: String, col: String): Long = {
      val m = spark.read.parquet(s"$src/$table.parquet")
        .agg(max(expr(col)).cast("long"), count(lit(1))).head()
      val (mx, n) = (m.getLong(0), m.getLong(1))
      require(mx == n - 1,
        s"$table.$col keyspace is not dense 0..n-1 (max=$mx n=$n) — " +
          "the shifted-replica scale-up assumes dense keys; regenerate " +
          "against the shipped fixture layout")
      n
    }
    // user_id is a VALUE domain (the events table's user population),
    // not a dense PK: its stride is max+1 over the observed ids, with
    // density of the DOMAIN (distinct == max+1) still asserted
    val u = spark.read.parquet(s"$src/events.parquet")
      .agg(max(col("user_id")).cast("long"),
        countDistinct(col("user_id"))).head()
    require(u.getLong(1) == u.getLong(0) + 1,
      s"events.user_id domain is not dense 0..max " +
        s"(max=${u.getLong(0)} distinct=${u.getLong(1)})")
    Map(
      "c_custkey" -> keyspace("customer", "c_custkey"),
      "s_suppkey" -> keyspace("supplier", "s_suppkey"),
      "p_partkey" -> keyspace("part", "p_partkey"),
      "o_orderkey" -> keyspace("orders", "o_orderkey"),
      "o_custkey" -> keyspace("customer", "c_custkey"),
      "l_orderkey" -> keyspace("orders", "o_orderkey"),
      "l_partkey" -> keyspace("part", "p_partkey"),
      "l_suppkey" -> keyspace("supplier", "s_suppkey"),
      "event_id" -> keyspace("events", "event_id"),
      "user_id" -> (u.getLong(0) + 1),
      "doc_id" -> keyspace("documents", "doc_id"),
      "vec_id" -> keyspace("embeddings", "vec_id"))
  }

  /** key-DERIVED text columns that must stay bijective with their key
    * (the gate's join_enrich_topsupp groups by s_name as a key alias):
    * re-derive them from the shifted key in the fixture's own format.
    * Other text (p_name word pairs, document text, event props) is
    * intentionally copied verbatim — cross-replica duplicate content is
    * the realistic property replication buys. */
  private val rederive: Map[String, DataFrame => DataFrame] = Map(
    "supplier" -> (df => df.withColumn("s_name",
      format_string("Supplier#%09d", col("s_suppkey")))),
    "customer" -> (df => df.withColumn("c_name",
      format_string("Customer#%09d", col("c_custkey")))))

  def scaleTable(df: DataFrame, shifts: Seq[(String, Long)],
      replicas: Int): DataFrame = {
    // one scan, `replicas` output rows per input row: explode a replica
    // index and shift every key by r * stride. Map-only at any scale —
    // no self-union of N scans, no shuffle.
    val withR = df.withColumn("__r",
      explode(sequence(lit(0L), lit(replicas - 1L))))
    shifts.foldLeft(withR) { case (d, (c, stride)) =>
      d.withColumn(c, (col(c).cast("long") + col("__r") * stride)
        .cast(df.schema(c).dataType))
    }.drop("__r")
  }

  def main(args: Array[String]): Unit = {
    val Array(src, out, rStr) = args
    val replicas = rStr.toInt
    require(replicas >= 1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-sf-scale-gen")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, src, out, replicas)
    spark.stop()
  }

  def run(spark: SparkSession, src: String, out: String, replicas: Int): Unit = {
    val strides = strideFor(spark, src)
    for ((table, keys) <- keyCols.toSeq.sortBy(_._1)) {
      val df = spark.read.parquet(s"$src/$table.parquet")
      val shifts = keys.map { case (c, _) => c -> strides(c) }
      val scaled0 =
        if (shifts.isEmpty) df else scaleTable(df, shifts, replicas)
      val scaled = rederive.get(table).fold(scaled0)(f =>
        if (shifts.isEmpty) scaled0 else f(scaled0))
      // match the driver fixture layout EXACTLY: one plain FILE named
      // `<table>.parquet` (the streaming gate queries' pathGlobFilter
      // and DuckDB's single-file reads both assume a leaf file, not a
      // Spark part-file directory)
      val dest = s"$out/$table.parquet"
      graft.util.ParquetState.writeSingleFile(scaled, dest)
      println(s"[sfgen] $table: ${df.count()} -> ${spark.read.parquet(dest).count()}")
    }
  }
}
