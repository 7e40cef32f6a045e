package graft.jobs

import graft.api
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Checkpoint-resumable distributed sketch build (SURVEY.md §7.2 M3,
  * north_rule: "resumable from checkpoint with per-partition lineage +
  * metrics").
  *
  * Stage 1 salts each (skewed) source into `salts` shards and builds one
  * sketch partial per (source, salt) — the unit of work AND of resume.
  * Partials land in the checkpoint dir as parquet partitioned by salt with
  * full lineage (rows, tokens, order-insensitive input hash). Stage 2
  * kernel-merges partials per source with *_merge_agg.
  *
  * Resume: shards already present in the checkpoint are anti-joined away
  * from the input, so a killed stage-1 job re-processes only missing
  * shards; stage 2 always recomputes from the (cheap, tiny) partials.
  * Because sketches are merge-order-invariant, a resumed build yields
  * byte-identical per-source CQF contents to an uninterrupted one
  * (asserted in BuildSketchesSpec).
  */
object BuildSketches {

  /** kind: cqf | hll | cms | tdigest | kll | bloom | ss | kmv.
    * groupFirst co-partitions rows by (source, salt) before aggregating:
    * each shard's sketch is built by exactly one task (cache-resident
    * working set, no k-way partial re-merge) — the right plan when group
    * sketches are large relative to per-task slices; disable to use
    * Catalyst's default map-side partial aggregation.
    * salts is the MEAN shard count per source; with autoSalt (default)
    * the per-source counts are derived from observed row counts (one
    * cheap pre-pass over the `source` column), so one hot source holding
    * most of the corpus gets most of the shard budget instead of the
    * same fixed count as a cold source — at 100x data a fixed count
    * would leave the hot source's shards 100x the others and the stage
    * wall clock would be that one task. */
  final case class Config(
      kind: String = "cqf",
      salts: Int = 16,
      autoSalt: Boolean = true,
      groupFirst: Boolean = true,
      quotientBits: Int = 12,
      hashBits: Int = 64,
      compact: Boolean = false,
      hllP: Int = 12,
      cmsDepth: Int = 5,
      cmsWidth: Int = 8192,
      bloomBits: Long = 1L << 20,
      bloomHashes: Int = 5,
      tdCompression: Double = 100.0,
      kllK: Int = 200,
      ssK: Int = 4096,
      kmvK: Int = 1024)

  private def buildAgg(cfg: Config, tokens: Column): Column = cfg.kind match {
    case "cqf" => api.cqf_agg(tokens, cfg.quotientBits, cfg.hashBits, cfg.compact)
    case "hll" => api.hll_agg(tokens, cfg.hllP)
    case "cms" => api.cms_agg(tokens, cfg.cmsDepth, cfg.cmsWidth)
    case "bloom" => api.bloom_agg(tokens, cfg.bloomBits, cfg.bloomHashes)
    case "tdigest" => api.td_agg(tokens, cfg.tdCompression)
    case "kll" => api.kll_agg(tokens, cfg.kllK)
    case "ss" => api.ss_agg(tokens, cfg.ssK)
    case "kmv" => api.kmv_agg(tokens, cfg.kmvK)
    case other => throw new IllegalArgumentException(s"unknown sketch kind $other")
  }

  /** Canonical encoding of the kind's BUILD PARAMETERS — written into
    * every checkpoint partial so a resume with drifted config (hllP
    * bumped, cms resized...) is rejected BEFORE appending incompatible
    * partials beside the old ones. Without it the kind check passes, the
    * mixed-geometry shards land in the done-set, and stage 2 crashes on
    * a merge mismatch that no re-run with any single config can clear. */
  private[jobs] def paramString(cfg: Config): String = cfg.kind match {
    case "cqf" => s"cqf;q=${cfg.quotientBits};hb=${cfg.hashBits};compact=${cfg.compact}"
    case "hll" => s"hll;p=${cfg.hllP}"
    case "cms" => s"cms;d=${cfg.cmsDepth};w=${cfg.cmsWidth}"
    case "bloom" => s"bloom;bits=${cfg.bloomBits};h=${cfg.bloomHashes}"
    case "tdigest" => s"tdigest;c=${cfg.tdCompression}"
    case "kll" => s"kll;k=${cfg.kllK}"
    case "ss" => s"ss;k=${cfg.ssK}"
    case "kmv" => s"kmv;k=${cfg.kmvK}"
    case other => throw new IllegalArgumentException(s"unknown sketch kind $other")
  }

  private def mergeAgg(cfg: Config, sketch: Column): Column = cfg.kind match {
    case "cqf" => api.cqf_merge_agg(sketch)
    case "hll" => api.hll_merge_agg(sketch)
    case "cms" => api.cms_merge_agg(sketch)
    case "bloom" => api.bloom_merge_agg(sketch)
    case "tdigest" => api.td_merge_agg(sketch)
    case "kll" => api.kll_merge_agg(sketch)
    case "ss" => api.ss_merge_agg(sketch)
    case "kmv" => api.kmv_merge_agg(sketch)
    case other => throw new IllegalArgumentException(s"unknown sketch kind $other")
  }

  /** Per-source shard counts: the total shard budget (cfg.salts x
    * #sources) split proportionally to observed per-source row counts,
    * clamped to [1, 4096]. Deterministic for a given input, so the
    * resume anti-join recomputes identical salts. */
  def saltCounts(df: DataFrame, cfg: Config): Map[String, Int] = {
    // a NULL source is legal input: it cannot ride the scheme map (a null
    // map key breaks typedLit and the scheme sort) so it takes the default
    // shard count via the saltExprFor coalesce — same as any source first
    // seen after the scheme was derived
    val counts = df.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().flatMap(r => Option(r.getString(0)).map(_ -> r.getLong(1))).toMap
    val total = math.max(1L, counts.values.sum)
    val budget = cfg.salts.toDouble * counts.size
    counts.map { case (s, n) =>
      s -> math.min(4096, math.max(1, math.round(budget * n / total).toInt))
    }
  }

  /** Canonical string encoding of a salt scheme — written into every
    * checkpoint partial so a resume can (a) detect that the checkpoint
    * was sharded under a different scheme (old code, changed config, or
    * drifted per-source row counts) and (b) re-shard remaining rows
    * under the CHECKPOINT's scheme rather than a freshly derived one. */
  // source names come straight from data (adversarial by policy): a name
  // containing the scheme's own delimiters (',' '=' ';') would corrupt
  // the encoding or crash the parse — percent-encode each name. Names
  // without special characters encode to themselves, so schemes recorded
  // by earlier builds keep parsing identically.
  private def encName(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
  private def decName(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  // "v2;" tags percent-encoded schemes. Untagged (legacy) schemes were
  // written with raw names, so decoding them would corrupt any name that
  // legitimately contains '%' or '+' — legacy parses raw, v2 decodes.
  private[jobs] def schemeString(map: Map[String, Int], default: Int): String =
    map.toSeq.sortBy(_._1).map { case (s, n) => s"${encName(s)}=$n" }
      .mkString(s"v2;default=$default;", ",", "")

  private[jobs] def parseScheme(s: String): (Map[String, Int], Int) = {
    val (tagged, body) =
      if (s.startsWith("v2;")) (true, s.substring(3)) else (false, s)
    val Array(head, rest @ _*) = body.split(";", 2)
    val default = head.stripPrefix("default=").toInt
    val dec: String => String = if (tagged) decName else identity
    val map = rest.headOption.filter(_.nonEmpty).map(_.split(",").map { kv =>
      val i = kv.lastIndexOf('=')
      dec(kv.substring(0, i)) -> kv.substring(i + 1).toInt
    }.toMap).getOrElse(Map.empty)
    (map, default)
  }

  /** Salt expression for a concrete scheme. try_element_at (not
    * element_at): under ANSI mode a source unseen when the scheme was
    * derived must fall back to the default, not throw. */
  private[jobs] def saltExprFor(map: Map[String, Int], default: Int): Column = {
    val perSource: Column =
      if (map.nonEmpty)
        coalesce(try_element_at(typedLit(map), col("source")), lit(default))
      else lit(default)
    pmod(xxhash64(col("doc_id")), perSource).cast("int")
  }

  /** Derive this run's salt scheme from the input (see [[saltCounts]]). */
  private[jobs] def deriveScheme(df: DataFrame, cfg: Config): (Map[String, Int], Int) =
    (if (cfg.autoSalt) saltCounts(df, cfg) else Map.empty[String, Int], cfg.salts)

  /** The salt expression shared by stage 1 and the resume anti-join. */
  private[jobs] def saltExpr(df: DataFrame, cfg: Config): Column = {
    val (map, default) = deriveScheme(df, cfg)
    saltExprFor(map, default)
  }

  /** Stage 1: per-(source, salt) sketch partials with lineage columns
    * (F4 fixture schema). `scheme` overrides the salt scheme — the
    * resume path passes the CHECKPOINT's recorded scheme so a
    * partially-built checkpoint and its resume agree on every row's
    * shard even if per-source row proportions drifted in between. */
  def buildPartials(df: DataFrame, cfg: Config,
      scheme: Option[(Map[String, Int], Int)] = None): DataFrame = {
    val (saltMap, saltDefault) = scheme.getOrElse(deriveScheme(df, cfg))
    val salted = df.withColumn("salt", saltExprFor(saltMap, saltDefault))
    val distributed =
      if (cfg.groupFirst) salted.repartition(col("source"), col("salt"))
      else salted
    // DEFAULT fast path: a `packed` BINARY column (pack_ints layout) keeps
    // the scan on parquet's vectorized primitive path — used automatically
    // for CQF builds when the input table carries it
    val agg0 =
      if (cfg.kind == "cqf" && df.columns.contains("packed"))
        api.cqf_agg_packed(col("packed"), cfg.quotientBits, cfg.hashBits, cfg.compact)
      else buildAgg(cfg, col("tokens"))
    distributed
      .groupBy(col("source"), col("salt"))
      .agg(
        agg0.as("sketch_bytes"),
        count(lit(1)).as("n_rows"),
        sum(col("n_tok").cast("long")).as("n_tokens"),
        // order-insensitive input hash (xor of row hashes) — idempotence
        // check for resume (same rows ⇒ same hash); xor cannot overflow
        // under ANSI mode, unlike sum
        expr("bit_xor(xxhash64(doc_id, n_tok))").as("input_hash"))
      .withColumn("sketch_kind", lit(cfg.kind))
      // the kind's build parameters — resume rejects config drift up front
      .withColumn("build_params", lit(paramString(cfg)))
      // the scheme every row was sharded under — resume validates/reuses it
      .withColumn("salt_scheme", lit(schemeString(saltMap, saltDefault)))
      // per-partial sketch-state metrics (load factor, counts, error
      // bound at the current state) — the monitoring half of the
      // north-rule lineage contract; resume reads never depend on it,
      // so pre-metric checkpoints stay resumable
      .withColumn("sketch_state", graft.api.sketch_meta(col("sketch_bytes")))
  }

  /** Run (or resume) the build. Returns the per-source final sketches:
    * (source, sketch_bytes, n_rows, n_tokens). */
  def run(spark: SparkSession, input: DataFrame, checkpointDir: String,
      cfg: Config = Config()): DataFrame = {
    graft.GraftFunctions.registerAll(spark)
    // VISIBLE entries only (shared guard, graft.util.ParquetState): a
    // killed first run leaves _temporary/ (and a committed empty run
    // leaves _SUCCESS) — counting those as checkpoint data would send
    // the advertised killed-job resume into a parquet read with zero
    // data files (UNABLE_TO_INFER_SCHEMA) instead of a fresh start
    val existing: Option[DataFrame] =
      graft.util.ParquetState.readIfAny(spark, checkpointDir)

    // observe() metrics on the input actually consumed this run
    val observed = input.observe("graft_build",
      count(lit(1)).as("rows_in"),
      sum(col("n_tok").cast("long")).as("tokens_in"))

    // A resume MUST shard under the scheme the checkpoint was built with:
    // recomputing salts from this run's input (autoSalt counts can drift,
    // config can change) would silently drop/double-count rows against
    // the recorded (source, salt) done-set. The scheme travels inside the
    // checkpoint itself; a checkpoint without it is rejected loudly.
    val scheme: (Map[String, Int], Int) = existing match {
      case Some(ck) if ck.columns.contains("salt_scheme") =>
        // the checkpoint's KIND must match too: resuming a cqf build as
        // hll would append incompatible partials beside the old ones and
        // stage 2 would feed cqf bytes into hll_merge_agg
        if (ck.columns.contains("sketch_kind")) {
          val kinds = ck.select(col("sketch_kind")).distinct()
            .collect().map(_.getString(0))
          require(kinds.sameElements(Array(cfg.kind)),
            s"checkpoint at $checkpointDir holds sketch kind " +
            s"'${kinds.mkString(",")}' but this run builds '${cfg.kind}' — " +
            "use a fresh checkpoint dir per kind")
        }
        // same-kind resumes with drifted parameters are rejected BEFORE
        // any append. Pre-param-tracking partials read the column as
        // NULL — a legacy checkpoint (or one already resumed once by
        // newer code, mixing tagged and untagged partials) stays
        // resumable as long as every TAGGED partial matches this run.
        if (ck.columns.contains("build_params")) {
          val params = ck.select(col("build_params")).distinct()
            .collect().map(_.getString(0)).filter(_ != null)
          require(params.isEmpty || params.sameElements(Array(paramString(cfg))),
            s"checkpoint at $checkpointDir was built with parameters " +
            s"'${params.mkString(",")}' but this run uses " +
            s"'${paramString(cfg)}' — appending would poison the " +
            "checkpoint with unmergeable partials; resume with the " +
            "original config or rebuild from a fresh dir")
        }
        val recorded = ck.select(col("salt_scheme")).distinct()
          .collect().map(_.getString(0))
        require(recorded.length == 1,
          s"checkpoint at $checkpointDir mixes salt schemes: ${recorded.mkString(" | ")}")
        parseScheme(recorded.head)
      case Some(_) =>
        throw new IllegalStateException(
          s"checkpoint at $checkpointDir predates salt-scheme tracking — " +
          "its shard assignment cannot be reproduced safely; rebuild it " +
          "from scratch (delete the checkpoint dir)")
      case None => deriveScheme(input, cfg)
    }
    val salt = saltExprFor(scheme._1, scheme._2)
    val remaining = existing match {
      case None => observed
      case Some(ck) =>
        // null-safe keys: a NULL source forms a legitimate shard, but an
        // equi anti-join never matches null == null, so its partial would
        // be re-appended (and double-counted) on EVERY resume
        val done = ck.select(col("source").as("done_source"),
          col("salt").as("done_salt")).distinct()
        observed
          .withColumn("salt", salt)
          .join(broadcast(done),
            col("source") <=> col("done_source") &&
              col("salt") <=> col("done_salt"), "left_anti")
          .drop("salt")
    }

    // unconditional append: probing emptiness first (remaining.take(1))
    // costs a second full anti-join scan of the input; an empty append
    // writes no data files and the visible-entry guard above ignores its
    // _SUCCESS marker
    buildPartials(remaining, cfg, Some(scheme))
      .write.mode(SaveMode.Append).partitionBy("salt").parquet(checkpointDir)

    // a build over an EMPTY input writes no data files — whether the dir
    // does not exist (PATH_NOT_FOUND), was pre-created by ops (UNABLE_TO_
    // INFER_SCHEMA on a dir with no data files), or holds only the empty
    // append's _SUCCESS marker — a scheduled build on a zero-row day must
    // return an empty result, not crash
    val partials =
      try spark.read.parquet(checkpointDir)
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("PATH_NOT_FOUND") ||
              e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") =>
          return spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("source",
                org.apache.spark.sql.types.StringType),
              org.apache.spark.sql.types.StructField("sketch_bytes",
                org.apache.spark.sql.types.BinaryType),
              org.apache.spark.sql.types.StructField("n_rows",
                org.apache.spark.sql.types.LongType),
              org.apache.spark.sql.types.StructField("n_tokens",
                org.apache.spark.sql.types.LongType))))
      }
    // Concurrent resumes (operator retry, overlapping cron) can append
    // the same shard twice: identical re-appends (same input_hash over
    // the same rows) dedupe to one harmlessly; a shard appearing with
    // DIVERGING hashes means the input changed between appends and the
    // merged counts would be silently wrong — reject loudly.
    val uniq = partials.dropDuplicates("source", "salt", "input_hash")
    val conflicted = uniq.groupBy(col("source"), col("salt"))
      .agg(count(lit(1)).as("n")).where(col("n") > 1)
      .select(col("source"), col("salt")).take(5)
    require(conflicted.isEmpty,
      s"checkpoint at $checkpointDir holds shards with DIVERGING input " +
      s"hashes (input changed between appends?): ${conflicted.mkString(", ")} — " +
      "the merged counts would silently double; rebuild from a fresh dir")
    uniq.groupBy(col("source"))
      .agg(
        mergeAgg(cfg, col("sketch_bytes")).as("sketch_bytes"),
        sum(col("n_rows")).as("n_rows"),
        sum(col("n_tokens")).as("n_tokens"))
  }
}
