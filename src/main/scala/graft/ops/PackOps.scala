package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM training-data preparation: assign documents
  * (with lengths measured in tokens) to fixed-length training sequences
  * by the concat-and-chunk rule — documents are laid end-to-end in a
  * deterministic order and the token stream is chopped every `seqLen`
  * tokens, so a document may straddle two (or, if longer than `seqLen`,
  * span many) sequences. This is the packing rule of GPT-style
  * pretraining loaders, lifted to a declarative Spark plan.
  *
  * Layout is PER SHARD: documents are first bucketed by
  * [[SplitOps.hashBucket]] (the library's Wang mix — balanced even when
  * ids are clustered), then ordered by id within the shard, and each
  * shard packs its own independent token stream. Shards are the
  * parallelism unit: at 100 TB you pick `nShards` ~ O(cluster cores)
  * and every shard's window sort is a bounded, spillable partition —
  * there is no global order and therefore no global bottleneck. The
  * whole operator is ONE shuffle (the window's hash partitioning by
  * shard); the span explode and every offset computation are map-side,
  * and a downstream `groupBy(shard, seq)` reuses the same partitioning
  * (shard alone clusters it), adding NO second exchange.
  *
  * Determinism contract: `id` must be UNIQUE — duplicate ids make the
  * within-shard order (hence every later document's offsets) ambiguous,
  * so they REJECT loudly in-plan (an adjacent-key lag over the same
  * window sort) — and the packing is a pure function of the (id, nTokens)
  * set: reproducible across runs, partitionings, and engines (the gate
  * oracle replays shard hash, cumulative offsets, and span arithmetic
  * in DuckDB integer SQL, bit-for-bit). It is NOT append-stable —
  * appending documents shifts later offsets within a shard by
  * construction (packing is an ordered layout, unlike the pure-hash
  * decisions in [[SplitOps]]) — so pack per corpus SNAPSHOT, after
  * dedup/filtering/mixing have fixed the membership.
  *
  * Offsets are exact 64-bit integer arithmetic end to end (integral
  * `div`, never a double), so shard token streams larger than 2^53 —
  * petatoken shards — cannot silently round an offset.
  */
object PackOps {

  /** One output row per (document, training sequence) span:
    *
    *   - `doc_key`  — the document id (the caller's `id` column)
    *   - `shard`    — hash shard in [0, nShards)
    *   - `seq`      — sequence index within the shard (0-based)
    *   - `doc_from` — first token of this span, as an offset INTO THE
    *                  DOCUMENT (0-based)
    *   - `seq_from` — where the span starts INSIDE the sequence
    *   - `span_toks`— tokens this document contributes to this sequence
    *
    * Every document with n > 0 tokens appears in ceil-adjacent spans
    * covering exactly its n tokens; every sequence holds exactly
    * `seqLen` tokens except the last of each shard. Zero-token
    * documents occupy no span and are dropped (there is nothing to
    * pack); null or negative token counts REJECT loudly — inside the
    * running sum a null acts as 0 and would silently shift every later
    * document's offsets in the shard, which is the worst failure mode
    * (wrong training data, no error).
    *
    * A document of T tokens explodes into ceil(T/seqLen) span rows via
    * one `sequence()` array — bounded by the longest single document,
    * not the corpus (a 1 G-token outlier at seqLen 2048 materializes a
    * ~500k-element index array once; cap document length upstream if
    * such outliers are possible).
    */
  def packSpans(docs: DataFrame, id: Column, nTokens: Column,
      seqLen: Long, nShards: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val L = lit(seqLen)
    // assert_true is null when the predicate holds, so the when() is the
    // identity on valid counts and a runtime error otherwise (the same
    // loud-rejection shape as SplitOps' null-key guard)
    val checkedN = when(
      assert_true(nTokens.isNotNull && nTokens >= 0,
        lit("PackOps: token count must be non-null and >= 0 — a null or " +
          "negative count would silently corrupt every later document's " +
          "sequence offsets in its shard")).isNull,
      nTokens.cast("long"))
    val base = docs.select(
      id.as("doc_key"),
      checkedN.as("n_toks"),
      SplitOps.hashBucket(id, nShards).as("shard"))
    // cumulative token offset of each document within its shard; the
    // empty frame on the first row sums to null -> 0. Zero-token docs
    // are dropped AFTER the window (they contribute 0 to it either way,
    // and filtering first would cost nothing but prove nothing).
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_key"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // duplicate ids REJECT loudly, like null counts: duplicates sort
    // adjacent, so a lag catches every one — a duplicate would make the
    // within-shard order (hence every later offset) ambiguous, the same
    // silent-corruption class the docstring bans, and documentation
    // alone was not enforcement. Same partitioning AND ordering as the
    // offset sum, so CollapseWindow fuses both into one Window node
    // (PlanGuardSpec pins 1 exchange / 1 Window still)
    val wLag = Window.partitionBy(col("shard")).orderBy(col("doc_key"))
    val withStart = base
      .withColumn("tok_start", coalesce(sum(col("n_toks")).over(w), lit(0L)))
      .withColumn("_prev_key", lag(col("doc_key"), 1).over(wLag))
      .where(assert_true(
        col("_prev_key").isNull || col("_prev_key") =!= col("doc_key"),
        lit("PackOps: duplicate id — packing order (hence every later " +
          "document's sequence offsets in the shard) is ambiguous under " +
          "duplicate ids; deduplicate or choose a unique key")).isNull)
      .drop("_prev_key")
      .where(col("n_toks") > 0)
    // exact integral division (SQL div = IntegralDivide): floor since
    // every operand here is non-negative
    def idiv(a: Column, b: Column) = call_function("div", a, b)
    val firstSeq = idiv(col("tok_start"), L)
    val lastSeq = idiv(col("tok_start") + col("n_toks") - 1, L)
    val spanStart = greatest(col("tok_start"), col("seq") * L)
    withStart
      .select(col("doc_key"), col("shard"), col("n_toks"), col("tok_start"),
        explode(sequence(firstSeq, lastSeq)).as("seq"))
      .select(
        col("doc_key"), col("shard"), col("seq"),
        (spanStart - col("tok_start")).as("doc_from"),
        (spanStart - col("seq") * L).as("seq_from"),
        (least(col("tok_start") + col("n_toks"), (col("seq") + 1) * L)
          - spanStart).as("span_toks"))
  }

  /** Per-sequence packing summary — one row per training sequence:
    * document count, filled tokens (== seqLen except each shard's last
    * sequence), and a bit-xor checksum of contributing doc ids. Same
    * single exchange as [[packSpans]] (the groupBy reuses the window's
    * shard partitioning). */
  def packSummary(docs: DataFrame, id: Column, nTokens: Column,
      seqLen: Long, nShards: Int): DataFrame =
    packSpans(docs, id, nTokens, seqLen, nShards)
      .groupBy(col("shard"), col("seq"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("span_toks")).as("n_tokens"),
        expr("bit_xor(doc_key)").as("id_checksum"))
}
