package graft.ops

import graft.sketch.WangHash
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, and document fingerprints.
  *
  * All column builders are pure `functions._` compositions (codegen'd,
  * explode-free) so they run inside WholeStageCodegen at 100 TB scale; only
  * language-ID and the rolling fingerprint are custom expressions (a table
  * lookup and a stateful hash that SQL cannot express cleanly).
  */
object TextOps {

  /** Round-robin rebalance a frame whose scan carries fewer splits than
    * the cluster has slots (optimization guide §2.5: an unsplittable
    * single-file/single-row-group input scans as ONE task, serializing
    * every map-side expression pass no matter the core count). A no-op
    * — no exchange added — whenever the scan already has >= slots
    * partitions, i.e. on any production-scale input; deterministic
    * under retries (sortBeforeRepartition) and result-invariant for
    * the partitioning-insensitive operators of this library. Reserve
    * it for EXPRESSION-HEAVY map sides: for cheap partial aggregations
    * the in-scan-stage partial agg beats shuffling raw rows (measured
    * round 7). */
  def rebalanced(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val slots = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < slots) df.repartition(slots) else df
  }

  /** Whitespace tokens of trimmed text; empty text gives an empty array.
    * Matches DuckDB `regexp_split_to_array(trim(text), '\s+')`. */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast(ArrayType(StringType)))
      .otherwise(split(trim(text), "\\s+"))

  /** Token count without materializing the array downstream. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: words plus punctuation/digit runs counted
    * separately (a cheap proxy for byte-pair tokenizers). Empty /
    * whitespace-only text counts 0 (split of "" yields [""], which
    * would otherwise credit one phantom token — tokens() guards the
    * same edge). */
  def bpeishTokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0)).otherwise(
      size(split(trim(text), "\\s+")) +
        size(split(text, "[0-9]+")) - lit(1) +
        size(split(text, "[^\\w\\s]+")) - lit(1))

  /** Word-level k-shingles: contiguous k-word windows joined by a space.
    * Explode-free (higher-order functions over the token array). */
  def wordShingles(text: Column, k: Int): Column = {
    require(k > 0, s"k must be positive, got $k")
    // single-pass expression over the token array. The declarative form
    // this replaced — transform(sequence(...), i -> concat_ws(slice(toks,
    // i, k))) — referenced `toks` (the SPLIT expression) inside the
    // lambda, and lambda bodies re-evaluate their subtrees per element:
    // the tokenizer ran once per shingle index, O(n²) chars per doc
    // (measured 3.5 s to shingle a 5k-doc corpus; <0.3 s fixed)
    toColumn(WordShinglesExpr(expression(tokens(text)), k))
  }

  /** Integer-exact quality metrics (permille where fractional) so results
    * reproduce bit-identically in any engine:
    * n_words, n_distinct_words, stopword permille, distinct-word permille,
    * mean word length permille. */
  def qualityMetrics(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val nWords = size(toks)
    val nDistinct = size(array_distinct(toks))
    val stopHits = size(filter(toks, t => t.isin(Stopwords.map(lit(_)): _*)))
    val charSum = aggregate(toks, lit(0), (acc, t) => acc + length(t))
    Seq(
      "n_words" -> nWords,
      "n_distinct_words" -> nDistinct,
      "stopword_permille" ->
        when(nWords === 0, 0).otherwise((stopHits * 1000L).cast(LongType) / nWords).cast(LongType),
      "distinct_permille" ->
        when(nWords === 0, 0).otherwise((nDistinct * 1000L).cast(LongType) / nWords).cast(LongType),
      "mean_word_len_permille" ->
        when(nWords === 0, 0).otherwise((charSum * 1000L).cast(LongType) / nWords).cast(LongType)
    )
  }

  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "to", "and", "in", "is", "it", "that")

  /** Heuristic language ID over a small per-language marker-word table. */
  def langId(text: Column): Column = toColumn(LangIdExpr(expression(text)))

  /** Gopher-style repetition quality signals (Rae et al. 2021 §A1.1 —
    * the published repetition filters of a web-scale training corpus),
    * integer-permille exact like [[qualityMetrics]]:
    *
    *   - `n_lines`              — non-empty lines
    *   - `dup_line_permille`    — repeated line occurrences (beyond each
    *                              line's first) per 1000 lines
    *   - `dup_line_char_permille` — characters in those repeated
    *                              occurrences per 1000 line characters
    *   - `n_bigrams`            — word 2-grams (whitespace tokens)
    *   - `top_bigram_permille`  — occurrences of the most frequent
    *                              2-gram per 1000 2-grams
    *
    * High values flag boilerplate/spam (nav bars, keyword stuffing,
    * templated listings) that exact/near dedup misses because the
    * repetition is WITHIN the document. One pass, one expression, no
    * shuffle: [[RepetitionStatsExpr]] computes all five counters per
    * row ([[langId]]-style single-pass hash maps), so the operator is
    * map-only at any scale — the alternative explode-lines + groupBy
    * shape would shuffle every line of a 100 TB corpus. Character
    * counts are Unicode code points (matching engine-independent
    * `length()` semantics, not JVM UTF-16 units). */
  def repetitionMetrics(text: Column): Seq[(String, Column)] = {
    val st = toColumn(RepetitionStatsExpr(expression(text)))
    // integral `div` (the oracle's `//`), not double Divide + cast: the
    // double detour is exact only while num*1000 < 2^53 — `div` makes the
    // integer-permille claim structural rather than magnitude-dependent
    def permille(num: Column, den: Column): Column =
      when(den === 0, 0L)
        .otherwise(call_function("div", (num * 1000L).cast(LongType), den))
        .cast(LongType)
    Seq(
      "n_lines" -> st.getField("n_lines"),
      "dup_line_permille" ->
        permille(st.getField("n_dup_lines"), st.getField("n_lines")),
      "dup_line_char_permille" ->
        permille(st.getField("dup_chars"), st.getField("total_chars")),
      "n_bigrams" -> st.getField("n_bigrams"),
      "top_bigram_permille" ->
        permille(st.getField("top_bigram_n"), st.getField("n_bigrams"))
    )
  }

  /** 64-bit rolling polynomial fingerprint of the text (content-defined,
    * whitespace-normalized) — the document-level identity hash for exact
    * dedup at scale (cheaper to shuffle than the text itself). */
  def fingerprint(text: Column): Column = toColumn(RollingFingerprint(expression(text)))

  private[graft] def expression(c: Column): Expression =
    org.apache.spark.sql.graftbridge.GraftBridge.expression(c)
  private[graft] def toColumn(e: Expression): Column =
    org.apache.spark.sql.graftbridge.GraftBridge.column(e)
}

/** Marker-word language ID: counts hits per language, returns the argmax
  * (ties → lexicographically first language), "und" when no hits. */
case class LangIdExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "lang_id"
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = {
    // Locale.ROOT: default-locale lowercasing makes the answer depend on
    // the executor JVM's locale (tr_TR maps I to dotless ı, so "DIE"/"IST"
    // never hit the de markers) — same doc, different language per cluster
    val words = v.asInstanceOf[UTF8String].toString
      .toLowerCase(java.util.Locale.ROOT).split("\\s+")
    val hits = new java.util.HashMap[String, Integer]()
    var i = 0
    while (i < words.length) {
      val lang = LangIdExpr.markers.get(words(i))
      if (lang != null) hits.merge(lang, 1, (a, b) => a + b)
      i += 1
    }
    if (hits.isEmpty) UTF8String.fromString("und")
    else {
      var best: String = null
      var bestN = -1
      hits.forEach { (lang, n) =>
        if (n > bestN || (n == bestN && lang < best)) { best = lang; bestN = n }
      }
      UTF8String.fromString(best)
    }
  }
  override protected def withNewChildInternal(c: Expression): LangIdExpr = copy(child = c)
}

object LangIdExpr {
  /** Tiny marker lexicon (public common words). The per-language lists
    * are deliberately DISJOINT — an ambiguous marker (e.g. 'la' in both
    * es and fr) would make the winning language depend on map insertion
    * order, which is neither meaningful nor reproducible by an external
    * oracle. */
  private[ops] val table: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "with", "for"),
    "es" -> Seq("el", "los", "las", "por", "una", "como", "pero", "sus"),
    "fr" -> Seq("le", "les", "des", "est", "dans", "pour", "avec", "sur"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "他", "这")
  )
  private[ops] val markers: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String]()
    table.foreach { case (lang, words) => words.foreach { w =>
      val prev = m.put(w, lang)
      require(prev == null, s"ambiguous lang marker '$w': $prev vs $lang")
    } }
    m
  }
}

/** Rolling 64-bit polynomial hash over whitespace-normalized tokens:
  * fp = fold(tokens)(h -> h*P + mix(token)). Order-sensitive (unlike a
  * bag-of-words hash) so shuffled near-dups get different prints. */
case class RollingFingerprint(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "rolling_fingerprint"
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any = {
    val words = v.asInstanceOf[UTF8String].toString.trim.split("\\s+")
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < words.length) {
      h = h * 0x100000001b3L + WangHash.mixBytes(words(i).getBytes("UTF-8"), 0x9e3779b9L)
      i += 1
    }
    h
  }
  override protected def withNewChildInternal(c: Expression): RollingFingerprint =
    copy(child = c)
}

/** k-word shingles of a token array, each joined with a single space —
  * semantically identical to `transform(sequence(1, n-k+1), i ->
  * concat_ws(" ", slice(toks, i, k)))` (the form it replaced), but the
  * token array is evaluated ONCE per row and the shingle loop is linear
  * (null elements skipped exactly as concat_ws skips them; n < k yields
  * the empty array; null input yields null). */
case class WordShinglesExpr(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "word_shingles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  private val sep = UTF8String.fromString(" ")
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = arr.numElements()
    if (n < k) new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    else {
      val toks = new Array[UTF8String](n)
      var i = 0
      while (i < n) {
        toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
        i += 1
      }
      val win = new Array[UTF8String](k)
      val out = new Array[Any](n - k + 1)
      var s = 0
      while (s + k <= n) {
        var j = 0
        while (j < k) { win(j) = toks(s + j); j += 1 }
        out(s) = UTF8String.concatWs(sep, win: _*)
        s += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }
  override protected def withNewChildInternal(c: Expression): WordShinglesExpr =
    copy(child = c)
}

/** One-pass repetition counters for [[TextOps.repetitionMetrics]]:
  * line-occurrence and word-2-gram hash maps built in a single scan of
  * the text, returned as a struct of exact long counters (the permille
  * arithmetic lives in the column builders so the counters stay
  * engine-replayable integers).
  *
  * Definitions (pinned by the gate oracle's DuckDB replay):
  *   - lines = text split on '\n', EMPTY LINES DROPPED (blank-line
  *     runs are formatting, not content repetition);
  *   - a line's k-th occurrence for k >= 2 is a duplicate occurrence:
  *     n_dup_lines = sum over distinct values of (count - 1), and
  *     dup_chars counts those occurrences' code points;
  *   - 2-grams come from whitespace tokens of the WHOLE text (grams
  *     cross line boundaries — tokenization is line-agnostic, matching
  *     [[TextOps.tokens]]).
  */
case class RepetitionStatsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "repetition_stats"
  override def dataType: DataType = StructType(Seq(
    StructField("n_lines", LongType, nullable = false),
    StructField("n_dup_lines", LongType, nullable = false),
    StructField("dup_chars", LongType, nullable = false),
    StructField("total_chars", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("top_bigram_n", LongType, nullable = false)))

  override def nullSafeEval(v: Any): Any = {
    val text = v.asInstanceOf[UTF8String].toString
    // lines: single pass over occurrences; a value seen before counts as
    // a duplicate occurrence and its code points as duplicate characters
    var nLines = 0L; var nDup = 0L; var dupChars = 0L; var totalChars = 0L
    val seen = new java.util.HashMap[String, Integer]()
    var from = 0
    while (from <= text.length) {
      val nl = text.indexOf('\n', from)
      val end = if (nl < 0) text.length else nl
      if (end > from) {
        val line = text.substring(from, end)
        val cp = line.codePointCount(0, line.length).toLong
        nLines += 1; totalChars += cp
        if (seen.merge(line, 1, (a, b) => a + b) > 1) {
          nDup += 1; dupChars += cp
        }
      }
      from = end + 1
    }
    // word 2-grams over whitespace tokens of the whole text, replicating
    // the tokens() convention exactly: SQL trim strips SPACES only (not
    // Java trim's all-whitespace), and SQL split keeps trailing empty
    // tokens (Java's default split drops them) — both engines agree on
    // that composition, so the expression must too
    var nBigrams = 0L; var topN = 0L
    var lo = 0; var hi = text.length
    while (lo < hi && text.charAt(lo) == ' ') lo += 1
    while (hi > lo && text.charAt(hi - 1) == ' ') hi -= 1
    val toks = text.substring(lo, hi).split("\\s+", -1)
    if (toks.length >= 2) {
      val grams = new java.util.HashMap[String, Integer]()
      var i = 0
      while (i < toks.length - 1) {
        val n = grams.merge(toks(i) + " " + toks(i + 1), 1, (a, b) => a + b)
        if (n.toLong > topN) topN = n.toLong
        i += 1
        nBigrams += 1
      }
    }
    org.apache.spark.sql.catalyst.InternalRow(
      nLines, nDup, dupChars, totalChars, nBigrams, topN)
  }
  override protected def withNewChildInternal(c: Expression): RepetitionStatsExpr =
    copy(child = c)
}
