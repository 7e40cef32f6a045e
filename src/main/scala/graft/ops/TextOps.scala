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
    val toks = tokens(text)
    when(size(toks) < k, array().cast(ArrayType(StringType)))
      .otherwise(
        transform(sequence(lit(1), size(toks) - lit(k - 1)),
          i => concat_ws(" ", slice(toks, i, lit(k)))))
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
