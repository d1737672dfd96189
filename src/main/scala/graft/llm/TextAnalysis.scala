package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * tokenization, language ID, quality scoring, fingerprinting.
  *
  * All pure Column expressions over Spark's higher-order array functions —
  * no UDFs, so the whole stage stays codegen'd and scales per-row with no
  * shuffle. Integer-valued outputs by design so results are engine-exact
  * (DuckDB-oracle-comparable).
  */
object TextAnalysis {

  /** Lowercased alphanumeric tokens; empty fragments dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), x => x =!= "")

  def tokenCount(toks: Column): Column = size(toks).cast("long")

  def distinctTokenCount(toks: Column): Column = size(array_distinct(toks)).cast("long")

  /** Count of DISTINCT stopwords present (set intersection — order-free,
    * so the same value in any engine).
    */
  def stopwordCount(toks: Column, stopwords: Seq[String]): Column =
    size(array_intersect(toks, array(stopwords.map(lit): _*))).cast("long")

  /** Tiny per-language stopword inventories for the n-gram-free heuristic
    * language ID. Deliberately small: the operator's job is the *shape*
    * (per-row scoring + argmax), not lexicography.
    */
  val EnStop: Seq[String] = Seq("the", "and", "of", "to", "in", "is", "a", "that", "for", "on")
  val FrStop: Seq[String] = Seq("le", "la", "les", "et", "de", "des", "un", "une", "du", "en")
  val DeStop: Seq[String] = Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "zu", "den")

  /** Heuristic language guess: argmax of stopword-set overlap with a fixed
    * tie order (en ≥ fr ≥ de) so the result is total and deterministic.
    */
  def langGuess(toks: Column): Column = {
    val en = stopwordCount(toks, EnStop)
    val fr = stopwordCount(toks, FrStop)
    val de = stopwordCount(toks, DeStop)
    when(en >= fr && en >= de, lit("en"))
      .when(fr >= de, lit("fr"))
      .otherwise(lit("de"))
  }

  /** Normalization fingerprint: hash of the canonical (lowercased,
    * punctuation-stripped, single-spaced) token stream — two documents
    * differing only in case/punctuation/whitespace collide.
    */
  def fingerprint(toks: Column): Column = md5(concat_ws(" ", toks))

  /** GPT-2-style pre-tokenizer regex ("BPE-ish"): contraction suffixes,
    * space-prefixed letter runs, digit runs, punctuation runs — the
    * standard shape for estimating subword token counts without a merges
    * table. Plain alternation only, so Java (Spark codegen) and RE2
    * (DuckDB oracle) agree byte-for-byte.
    */
  val BpePattern: String = "'s|'t|'re|'ve|'m|'ll|'d| ?[a-z]+| ?[0-9]+| ?[^ a-z0-9]+"

  /** BPE-ish token pieces of the lowercased text (bare spaces between
    * matches are skipped, as in the GPT-2 pre-tokenizer).
    */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit(BpePattern), lit(0))

  def bpeTokenCount(text: Column): Column = size(bpeTokens(text)).cast("long")

  /** Rabin-Karp rolling hash of a token stream: fold
    * `acc -> (acc * B + h32(tok)) mod P` left-to-right. Unlike
    * [[fingerprint]] (one opaque md5 of the whole stream) the polynomial
    * structure makes it incrementally maintainable — append a token in
    * O(1), slide a fixed-size window by subtracting `h·B^(w-1)` — the
    * classic chunk fingerprint for streaming dedup. Arithmetic stays
    * under 2^63: acc < P ≈ 2^31, B ≈ 2^20, h32%P < 2^31.
    */
  val RollB: Long = 1000003L
  def rollingHash(toks: Column): Column =
    // element hashes pre-reduced mod P so an init-less fold (DuckDB
    // list_reduce starts from the first ELEMENT) matches this init-0 fold
    aggregate(transform(toks, t => Dedup.hash32(t) % Dedup.P), lit(0L),
      (acc, h) => (acc * RollB + h) % Dedup.P)

  /** Cheap quality gate: enough tokens, not absurdly many, and at least
    * one known stopword (pure symbol soup fails).
    */
  def isQuality(nToks: Column, nStop: Column, minTokens: Int = 5, maxTokens: Int = 5000): Column =
    nToks >= minTokens && nToks <= maxTokens && nStop >= 1
}
