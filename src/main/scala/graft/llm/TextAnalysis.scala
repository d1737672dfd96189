package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
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
  val RollB: Long = graft.functions.WindowRollHash.B

  /** Per-token hashes pre-reduced mod P — the element stream the
    * whole-document fold AND the windowed chunk fingerprints consume
    * (pre-reduction makes DuckDB's init-less `list_reduce` equal the
    * init-0 fold).
    */
  def tokenHashes(toks: Column): Column =
    transform(toks, t => Dedup.hash32(t) % Dedup.P)

  def rollingHash(toks: Column): Column =
    aggregate(tokenHashes(toks), lit(0L),
      (acc, h) => (acc * RollB + h) % Dedup.P)

  /** Sliding-window chunk fingerprints: the rolling hash of every
    * `w`-token window at stride 1 (documents shorter than w collapse to
    * one whole-stream hash) — computed by the native O(1)-slide
    * [[graft.functions.WindowRollHash]] expression, O(n) per document
    * instead of the O(n·w) per-window refold. The cross-document
    * chunk-dedup operators build on this ([[Dedup.chunkMatchPairs]]).
    * `toks` should be a materialized attribute.
    */
  def windowHashes(toks: Column, w: Int): Column =
    graft.functions.WindowRollHash(tokenHashes(toks), w)

  /** Cheap quality gate: enough tokens, not absurdly many, and at least
    * one known stopword (pure symbol soup fails).
    */
  def isQuality(nToks: Column, nStop: Column, minTokens: Int = 5, maxTokens: Int = 5000): Column =
    nToks >= minTokens && nToks <= maxTokens && nStop >= 1

  /** Ratio in basis points (0-10000), integer-exact across engines:
    * floor(num * 10000 / den), 0 when the denominator is 0. Exact under
    * double floor for any corpus-realistic sizes (< 2^53).
    */
  def basisPoints(num: Column, den: Column): Column =
    when(den === 0, lit(0L))
      .otherwise(floor(num * 10000 / den).cast("long"))

  /** Per-document quality profile with the standard ratio features:
    * character/punctuation counts, punctuation ratio, stopword ratio
    * (all integer/basis-point valued — deterministic), plus the boolean
    * gate. `text` must be the raw text column; `toks` its materialized
    * token array.
    */
  def qualityProfile(text: Column, toks: Column): Seq[Column] = {
    val nChars = length(text).cast("long")
    val nPunct = (nChars - length(regexp_replace(text, "[^a-zA-Z0-9 ]", ""))).cast("long")
    val nToks = tokenCount(toks)
    val nStop = stopwordCount(toks, EnStop)
    Seq(
      nChars.as("n_chars"),
      nPunct.as("n_punct"),
      basisPoints(nPunct, nChars).as("punct_bp"),
      basisPoints(nStop, nToks).as("stop_bp"),
      isQuality(nToks, nStop).as("is_quality"))
  }

  /** Repetition profile over a materialized shingle column (Gopher/C4-
    * style duplicate-n-gram filter features): total and distinct shingle
    * counts plus the repeated fraction in basis points — a high `rep_bp`
    * marks boilerplate/looping text for the quality gate.
    */
  /** The repeated-shingle fraction in basis points — THE definition of
    * rep_bp; [[repetitionStats]] (q50) and the curation gate both call
    * this, so the formula lives in exactly one place.
    */
  def repBp(sh: Column): Column = {
    val n = size(sh).cast("long")
    basisPoints(n - size(array_distinct(sh)).cast("long"), n)
  }

  def repetitionStats(sh: Column): Seq[Column] =
    Seq(size(sh).cast("long").as("n_3grams"),
      size(array_distinct(sh)).cast("long").as("n_distinct_3grams"),
      repBp(sh).as("rep_bp"))

  /** PII-style scrubbing patterns: plain alternation-free regexes over
    * EXPLICIT ASCII classes, so Java (Spark codegen) and RE2 (DuckDB
    * oracle) agree byte-for-byte. Case-insensitivity is spelled
    * `[a-zA-Z]`, never the inline `(?i)` flag: Java folds `(?i)[a-z]`
    * ASCII-only while RE2 folds Unicode (U+212A KELVIN SIGN matches), so
    * the flag is only parity-safe for ASCII text — the explicit classes
    * are engine-neutral for ALL input. The ORIGINAL text is scanned
    * (never lowercased: a redacted stream retained as corpus text must
    * keep its case). Order: emails first (they contain digits), then
    * dotted IPv4s, then long digit runs (7+, the account/phone-number
    * shape — IPv4 octets are too short to double-match).
    */
  val EmailRe: String =
    "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val Ipv4Re: String = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  val LongDigitsRe: String = "[0-9]{7,}"

  /** Redacted text: each PII match replaced by its typed tag, all other
    * characters (and their case) untouched. The per-document match
    * counts ([[redactionCounts]]) plus the redacted stream are what a
    * curation job keeps; scrubbing is pure per-row regexp work —
    * codegen'd, shuffle-free, linear at any corpus size.
    */
  def redact(text: Column): Column = {
    val e = regexp_replace(text, EmailRe, "<email>")
    val i = regexp_replace(e, Ipv4Re, "<ip>")
    regexp_replace(i, LongDigitsRe, "<num>")
  }

  /** (n_emails, n_ips, n_longnums) of the text, counted on the same
    * cascade order as [[redact]] (IPs counted after emails are removed,
    * digit runs after both).
    */
  def redactionCounts(text: Column): Seq[Column] = {
    val e = regexp_replace(text, EmailRe, "<email>")
    val i = regexp_replace(e, Ipv4Re, "<ip>")
    Seq(
      size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(e, lit(Ipv4Re), lit(0))).cast("long").as("n_ips"),
      size(regexp_extract_all(i, lit(LongDigitsRe), lit(0))).cast("long").as("n_longnums"))
  }

  /** Characteristic character trigrams (over the canonical single-spaced
    * stream, so word-boundary trigrams like "he " count) for the n-gram
    * language-ID heuristic — the profile-overlap method, kept tiny like
    * the stopword inventories: the operator is the shape, not the model.
    */
  val EnTri: Seq[String] = Seq("the", "he ", " th", "ing", "and", " an", "ed ")
  val FrTri: Seq[String] = Seq("le ", " de", "es ", " la", "ent", " le", "de ")
  val DeTri: Seq[String] = Seq("der", "ie ", "sch", " di", "und", "ein", "cht")

  /** N-gram-heuristic language guess: argmax of trigram-profile overlap
    * with the same fixed tie order as [[langGuess]] (en ≥ fr ≥ de).
    *
    * Implemented as `contains(norm, trigram)` per inventory entry —
    * value-identical to materializing the document's distinct-trigram
    * set and intersecting (both count the inventory grams present), but
    * ~|inventory| substring scans per document instead of ~|doc| gram
    * allocations.
    */
  def langGuessNgram(norm: Column): Column = {
    def overlap(inv: Seq[String]): Column =
      inv.map(t => when(norm.contains(lit(t)), 1L).otherwise(0L)).reduce(_ + _)
    val en = overlap(EnTri); val fr = overlap(FrTri); val de = overlap(DeTri)
    when(en >= fr && en >= de, lit("en"))
      .when(fr >= de, lit("fr"))
      .otherwise(lit("de"))
  }

  /** C4-style line-level cleaning (Raffel et al. 2020's heuristics):
    * keep a line only if it has ≥ 3 tokens, ends in terminal
    * punctuation (`.` `!` `?` `"`), and contains no blocklisted
    * fragment; a document survives if ≥ 3 lines remain. Pure
    * higher-order Column ops — per-row, shuffle-free, codegen'd.
    */
  val C4Blocklist: Seq[String] = Seq("javascript", "lorem ipsum", "{")

  def c4KeepLine(ln: Column): Column = {
    val t = trim(ln)
    val lt = lower(t)
    size(tokens(t)) >= 3 &&
      substring(t, -1, 1).isin(".", "!", "?", "\"") &&
      C4Blocklist.map(b => !lt.contains(b)).reduce(_ && _)
  }

  /** The retained lines of a newline-separated document, in order. */
  def c4CleanedLines(text: Column): Column =
    filter(split(text, "\n"), ln => c4KeepLine(ln))

  /** Fixed-size token chunking with overlap — the context-window
    * splitter every RAG-indexing / long-document-training pipeline runs
    * before embedding or packing: chunk i covers tokens
    * `[i·stride, i·stride + size)` of the canonical token stream, where
    * `stride = size − overlap`; the tail chunk may be shorter; a
    * document shorter than one chunk yields exactly one. Chunk count is
    * `max(1, ⌈(n − overlap) / stride⌉)` — no start inside the previous
    * chunk's overlap tail, so every chunk contributes new tokens.
    *
    * Pure per-row explode (tokenize once behind a `once` barrier, slice
    * per chunk) — shuffle-free, codegen'd, linear in corpus tokens at
    * any scale. Tokenless documents yield no rows (mirrored by the
    * oracle), exactly like [[graft.llm.Dedup.chunkTable]].
    *
    * @return (id, chunk_idx, n_tokens, chunk_text) — one row per chunk,
    *   chunk_text the space-joined canonical tokens
    */
  def tokenChunks(docs: DataFrame, idCol: String, textCol: String,
      size: Int, overlap: Int): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      "need size > 0 and 0 <= overlap < size")
    val stride = size - overlap
    val base = graft.llm.Dedup.once(
        docs.select(col(idCol).as("id"), col(textCol).as("__text")),
        "__toks", tokens(col("__text")))
      .filter(org.apache.spark.sql.functions.size(col("__toks")) > 0)
    // integer div (never `/`: Column division routes through double)
    val nChunks = greatest(
      expr(s"(size(__toks) - $overlap + ${stride - 1}) div $stride"), lit(1L))
    base
      .select(col("id"), col("__toks"),
        explode(sequence(lit(0L), nChunks - 1)).as("chunk_idx"))
      .select(col("id"), col("chunk_idx"),
        slice(col("__toks"), (col("chunk_idx") * stride + 1).cast("int"),
          lit(size)).as("__sl"))
      .select(col("id"), col("chunk_idx"),
        org.apache.spark.sql.functions.size(col("__sl")).cast("long").as("n_tokens"),
        array_join(col("__sl"), " ").as("chunk_text"))
  }

  // ------------------------------------------------------------- HTML

  /** Case-insensitive literal spelled as explicit `[cC]` classes — the
    * engine-neutral form (see the `(?i)` note on the PII patterns).
    */
  private def ci(word: String): String =
    word.map(c => s"[${c.toLower}${c.toUpper}]").mkString

  /** WET-style HTML-to-text extraction patterns. Engine-neutral subset
    * only: explicit classes, non-greedy quantifiers, and a leading
    * `(?s)` — all of which Java (Spark codegen) and RE2 (DuckDB oracle)
    * implement with identical leftmost-shortest semantics; no
    * lookaround (RE2 has none) and no inline `(?i)`.
    */
  val ScriptRe: String = s"(?s)<${ci("script")}[^>]*>.*?</${ci("script")}[ \\t\\r\\n]*>"
  val StyleRe: String = s"(?s)<${ci("style")}[^>]*>.*?</${ci("style")}[ \\t\\r\\n]*>"
  val HtmlCommentRe: String = "(?s)<!--.*?-->"
  val TagRe: String = "<[^>]*>"
  val WsRunRe: String = "[ \\t\\r\\n]+"

  /** The five entities every extractor must decode (the XML set plus
    * nbsp), decoded AFTER tag stripping, `&amp;` strictly last so
    * double-escaped input unescapes one level, as a real extractor does.
    */
  val HtmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&nbsp;" -> " ", "&amp;" -> "&")

  /** HTML/boilerplate-to-text extraction (the WET step of a web-corpus
    * pipeline): drop script/style/comment blocks wholesale, strip the
    * remaining tags, decode the core entities, collapse whitespace runs,
    * trim. Pure per-row string work — codegen'd, shuffle-free, linear at
    * any corpus size; the heavy regexes run once per document, never per
    * token. This feeds [[c4CleanedLines]]/[[qualityProfile]], which
    * expect plain text.
    */
  def htmlToText(html: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(
        regexp_replace(html, ScriptRe, " "),
        StyleRe, " "),
      HtmlCommentRe, " ")
    val noTags = regexp_replace(noBlocks, TagRe, " ")
    val decoded = HtmlEntities.foldLeft(noTags) {
      case (c, (ent, ch)) => replace(c, lit(ent), lit(ch))
    }
    trim(regexp_replace(decoded, WsRunRe, " "))
  }

  /** Exact per-group value percentiles at HISTOGRAM cost — the corpus
    * length-distribution profile (p50/p90/p99 token counts per
    * language) a curation dashboard reads.
    *
    * Scale shape: the naive form (row_number over each group) sends
    * every row through as many window partitions as there are groups —
    * with 3 languages that is 3 tasks holding the corpus. Instead:
    * one map-side-combinable groupBy collapses rows to a
    * (group, value) histogram, and the window walks only the DISTINCT
    * values per group (thousands, not billions). p-th percentile =
    * the smallest value whose cumulative count reaches ceil(p·n/100)
    * — integer arithmetic only, engine-exact (percentile_disc
    * semantics).
    *
    * @return one row per group: (groupCol, n_rows, min_v, max_v, p<N>…)
    */
  def groupPercentiles(df: org.apache.spark.sql.DataFrame, groupCol: String,
      valueCol: String, pcts: Seq[Int] = Seq(50, 90, 99)): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100), "pcts in 1..100")
    val hist = df.groupBy(col(groupCol), col(valueCol).as("v"))
      .agg(count(lit(1)).as("cnt"))
    val h = hist
      .withColumn("cum", sum(col("cnt")).over(
        Window.partitionBy(col(groupCol)).orderBy(col("v"))))
      .withColumn("tot", sum(col("cnt")).over(Window.partitionBy(col(groupCol))))
    val aggs =
      Seq(max(col("tot")).as("n_rows"), min(col("v")).as("min_v"), max(col("v")).as("max_v")) ++
        pcts.map(p => min(when(col("cum") >= expr(s"(tot * $p + 99) div 100"), col("v"))).as(s"p$p"))
    h.groupBy(col(groupCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-group winsorization: clip `valueCol` into its group's
    * [loPct, hiPct] exact-percentile band — the outlier treatment a
    * stats/mixture pipeline applies before means and ratios (a single
    * 100 MB document otherwise owns its source's average length).
    * Clipping, not dropping: row count and keys are preserved, so
    * downstream joins and quotas are unaffected.
    *
    * Scale shape: bounds come from [[groupPercentiles]] (histogram at
    * DISTINCT-value cost, never a sort of the raw rows) and join back
    * as a groups-sized broadcast — the data pays one extra scan
    * projection, no shuffle.
    */
  def winsorize(df: org.apache.spark.sql.DataFrame, groupCol: String,
      valueCol: String, loPct: Int, hiPct: Int): org.apache.spark.sql.DataFrame = {
    require(1 <= loPct && loPct < hiPct && hiPct <= 100,
      s"need 1 <= loPct < hiPct <= 100, got ($loPct, $hiPct)")
    val bounds = groupPercentiles(df, groupCol, valueCol, Seq(loPct, hiPct))
      .select(col(groupCol), col(s"p$loPct").as("__lo"), col(s"p$hiPct").as("__hi"))
    df.join(broadcast(bounds), Seq(groupCol))
      .withColumn(s"${valueCol}_w",
        // greatest/least skip NULLs, so an unguarded NULL value in a
        // group with non-null bounds would read as the LOW bound — a
        // fabricated value. NULL in, NULL out.
        when(col(valueCol).isNull, lit(null))
          .otherwise(least(greatest(col(valueCol), col("__lo")), col("__hi"))))
      .drop("__lo", "__hi")
  }

  /** Corpus-relative quality gate: keep rows whose `valueCol` is at or
    * above the corpus's exact `pct`-th percentile — the adaptive form of
    * a fixed-threshold filter (q73's `>= 9000`), for when the policy is
    * "drop the worst quarter" rather than an absolute score. Absolute
    * thresholds silently change meaning as the corpus mix drifts; the
    * percentile form keeps the retention rate pinned.
    *
    * Scale shape: the threshold reuses [[groupPercentiles]]' histogram
    * plan under a constant group — a map-side-combinable aggregate
    * collapses the corpus to its DISTINCT values (scores are
    * basis-point-bounded integers, so thousands of rows, not billions)
    * before the single-partition cumulative walk; the driver collects
    * ONE long, folded into the filter as a literal (the k-means-centroid
    * pattern), so the kept-side plan is a pure codegen'd scan filter.
    * Ties at the threshold are kept (documented: retention can exceed
    * 1 − pct/100 by the threshold tie mass). NULL scores never pass the
    * gate: an all-null `valueCol` yields no threshold (the percentile of
    * an empty value set) and the result is empty rather than an NPE —
    * null rows cannot satisfy any "at or above" policy.
    *
    * @param valueCol an integral (long) column
    */
  def keepAbovePercentile(df: org.apache.spark.sql.DataFrame, valueCol: String,
      pct: Int): org.apache.spark.sql.DataFrame = {
    require(pct >= 1 && pct <= 100, "pct in 1..100")
    // `df` is consumed TWICE — the threshold aggregate and the returned
    // kept side — and its upstream is typically the expensive scoring
    // pass (q92 tokenizes + shingles the whole corpus). One eager
    // localCheckpoint materializes the (narrow) scored rows once, so the
    // corpus is scored one time instead of two; both consumers read the
    // checkpointed blocks. (Not Caching.pin: checkpoint blocks die with
    // the plan — nothing accumulates in the CacheManager across calls.)
    val snap = df.localCheckpoint()
    val thr = groupPercentiles(
        snap.select(lit(1).as("__g"), col(valueCol)), "__g", valueCol, Seq(pct))
      .select(col(s"p$pct")).collect().headOption
      .filter(!_.isNullAt(0)) // all-null values: one row, null percentile
      .map(_.getLong(0))
    thr match {
      case Some(t) => snap.filter(col(valueCol) >= lit(t))
      // empty corpus (stays empty) or all-null scores (nothing can be
      // at-or-above a threshold that does not exist)
      case None    => snap.filter(col(valueCol).isNotNull)
    }
  }

  /** Per-source data card — the release-notes table of a curation run:
    * document/token volumes, token-length percentiles, language share,
    * exact-duplicate exposure, quality-score percentiles, and
    * redaction-match exposure per source. The first artifact a dataset
    * audit asks for and the first place source-level anomalies surface
    * (a crawler gone wrong, a double-ingested dump, a source whose
    * quality distribution collapsed, a PII-heavy feed).
    *
    * Scale shape: one pinned pass computes tokens/lang/md5/quality/
    * redaction counts in the scan projection; duplicate exposure joins
    * against a corpus-wide (hash, count) aggregate — hash-only shuffles,
    * text never leaves stage one; token and quality percentiles ride
    * [[groupPercentiles]]' histogram (per-source DISTINCT values, not
    * the corpus). All derived ratios are integer-exact (floor div /
    * ppm / basis points).
    *
    * @return one row per source: (source, n_docs, n_tokens, n_en,
    *   n_dup_docs, p50_toks, p90_toks, mean_toks, dup_ppm, p50_quality,
    *   p90_quality, n_email_matches, n_ip_matches, n_num_matches,
    *   p50_quality_w, p90_quality_w — the last two over the 5..95
    *   winsorized scores)
    */
  def sourceDataCard(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, sourceCol: String): org.apache.spark.sql.DataFrame = {
    val base = Caching.pin(Dedup.once(
        docs.select(col(sourceCol).as("source"), col(idCol).as("id"),
          col(textCol).as("__text")),
        "__toks", tokens(col("__text")))
      .transform(d => Dedup.once(d, "__sh3", Dedup.shingles(col("__toks"), 3)))
      .select(Seq(col("source"), col("id"),
        tokenCount(col("__toks")).as("n_toks"),
        langGuess(col("__toks")).as("lang"),
        md5(col("__text")).as("h"),
        qualityScore(col("__text"), col("__toks"), col("__sh3")).as("qscore")) ++
        redactionCounts(col("__text")): _*))
    val freq = base.groupBy(col("h")).agg(count(lit(1)).as("n_copies"))
    val aggs = base.join(freq, Seq("h"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"),
        sum(when(col("n_copies") > 1, 1L).otherwise(0L)).as("n_dup_docs"),
        sum(col("n_emails")).as("n_email_matches"),
        sum(col("n_ips")).as("n_ip_matches"),
        sum(col("n_longnums")).as("n_num_matches"))
    val pcts = groupPercentiles(
        base.select(col("source"), col("n_toks")), "source", "n_toks", Seq(50, 90))
      .select(col("source"), col("p50").as("p50_toks"), col("p90").as("p90_toks"))
    val qpcts = groupPercentiles(
        base.select(col("source"), col("qscore")), "source", "qscore", Seq(50, 90))
      .select(col("source"),
        col("p50").as("p50_quality"), col("p90").as("p90_quality"))
    // the same quality percentiles over the WINSORIZED (5..95) scores:
    // the release artifact reports raw AND clipped distributions side
    // by side, so a reader can tell how much of a source's quality
    // spread is tail mass ([[winsorize]]'s composition, q118)
    val qwpcts = groupPercentiles(
        winsorize(base.select(col("source"), col("qscore")),
            "source", "qscore", 5, 95)
          .select(col("source"), col("qscore_w")),
        "source", "qscore_w", Seq(50, 90))
      .select(col("source"),
        col("p50").as("p50_quality_w"), col("p90").as("p90_quality_w"))
    aggs.join(pcts, Seq("source")).join(qpcts, Seq("source"))
      .join(qwpcts, Seq("source"))
      .withColumn("mean_toks", expr("n_tokens div n_docs"))
      .withColumn("dup_ppm", expr("(n_dup_docs * 1000000) div n_docs"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("n_en"),
        col("n_dup_docs"), col("p50_toks"), col("p90_toks"), col("mean_toks"),
        col("dup_ppm"), col("p50_quality"), col("p90_quality"),
        col("n_email_matches"), col("n_ip_matches"), col("n_num_matches"),
        col("p50_quality_w"), col("p90_quality_w"))
  }

  /** Top-k characteristic terms per document by tf-idf-style weighting,
    * integer-exact: `score_ppm = (tf * 1_000_000 * n_docs) div df` — a
    * monotone transform of tf·(N/df), so the RANKING equals real
    * tf-idf's with idf = N/df, while every value stays integral and
    * engine-exact. Ties break on the term string, so top-k is total.
    *
    * Scale shape: explode → (doc, term) count → term-level df join
    * (shuffle on term; the vocabulary stays distributed) → a broadcast
    * one-row corpus total → per-doc window top-k (partitioned by doc,
    * never global). Nothing collects. ANSI overflow guard: the ppm
    * product needs tf·N ≤ ~9e12 — beyond ~1e10 docs lower the scale
    * constant (the ranking is scale-invariant).
    */
  def topTermsTfidf(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int = 3): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = docs.select(col(idCol).as("id"),
      explode(tokens(col(textCol))).as("term"))
    val tf = terms.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val total = tf.select(countDistinct(col("id")).as("n_docs"))
    val w = Window.partitionBy(col("id")).orderBy(col("score_ppm").desc, col("term"))
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(total))
      .withColumn("score_ppm", expr("tf * 1000000 * n_docs div df"))
      .withColumn("term_rank", row_number().over(w).cast("long"))
      .filter(col("term_rank") <= k)
      .select(col("id"), col("term"), col("tf"), col("df"),
        col("score_ppm"), col("term_rank"))
  }

  /** Corpus-global top-k n-gram frequency table — the vocabulary /
    * boilerplate-inspection artifact of a curation run (the global
    * complement of the per-document [[topTermsTfidf]]): occurrence and
    * document counts per token n-gram, highest-frequency k rows.
    *
    * Scale shape: grams explode once, the count is a distributed
    * (gram)-keyed aggregation with map-side partials, and the global
    * top-k is `orderBy(...).limit(k)` — Spark plans TakeOrdered (per-
    * partition heaps + a k-row driver merge), so only k rows ever leave
    * the executors; the vocabulary itself never collects. Total tie
    * order (count desc, gram asc) keeps the k-th boundary deterministic.
    */
  def topNgrams(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, n: Int = 3, k: Int = 40): org.apache.spark.sql.DataFrame = {
    require(n >= 1 && k >= 1, "n and k must be positive")
    val grams = Dedup.once(
        docs.select(col(idCol).as("id"), col(textCol).as("__text")),
        "__toks", tokens(col("__text")))
      .select(col("id"), explode(Dedup.shingles(col("__toks"), n)).as("gram"))
    grams.groupBy(col("gram"))
      .agg(count(lit(1)).as("n_total"), count_distinct(col("id")).as("n_docs"))
      .orderBy(col("n_total").desc, col("gram").asc)
      .limit(k)
  }

  /** Build an INVERTED TERM INDEX over the corpus as a skipping-store
    * table — the exact-retrieval complement of the ANN index ("which
    * documents contain this term", the audit/recall question a vector
    * index cannot answer): one posting row per (term, doc), clustered
    * on the term's hash so every term's postings are contiguous in one
    * (or a few) files, with per-file term-hash ranges AND a term Bloom
    * sidecar in the manifest.
    *
    * Scale shape: the build is one tokenize-explode pass + one
    * (term, doc) aggregation — the same cost as TF-IDF's first stage;
    * the index is term-hash-range-partitioned, so a [[lookupTerms]]
    * serve reads only the files whose Bloom says "might contain" —
    * postings-list-sized I/O out of a corpus-sized index, pruned from
    * the LISTING like every store read. Posting rows carry the term
    * occurrence count (tf), so the serve result doubles as the scoring
    * input.
    */
  def buildInvertedIndex(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, indexDir: String, numFiles: Int,
      bloomExpected: Long = 100000L): graft.sinks.DataSkipping.SkipManifest = {
    val t = Caching.pin(tokenizedDocs(docs, idCol, textCol))
    try {
      // term_h is a 32-bit hash — uniform by construction, so the
      // clustered write places fixed-width ranges instead of paying
      // the RangePartitioner's sampling pass (a full re-run of the
      // postings aggregation's reduce stage per build)
      val m = graft.sinks.DataSkipping.writeWithStats(postingsOf(t), indexDir,
        col("term_h"), numFiles, statsCols = Seq("term_h"),
        bloomCols = Seq("term"), bloomExpected = bloomExpected,
        uniform = Some(graft.sinks.DataSkipping.Hash32Key))
      val (nDocs, totalTokens) = batchCounts(t)
      writeCorpusStats(docs.sparkSession, indexDir, CorpusStats(nDocs, totalTokens))
      m
    } finally Caching.release(t)
  }

  /** The shared tokenize + doc-length preparation of the index build
    * and append paths. Callers pin it: BOTH the postings write and the
    * stats count consume it, and tokenization is the expensive pass.
    */
  private def tokenizedDocs(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame =
    Dedup.once(
        docs.select(col(idCol).as("doc_id"), col(textCol).as("__text")),
        "__toks", tokens(col("__text")))
      .withColumn("dl", size(col("__toks")).cast("long"))

  /** (nDocs, totalTokens) of a tokenized batch — includes zero-token
    * docs in nDocs (BM25's N counts every document).
    */
  private def batchCounts(t: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val r = t.select(count(lit(1)).cast("long"),
      coalesce(sum(col("dl")), lit(0L))).collect().head
    (r.getLong(0), r.getLong(1))
  }

  /** Posting rows from a tokenized frame (`__toks`, `dl` present):
    * denormalized with the DOC LENGTH (the "norms" a search index
    * stores next to postings, so a BM25 serve needs no second corpus
    * pass) and the sorted 0-based POSITION list (what phrase queries
    * intersect); `tf` is the position count.
    */
  private def postingsOf(t: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    t.select(col("doc_id"), col("dl"),
        posexplode(col("__toks")).as(Seq("pos", "term")))
      .groupBy(col("term"), col("doc_id"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"),
        sort_array(collect_list(col("pos").cast("long"))).as("positions"))
      .withColumn("term_h", Dedup.hash32(col("term")))

  /** Append NEW documents to an existing index — the daily-ingest path:
    * their postings land as fresh clustered files via
    * [[graft.sinks.DataSkipping.appendWithStats]] (existing manifest
    * entries verbatim, cost = the batch), and the collection-stats
    * sidecar advances by the batch's counts. (term, doc) posting rows
    * stay unique because the docs are new, so df/tf/phrase serves stay
    * exact over the merged index. Re-ingesting an EXISTING doc id is
    * the caller's contract to prevent (route updates through an
    * erasure of the old doc's postings first).
    */
  def appendToInvertedIndex(newDocs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, indexDir: String, numFiles: Int): graft.sinks.DataSkipping.SkipManifest = {
    val t = Caching.pin(tokenizedDocs(newDocs, idCol, textCol))
    try {
      val m = graft.sinks.DataSkipping.appendWithStats(postingsOf(t), indexDir,
        col("term_h"), numFiles,
        uniform = Some(graft.sinks.DataSkipping.Hash32Key))
      val old = readCorpusStats(newDocs.sparkSession, indexDir)
      val (nDocs, totalTokens) = batchCounts(t)
      writeCorpusStats(newDocs.sparkSession, indexDir,
        CorpusStats(old.nDocs + nDocs, old.totalTokens + totalTokens,
          old.lastEpoch))
      m
    } finally Caching.release(t)
  }

  /** EXACTLY-ONCE epoch index ingest — the streaming/retry-safe form
    * of [[appendToInvertedIndex]]: the postings land via
    * [[graft.sinks.DataSkipping.appendEpoch]] (the MANIFEST is the
    * idempotence ledger — committed iff the epoch's files are listed),
    * and the stats sidecar advances guarded by its `lastEpoch` marker.
    * The two commits are not atomic, but every crash point RECOVERS
    * under the at-least-once retry contract:
    *
    *  - crash before the postings commit → retry re-lands the epoch
    *    (appendEpoch sweeps half-landed orphans);
    *  - crash between the commits → the retry sees the epoch committed
    *    (skips the append) and the sidecar behind (applies the counts);
    *  - retry of a fully-committed epoch → double no-op.
    *
    * Plain [[appendToInvertedIndex]] remains the simple batch path; a
    * production ingest loop (foreachBatch) should use THIS one with
    * the stream's epoch id. Epoch ids must be monotone per index.
    */
  def appendToInvertedIndexEpoch(newDocs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, indexDir: String, numFiles: Int,
      epochId: Long): graft.sinks.DataSkipping.SkipManifest = {
    require(epochId >= 0, "epochId must be >= 0")
    val spark = newDocs.sparkSession
    val t = Caching.pin(tokenizedDocs(newDocs, idCol, textCol))
    try {
      val m = graft.sinks.DataSkipping.appendEpoch(spark, indexDir,
        postingsOf(t), col("term_h"), numFiles, epochId,
        uniform = Some(graft.sinks.DataSkipping.Hash32Key))
      val st = readCorpusStats(spark, indexDir)
      if (st.lastEpoch < epochId) {
        val (nDocs, totalTokens) = batchCounts(t)
        writeCorpusStats(spark, indexDir,
          CorpusStats(st.nDocs + nDocs, st.totalTokens + totalTokens, epochId))
      }
      m
    } finally Caching.release(t)
  }

  /** Exact PHRASE query over the positional index: documents where the
    * words appear CONSECUTIVELY, found by position-list intersection —
    * term i's positions shift left by i, and a surviving start position
    * means the whole phrase begins there. One Bloom-pruned postings
    * read, one doc-keyed join per phrase word (each side
    * postings-sized), the intersection inside codegen — the corpus
    * text is never touched. Returns (doc_id, n_matches), docs with at
    * least one match.
    */
  def phraseQuery(spark: org.apache.spark.sql.SparkSession, indexDir: String,
      phrase: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(phrase.length >= 2, "a phrase needs at least two words")
    val p = graft.sinks.DataSkipping.readPrunedKeys(spark, indexDir, "term",
      phrase.distinct)
    val parts = phrase.zipWithIndex.map { case (t, i) =>
      p.filter(col("term") === t)
        .select(col("doc_id"),
          transform(col("positions"), x => x - i).as(s"__pos_$i"))
    }
    parts.reduce((a, b) => a.join(b, Seq("doc_id")))
      .withColumn("__starts",
        (0 until phrase.length).map(i => col(s"__pos_$i"))
          .reduce((a, b) => array_intersect(a, b)))
      .withColumn("n_matches", size(col("__starts")).cast("long"))
      .filter(col("n_matches") > 0L)
      .select(col("doc_id"), col("n_matches"))
  }

  /** Collection-level constants a scoring serve needs (one JSON row —
    * the Lucene "collection statistics" analogue). `lastEpoch` is the
    * highest epoch id whose counts are already folded in (−1 when the
    * index was built non-epochally) — the idempotence marker of
    * [[appendToInvertedIndexEpoch]].
    */
  final case class CorpusStats(nDocs: Long, totalTokens: Long,
      lastEpoch: Long = -1L)

  private val CorpusStatsName = "_corpus_stats.json"

  /** Write-aside + rename-with-OVERWRITE, like the manifest writer: a
    * concurrent serve (or a crash mid-write) sees either the old
    * complete sidecar or the new complete one, never a torn file.
    */
  private def writeCorpusStats(spark: org.apache.spark.sql.SparkSession,
      dir: String, st: CorpusStats): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val target = new org.apache.hadoop.fs.Path(dir, CorpusStatsName)
    val tmp = new org.apache.hadoop.fs.Path(dir, s".$CorpusStatsName.tmp")
    val fs = target.getFileSystem(conf)
    val out = fs.create(tmp, true)
    try out.write(
      (s"""{"nDocs":${st.nDocs},"totalTokens":${st.totalTokens}""" +
        s""","lastEpoch":${st.lastEpoch}}""" + "\n").getBytes("UTF-8"))
    finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(fs.getUri, conf)
    fc.rename(tmp, target, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  def readCorpusStats(spark: org.apache.spark.sql.SparkSession,
      dir: String): CorpusStats = {
    val p = new org.apache.hadoop.fs.Path(dir, CorpusStatsName)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    val Re = """\{"nDocs":(\d+),"totalTokens":(\d+)(?:,"lastEpoch":(-?\d+))?\}""".r
    Re.findFirstMatchIn(text) match {
      case Some(m) => CorpusStats(m.group(1).toLong, m.group(2).toLong,
        if (m.group(3) == null) -1L else m.group(3).toLong)
      case None => throw new IllegalStateException(
        s"corrupt corpus stats sidecar $p: '${text.trim.take(120)}'")
    }
  }

  /** Serve a term lookup from a [[buildInvertedIndex]] store: Bloom
    * sidecars prune the listing to might-contain files, the residual
    * `IN` keeps the result exact. Returns (term, doc_id, tf).
    */
  def lookupTerms(spark: org.apache.spark.sql.SparkSession, indexDir: String,
      terms: Seq[String]): org.apache.spark.sql.DataFrame =
    graft.sinks.DataSkipping.readPrunedKeys(spark, indexDir, "term", terms)
      .select(col("term"), col("doc_id"), col("tf"))

  /** Conjunctive (AND) retrieval: documents containing EVERY query
    * term — the posting-list intersection, expressed as one keyed
    * aggregate over the Bloom-pruned postings (a doc survives iff its
    * distinct matched terms count all of them). Returns
    * (doc_id, sum_tf) with sum_tf the total query-term occurrences,
    * the input a downstream scorer consumes.
    */
  def lookupAllTerms(spark: org.apache.spark.sql.SparkSession, indexDir: String,
      terms: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    val distinctTerms = terms.distinct
    graft.sinks.DataSkipping.readPrunedKeys(spark, indexDir, "term", distinctTerms)
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("term")).as("__n"), sum(col("tf")).as("sum_tf"))
      .filter(col("__n") === distinctTerms.size)
      .select(col("doc_id"), col("sum_tf"))
  }

  /** Boolean EXCLUSION retrieval: documents containing any `include`
    * term but NONE of the `exclude` terms — the "-term" query, served
    * as an anti-join between two Bloom-pruned postings reads (both
    * postings-sized; the corpus is never touched). Returns
    * (doc_id, sum_tf) over the include terms.
    */
  def lookupTermsExcluding(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, include: Seq[String],
      exclude: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(include.nonEmpty && exclude.nonEmpty,
      "include and exclude must be non-empty")
    val inc = graft.sinks.DataSkipping.readPrunedKeys(spark, indexDir, "term",
        include.distinct)
      .groupBy(col("doc_id")).agg(sum(col("tf")).as("sum_tf"))
    val exc = graft.sinks.DataSkipping.readPrunedKeys(spark, indexDir, "term",
        exclude.distinct)
      .select(col("doc_id")).distinct()
    inc.join(exc, Seq("doc_id"), "left_anti")
  }

  /** The full search SERVE loop — retrieve → fetch → snippet: BM25
    * ranks the top k over the index ([[bm25TopK]]), the k-row result
    * BROADCASTS against the corpus to fetch the winners' text (a
    * map-only probe — the corpus never shuffles for a serve), and the
    * snippet is the 6-token window around the document's FIRST
    * query-term occurrence, whose position comes from the positional
    * postings (already read — no text scan finds it). Returns
    * (doc_id, score_m, snippet).
    */
  def searchServe(spark: org.apache.spark.sql.SparkSession, indexDir: String,
      docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int = 10): org.apache.spark.sql.DataFrame = {
    // ONE postings read feeds both the ranking and the snippet anchor
    val p = queryPostings(spark, indexDir, terms)
    val top = bm25Rank(spark, indexDir, p, k, k1Milli = 1200L, bMilli = 750L)
    val firstPos = p
      .groupBy(col("doc_id"))
      .agg(min(element_at(col("positions"), 1)).as("__p0"))
    val t = Dedup.once(
      docs.select(col(idCol).as("doc_id"), col(textCol).as("__text")),
      "__toks", tokens(col("__text")))
    t.join(broadcast(top.join(firstPos, Seq("doc_id"))), Seq("doc_id"))
      .withColumn("__s", (greatest(col("__p0") - 2, lit(0L)) + 1L).cast("int"))
      .select(col("doc_id"), col("score_m"),
        concat_ws(" ", slice(col("__toks"), col("__s"), lit(6))).as("snippet"))
  }

  /** BM25-shaped top-k retrieval over the index — term-frequency
    * SATURATION and document-LENGTH normalization (the parts that
    * separate BM25 from raw tf-idf) in exact milli-unit integers, with
    * the log-free reciprocal idf of [[topTermsTfidf]] (both engines'
    * `ln` may differ in the last ulp, so a log-based score could flip
    * a floor — the idf VARIANT is the price of bit-exactness):
    *
    *   idf_m(t)  = N·1000 div df_t
    *   norm_m(d) = 1000 − b_m + (b_m · dl · 1000) div avgdl_m
    *   s_m(t,d)  = (idf_m · tf · (k1_m + 1000)) div (tf·1000 + (k1_m · norm_m) div 1000)
    *   score_m(d) = Σ_{t ∈ q} s_m(t,d)
    *
    * with k1_m = 1200, b_m = 750 (the classic k1=1.2, b=0.75) and
    * avgdl_m from the build-time sidecar. df_t computes from the
    * pruned postings themselves (the read returns EVERY posting of
    * each query term, so the count is the exact collection df).
    *
    * Scale shape: the serve touches only might-contain files; the
    * per-term df is a tiny keyed agg over those postings; the top-k is
    * TakeOrdered under the total (score desc, doc_id) order.
    */
  def bm25TopK(spark: org.apache.spark.sql.SparkSession, indexDir: String,
      terms: Seq[String], k: Int = 10, k1Milli: Long = 1200L,
      bMilli: Long = 750L): org.apache.spark.sql.DataFrame =
    bm25Rank(spark, indexDir, queryPostings(spark, indexDir, terms),
      k, k1Milli, bMilli)

  /** One Bloom-pruned postings read for the query terms, materialized
    * (localCheckpoint — the IVF-serve pattern) because every serve
    * consumes it at least twice (df aggregate + score join, and the
    * snippet pass in [[searchServe]]); re-reading the files per
    * consumer would double the serve's index I/O.
    */
  private def queryPostings(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, terms: Seq[String]): org.apache.spark.sql.DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    graft.sinks.DataSkipping.readPrunedKeys(spark, indexDir, "term",
      terms.distinct).localCheckpoint()
  }

  /** The ranking core over an already-read postings frame. */
  private def bm25Rank(spark: org.apache.spark.sql.SparkSession, indexDir: String,
      p: org.apache.spark.sql.DataFrame, k: Int, k1Milli: Long,
      bMilli: Long): org.apache.spark.sql.DataFrame = {
    require(k >= 1, "k must be positive")
    val stats = readCorpusStats(spark, indexDir)
    require(stats.nDocs > 0 && stats.totalTokens > 0,
      s"empty corpus in $indexDir sidecar: $stats")
    val avgdlMilli = stats.totalTokens * 1000L / stats.nDocs
    val dfT = p.groupBy(col("term")).agg(count(lit(1)).as("df"))
    p.join(dfT, Seq("term"))
      .withColumn("s_m", expr(
        // nDocs is corpus-sized and MUST interpolate as a BIGINT
        // literal: a bare `5000000` parses as INT, and `INT * 1000`
        // overflows under ANSI exactly when N·1000 crosses 2³¹ —
        // found live by the sf100 anchor (5M docs), green at every
        // smaller scale. The L suffix changes no output type (df/tf
        // already widen the expression to bigint) and no value below
        // the overflow point.
        s"((${stats.nDocs}L * 1000 div df) * tf * ($k1Milli + 1000)) div " +
          s"(tf * 1000 + ($k1Milli * (1000 - $bMilli + ($bMilli * dl * 1000) div $avgdlMilli)) div 1000)"))
      .groupBy(col("doc_id"))
      .agg(sum(col("s_m")).as("score_m"), count(lit(1)).as("n_terms"))
      .orderBy(col("score_m").desc, col("doc_id").asc)
      .limit(k)
  }

  /** Corpus-global top-k COLLOCATIONS by pointwise mutual information —
    * the phrase/term-of-art miner (multi-word expressions, boilerplate
    * signatures) that raw bigram frequency ([[topNgrams]]) buries under
    * "of the": PMI rescales the pair count by its parts' popularity.
    *
    *   PMI(x,y) = log p(x,y)/(p(x)p(y)),  p(x,y)=c_xy/M, p(x)=c_x/N
    *
    * log is monotone, so the RANKING needs only the exact integer ratio
    *   score_ppm = (c_xy · N² · 10⁶) div (M · c_x · c_y)
    * computed in decimal(38,0) (the int64 product overflows right at
    * corpus scale — the q153/q127 lesson) and floor-divided back to a
    * long: engine-exact, no doubles, no logs. `minCount` floors the
    * pair support (PMI's classic failure mode is hapax pairs scoring
    * highest).
    *
    * Scale shape: the unigram and bigram counts are the only
    * corpus-sized subtrees (each materializes once — their exchanges
    * are reused wherever referenced again, Spark's ReuseExchange), and
    * the corpus totals DERIVE from those count tables instead of a
    * third tokenize pass over the corpus: n_tok = Σ c_w exactly
    * (explode enumerates every token instance) and m_bi = Σ c_xy over
    * the UNFILTERED bigram counts = Σ_docs max(len−1, 0) exactly
    * (every ≥2-token doc contributes len−1 bigram instances). The two
    * c_x/c_y joins are keyed shuffles of the MINCOUNT-FILTERED bigram
    * table against the unigram table; the top-k is TakeOrdered (k rows
    * to the driver, the vocabulary never collects).
    */
  def topCollocations(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, minCount: Long = 5L, k: Int = 40): org.apache.spark.sql.DataFrame = {
    require(minCount >= 1 && k >= 1, "minCount and k must be positive")
    val t = Dedup.once(
      docs.select(col(idCol).as("id"), col(textCol).as("__text")),
      "__toks", tokens(col("__text")))
    val uni = t.select(explode(col("__toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c_w"))
    val bi0 = t.filter(size(col("__toks")) >= 2)
      .select(explode(Dedup.shingles(col("__toks"), 2)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("c_xy"))
    // totals from the count tables — vocabulary-sized aggregates over
    // REUSED exchanges, not a third pass over the corpus. coalesce(0):
    // an all-empty-token corpus has no count rows (sum → NULL) where
    // the old corpus pass summed zeros; either value is unobservable
    // (bi is empty then too).
    val totals = uni.agg(
        coalesce(sum(col("c_w")), lit(0L)).cast("decimal(38,0)").as("n_tok"))
      .crossJoin(bi0.agg(
        coalesce(sum(col("c_xy")), lit(0L)).cast("decimal(38,0)").as("m_bi")))
    val bi = bi0.filter(col("c_xy") >= minCount)
    bi.withColumn("x", split(col("gram"), " ").getItem(0))
      .withColumn("y", split(col("gram"), " ").getItem(1))
      .join(uni.withColumnRenamed("w", "x").withColumnRenamed("c_w", "c_x"), Seq("x"))
      .join(uni.withColumnRenamed("w", "y").withColumnRenamed("c_w", "c_y"), Seq("y"))
      .crossJoin(broadcast(totals))
      .withColumn("score_ppm", expr(
        "CAST(c_xy AS DECIMAL(38,0)) * n_tok * n_tok * 1000000" +
          " div (m_bi * c_x * c_y)"))
      .select(col("gram"), col("c_xy"), col("c_x"), col("c_y"), col("score_ppm"))
      .orderBy(col("score_ppm").desc, col("gram").asc)
      .limit(k)
  }

  /** Corpus-bigram language-model fluency score — the perplexity-filter
    * SHAPE (KenLM-style "does this doc read like the corpus" gating)
    * with exact integer arithmetic instead of log-probs: each of a
    * doc's bigrams scores its corpus conditional probability in ppm,
    *
    *   p(y|x) ≈ (c_xy · 10⁶) div c_x,
    *
    * and the doc's fluency is the integer mean over its bigrams.
    * Repetitive/boilerplate text (high-probability transitions) scores
    * high, out-of-distribution text scores near zero — the same
    * decision axis a real LM filter thresholds, transparent and
    * engine-replayable (both engines floor-divide longs identically).
    * Docs with fewer than two tokens have no transitions and score 0.
    *
    * Scale shape: one tokenize pass feeds the corpus bigram/unigram
    * count tables AND the per-doc bigram stream; the two count joins
    * are (gram)- and (head-word)-keyed shuffles with map-side partial
    * aggs; the final doc-keyed mean is one more keyed agg. Nothing
    * collects; no doubles anywhere.
    */
  def bigramLmScore(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    // Two algebraic pass removals over the previous shape (which ran
    // tokenize+explode once per consumer):
    //  - the head-word counts DERIVE from the bigram count table
    //    (c_x = Σ_{grams g starting with x} c_xy(g) — every bigram
    //    instance contributes its head exactly once), a
    //    vocabulary-sized aggregate instead of a corpus pass;
    //  - the keep-every-doc join reads the doc ids straight off the
    //    source (same rows by construction) instead of through the
    //    tokenized frame's generate barrier, which forced a full
    //    tokenize just to enumerate ids.
    // The remaining corpus-sized subtrees are the bigram count and the
    // per-instance scoring stream — the irreducible pair (corpus model
    // + per-doc application).
    val grams = Dedup.once(
        docs.select(col(idCol).as("id"), col(textCol).as("__text")),
        "__toks", tokens(col("__text")))
      .filter(size(col("__toks")) >= 2)
      .select(col("id"), explode(Dedup.shingles(col("__toks"), 2)).as("gram"))
    val bc = grams.groupBy(col("gram")).agg(count(lit(1)).as("c_xy"))
    val uc = bc
      .select(split(col("gram"), " ").getItem(0).as("x"), col("c_xy"))
      .groupBy(col("x")).agg(sum(col("c_xy")).as("c_x"))
    val scored = grams
      .join(bc, Seq("gram"))
      .withColumn("x", split(col("gram"), " ").getItem(0))
      .join(uc, Seq("x"))
      .withColumn("p_ppm", expr("c_xy * 1000000 div c_x"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        expr("sum(p_ppm) div count(1)").as("lm_ppm"))
    docs.select(col(idCol).as("id"))
      .join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("lm_ppm"), lit(0L)).as("lm_ppm"))
  }

  /** Feature-hashed document vectors — the HASHING TRICK (Weinberger et
    * al.): each term folds into one of `dim` buckets by portable hash,
    * giving every document a fixed-width integer count vector with NO
    * vocabulary table, no fit step, and no driver state — the cheap
    * featurization for clustering/classification when a learned
    * embedding is overkill. Emitted in LONG form (doc, bucket, n) with
    * zero buckets absent — the sparse representation that joins/
    * aggregates without array columns.
    *
    * Scale shape: tokenize-explode, map-side bucket assignment (the
    * hash is a codegen'd expression), ONE (doc, bucket)-keyed count.
    * Collisions are the accepted trade of the trick; `dim` tunes them.
    */
  def hashingTfVectors(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, dim: Int = 64): org.apache.spark.sql.DataFrame = {
    require(dim >= 1, "dim must be positive")
    Dedup.once(
        docs.select(col(idCol).as("id"), col(textCol).as("__text")),
        "__toks", tokens(col("__text")))
      .select(col("id"), explode(col("__toks")).as("term"))
      .withColumn("bucket", pmod(Dedup.hash32(col("term")), lit(dim.toLong)))
      .groupBy(col("id"), col("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Per-source token-distribution DRIFT against the whole corpus —
    * total variation distance in exact integer ppm: for source s with
    * token total n_s against corpus totals (c_t, N),
    *
    *   TV(s) = ½ Σ_t |obs_ts/n_s − c_t/N|
    *         = (Σ_t |obs_ts·N − c_t·n_s|) · 10⁶ div (2·n_s·N)   [ppm]
    *
    * — the distribution-shift monitor a mixture pipeline alarms on
    * (a source drifting from the corpus mix shifts sampling weights
    * and contamination risk). The absent-term tail (terms the source
    * never emits, each contributing c_t·n_s) folds in CLOSED FORM from
    * the totals — Σ_absent c_t = N − Σ_present c_t — so only the
    * source's PRESENT terms are ever joined; the corpus vocabulary is
    * never gridded against sources. Products run in decimal(38,0):
    * obs·N is fine in int64 today and overflows exactly at the
    * 100 TB corpus this monitors (the q153/q172 lesson).
    *
    * Scale shape: one tokenize pass → (source, term) counts → a
    * term-keyed join against the corpus term table → one per-source
    * agg + a broadcast single-row total. TV = 0 iff the source matches
    * the corpus distribution exactly; 10⁶ = disjoint support.
    */
  def sourceDrift(docs: org.apache.spark.sql.DataFrame, sourceCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val terms = Dedup.once(
        docs.select(col(sourceCol).as("source"), col(textCol).as("__text")),
        "__toks", tokens(col("__text")))
      .select(col("source"), explode(col("__toks")).as("term"))
    val st = terms.groupBy(col("source"), col("term")).agg(count(lit(1)).as("obs"))
    val ct = terms.groupBy(col("term")).agg(count(lit(1)).as("c_t"))
    val totals = ct.select(sum(col("c_t")).cast("decimal(38,0)").as("n_total"))
    val perSource = st.groupBy(col("source")).agg(sum(col("obs")).as("n_s"))
    st.join(ct, Seq("term"))
      .join(perSource, Seq("source"))
      .crossJoin(broadcast(totals))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_terms"),
        max(col("n_s")).as("n_s"),
        max(col("n_total")).as("n_tot"),
        sum(col("c_t")).as("c_present"),
        sum(expr(
          "abs(CAST(obs AS DECIMAL(38,0)) * n_total - CAST(c_t AS DECIMAL(38,0)) * n_s)"))
          .as("present_dev"))
      .withColumn("tv_ppm", expr(
        // absent-term tail in closed form: (N − c_present) · n_s
        "CAST((present_dev + (n_tot - c_present) * CAST(n_s AS DECIMAL(38,0)))" +
          " * 1000000 div (2 * CAST(n_s AS DECIMAL(38,0)) * n_tot) AS BIGINT)"))
      .select(col("source"), col("n_terms"), col("n_s"), col("tv_ppm"))
  }

  /** Token-distribution drift of a BATCH against a persisted reference
    * PROFILE — the admission-control form of [[sourceDrift]] (which
    * compares sources within one corpus): the profile is a (term,
    * `c_t`) count table built once from the reference corpus, and each
    * incoming batch scores its total-variation distance against it in
    * exact integer ppm. The two absent-term tails both fold in closed
    * form — profile-only terms from the profile total minus the
    * matched mass, batch-only terms from the left join's NULL side —
    * so the only join is batch-terms × profile, batch-sized. Returns
    * ONE row (n_batch_terms, n_batch_tokens, tv_ppm): 0 = the batch
    * IS the profile distribution, 10⁶ = disjoint vocabulary. The
    * per-epoch foreachBatch composition is the streaming data-contract
    * gate: a drifted epoch alarms in exactly its epoch.
    */
  def driftAgainstProfile(batch: org.apache.spark.sql.DataFrame, textCol: String,
      profile: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val bt = Dedup.once(
        batch.select(col(textCol).as("__text")),
        "__toks", tokens(col("__text")))
      .select(explode(col("__toks")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("obs"))
    val bTotals = bt.select(sum(col("obs")).cast("decimal(38,0)").as("n_batch"))
    val pTotals = profile.select(sum(col("c_t")).cast("decimal(38,0)").as("n_prof"))
    bt.join(profile.select(col("term"), col("c_t")), Seq("term"), "left")
      .crossJoin(broadcast(bTotals))
      .crossJoin(broadcast(pTotals))
      .agg(
        count(lit(1)).as("n_batch_terms"),
        sum(col("obs")).as("n_batch_tokens"),
        max(col("n_batch")).as("nb"),
        max(col("n_prof")).as("np"),
        sum(coalesce(col("c_t"), lit(0L))).as("c_matched"),
        sum(expr("abs(CAST(obs AS DECIMAL(38,0)) * n_prof" +
          " - CAST(coalesce(c_t, 0) AS DECIMAL(38,0)) * n_batch)")).as("dev"))
      // profile-only tail in closed form: (Np − matched mass) · Nb.
      // An EMPTY batch (a quiet streaming epoch) OR an empty/broken
      // profile has no distribution to compare — score it fully
      // drifted rather than dividing by zero (or silently emitting
      // NULL, which would disable a tv_ppm > threshold alarm forever);
      // CaseWhen evaluates lazily, so the division never runs on the
      // guarded branch.
      .withColumn("tv_ppm",
        when(col("nb").isNull || col("nb") === 0 ||
            col("np").isNull || col("np") === 0, lit(1000000L))
          .otherwise(expr(
            "CAST((dev + (np - c_matched) * nb) * 1000000 div (2 * nb * np) AS BIGINT)")))
      .select(col("n_batch_terms"),
        coalesce(col("n_batch_tokens"), lit(0L)).as("n_batch_tokens"),
        col("tv_ppm"))
  }

  /** Transparent linear quality score — the model-based-filter SHAPE
    * (a fasttext-style quality classifier is a weighted feature sum at
    * inference) with auditable fixed integer weights over the standard
    * ratio features:
    *
    *   score = 3·stop_bp + alpha_bp − 2·punct_bp − rep_bp
    *
    * Basis-point features in, long out — engine-exact, codegen'd,
    * shuffle-free. The weights and threshold are the transparent stub
    * for a learned model (swap in learned weights, keep the plan); the
    * operator is the shape, not the model.
    *
    * @param sh the document's materialized 3-shingle array (list, not
    *   set — [[repBp]]'s input)
    */
  def qualityScore(text: Column, toks: Column, sh: Column): Column = {
    val nChars = length(text).cast("long")
    val nPunct = (nChars - length(regexp_replace(text, "[^a-zA-Z0-9 ]", ""))).cast("long")
    val nAlpha = length(regexp_replace(text, "[^a-zA-Z]", "")).cast("long")
    lit(3L) * basisPoints(stopwordCount(toks, EnStop), tokenCount(toks)) +
      basisPoints(nAlpha, nChars) -
      lit(2L) * basisPoints(nPunct, nChars) -
      repBp(sh)
  }
}
