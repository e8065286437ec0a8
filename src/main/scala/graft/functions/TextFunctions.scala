package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale corpus pipelines, as pure Column
  * functions (codegen'd, no UDFs) — language-ID heuristic, quality scoring,
  * token counting, and normalization fingerprints. Each is deliberately
  * expressible in ANSI SQL so a DuckDB oracle can cross-check results.
  *
  * Scale: everything here is a per-row scalar computation — embarrassingly
  * parallel, no shuffle, runs inside the parquet scan's codegen stage.
  */
object TextFunctions {

  /** Whitespace tokenization; empty/blank text → empty array (the plain
    * `split` of an empty string yields [""], which would poison counts).
    */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  def nTokens(text: Column): Column = size(tokens(text))

  /** Ordered token n-gram list WITH multiplicity (cf. `Dedup.shingleSet`,
    * which is distinct-per-doc) — the frequency-counting view a corpus
    * profile needs. Texts shorter than n tokens yield an empty list.
    */
  def ngramList(text: Column, n: Int): Column =
    // one codegen kernel pass (r17) — the transform/array_join/slice lambda
    // route evaluated every gram through CodegenFallback eval; same
    // convention (texts shorter than n tokens yield an empty list)
    TextExpressions.ngramList(tokens(text), n)

  /** BPE-ish token counting: word pieces OR single non-space punctuation —
    * the standard pre-tokenizer regex shape.
    */
  def bpeTokens(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"), lit(0)))

  /** Normalization fingerprint: md5 over the sorted distinct token set —
    * detects bag-of-words duplicates regardless of word order. Cross-engine
    * stable (md5 of a deterministic string).
    */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " "))

  /** Count of tokens contained in `words` (with multiplicity). */
  def stopwordHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => array_contains(lit(words.toArray), t)))

  /** Tiny per-language stopword lists driving the n-gram-free language-ID
    * heuristic. Deliberately small: the heuristic (argmax of stopword hits)
    * is the operator; the lists are configuration.
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "von", "zu", "mit", "ist"),
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "los", "es"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "est"),
    "zh" -> Seq("的", "了", "是", "我", "不", "在", "人"))

  /** Predicted language = argmax over stopword hit counts; ties and all-zero
    * resolve to the alphabetically-first contender / "und" respectively —
    * fully deterministic so the oracle can replicate it with CASE.
    */
  def langId(text: Column): Column = {
    val hits = stopwords.map { case (lang, ws) => lang -> stopwordHits(text, ws) }
    val best = hits.map(_._2).reduce((a, b) => greatest(a, b))
    // foldRight keeps the FIRST (alphabetical) lang reaching the max —
    // mirror the same CASE order in oracles.
    hits.foldRight(lit("und")) { case ((lang, h), acc) =>
      when(h === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Overlapping token-window chunks — the training-data prep step that
    * splits long documents into model-window-sized pieces. Returns
    * array<struct<chunk_no int, chunk string, n_tokens int>>: chunk i covers
    * tokens [i*stride, i*stride+size); a document shorter than `size` yields
    * exactly one chunk. Pure Column composition (explode downstream), so
    * chunking runs inside the scan's codegen stage and only the exploded
    * chunks shuffle.
    */
  def chunks(text: Column, chunkSize: Int, stride: Int): Column = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      "need 0 < stride <= chunkSize")
    // one codegen kernel pass (r17) — the transform/slice/array_join lambda
    // chain evaluated every chunk through CodegenFallback eval; same
    // convention (chunk i covers [i·stride, i·stride+chunkSize); short docs
    // yield exactly one chunk)
    TextExpressions.tokenChunks(tokens(text), chunkSize, stride)
  }

  /** PII redaction: replace every match of each (pattern, token) rule in
    * order — rule order matters when patterns overlap (redact emails before
    * bare phone digits, etc.). Pure regexp_replace composition: codegen'd,
    * no UDF, patterns limited to the RE2-compatible subset so SQL oracles
    * and other engines replicate byte-for-byte.
    */
  def redact(text: Column, rules: Seq[(String, String)]): Column =
    rules.foldLeft(text) { case (c, (pat, tok)) =>
      regexp_replace(c, pat, tok)
    }

  /** Number of non-overlapping matches of `pattern`. */
  def countMatches(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Quality scoring signals: share of alphabetic chars, punctuation density,
    * mean token length, stopword ratio — the usual cheap corpus filters.
    */
  def alphaRatio(text: Column): Column =
    length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") /
      nullif(length(text), lit(0)).cast("double")

  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[\\.,;:!\\?]", ""))

  def meanTokenLen(text: Column): Column =
    (length(regexp_replace(trim(text), "\\s+", "")).cast("double") /
      nullif(nTokens(text), lit(0)).cast("double"))
}
