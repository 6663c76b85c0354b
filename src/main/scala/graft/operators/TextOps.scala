package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text-analysis building blocks for large-scale training-data
  * pipelines. Everything here is a narrow per-row expression (no shuffle, no
  * UDF): built-in collection/string functions that Catalyst can push through
  * and pipeline inside a single stage, so these scale linearly with input
  * splits on any cluster size.
  */
object TextOps {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish subword-ish tokens: split on non-alphanumerics, drop empties.
    * A cheap stand-in for a real tokenizer with the same plumbing shape. */
  def regexTokens(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), t => length(t) > 0)

  /** Distinct word n-gram shingles, `"w1 w2 … wn"`. Empty array when the
    * document has fewer than n tokens (never an ANSI index error).
    *
    * IMPORTANT for hot paths: pass an already-projected token *column*
    * (see [[shinglesOfTokens]]) rather than composing over `tokens(text)`
    * inline. Higher-order lambdas evaluate interpreted, re-evaluating any
    * captured non-attribute sub-expression per element — an inline `split`
    * here would re-tokenize the document for every shingle (measured ~10×
    * the whole operator's cost at sf0.1). */
  def wordShingles(text: Column, n: Int): Column =
    shinglesOfTokens(tokens(text), n)

  /** [[wordShingles]] over a pre-computed token array. Keep `t` a plain
    * column reference in caller plans so per-element access is O(1). */
  def shinglesOfTokens(t: Column, n: Int): Column =
    when(size(t) >= n,
      array_distinct(
        transform(sequence(lit(0), size(t) - n),
          i => concat_ws(" ", (1 to n).map(k => element_at(t, i + k)): _*))))
      .otherwise(array().cast("array<string>"))

  /** MinHash signature of a shingle set: k independent hash functions
    * h_j(s) = xxhash64(s, j), each taking the min over the set. One pass per
    * row, no shuffle — signatures of a 100 TB corpus compute map-side. */
  def minhashSignature(shingles: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      j => array_min(transform(shingles, s => xxhash64(s, j))))

  /** 64-bit SimHash over the distinct tokens: per bit, sum +1/-1 weighted by
    * each token hash's bit, then keep the sign. Pure expression (SQL
    * higher-order functions), evaluated per row.
    *
    * `tokensExpr` is a SQL expression yielding array<string>. */
  def simhash64(tokensExpr: String): Column = expr(
    s"""aggregate(
          zip_with(
            aggregate(array_distinct($tokensExpr),
              array_repeat(cast(0 as bigint), 64),
              (acc, t) -> zip_with(acc,
                transform(sequence(0, 63),
                  b -> if((shiftright(xxhash64(t), b) & 1) = 1,
                          cast(1 as bigint), cast(-1 as bigint))),
                (x, y) -> x + y)),
            sequence(0, 63),
            (s, i) -> if(s > 0, shiftleft(cast(1 as bigint), i),
                         cast(0 as bigint))),
          cast(0 as bigint), (a, x) -> a + x)""")

  /** Quality-score features: token count, char count, average token length,
    * distinct-token ratio, stopword ratio. Deterministic IEEE arithmetic —
    * oracle-comparable unrounded. */
  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("bigint")

  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), t => t.isin(stopwords.map(x => x: Any): _*)))
      .cast("bigint")

  /** Language-ID by stopword-profile overlap: score each language's profile
    * against the document's distinct tokens, pick the best (ties broken by
    * language code, descending struct comparison). A real system would use
    * character n-gram models; the plumbing — per-row scoring against small
    * broadcast profiles, no shuffle — is identical.
    */
  val langProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un", "es"),
    "de" -> Seq("der", "die", "das", "und", "zu", "den", "von", "ist"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "est"),
    "zh" -> Seq("de", "le", "he", "shi", "zai", "wo", "you", "ni"))

  def langId(text: Column): Column = {
    val toks = array_distinct(tokens(lower(text)))
    val scored = array(langProfiles.toSeq.sortBy(_._1).map { case (lang, ws) =>
      struct(
        size(array_intersect(toks, typedlit(ws))).as("score"),
        lit(lang).as("lang"))
    }: _*)
    array_max(scored).getField("lang")
  }

  /** Content fingerprint: md5 over the whitespace-normalized lowercase text.
    * Used for exact/near-exact dedup keys and cache keys. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), " +", " ")))

  /** PII patterns a pre-training scrub removes, in redaction order. Each is
    * codegen'd `regexp_replace` — a narrow per-row map, no shuffle, safe to
    * fuse into the ingest projection at any scale. Deliberately
    * high-precision shapes (emails, international-ish phone numbers, IPv4,
    * 13–19-digit card runs); corpus-specific recall tuning belongs in
    * caller-supplied extra patterns. */
  val piiPatterns: Seq[(String, String)] = Seq(
    // Most-specific first: each pass runs on the previous pass's output, so
    // the general phone shape (a long digit run) must not get first claim
    // on IPv4s or card numbers.
    ("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>"),
    ("\\b[0-9]{13,19}\\b", "<NUMBER>"),
    // Phone requires STRUCTURE, not just digits near separators: a leading
    // "+" (international form, spaces/parens allowed), a PRESENT closing
    // paren (US area-code form, space or dash separators), or >= 3 purely
    // dash-joined groups. Two-group dash forms ("2020-21" seasons,
    // "1234-56" page ranges) and bare space-separated digit runs
    // ("2019 2020 2021") are prose, not PII, and must survive the scrub.
    ("(?:\\+[0-9][0-9()\\- ]{7,}[0-9]" +
      "|\\(?[0-9]{2,4}\\)[\\- ]?[0-9]{2,4}[\\- ]?[0-9]{2,6}" +
      "|[0-9]{2,4}(?:-[0-9]{2,6}){2,3})",
      "<PHONE>"))

  /** Scrubbed text: every [[piiPatterns]] match replaced by its tag. */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (c, (re, tag)) =>
      regexp_replace(c, re, tag)
    }

  /** Count of PII matches removed by [[redactPii]], for scrub-rate audits.
    * Counts at each sequential redaction step — same semantics as the
    * replacement chain, so one card number is one <NUMBER>, not also a
    * phone match. */
  def piiMatchCount(text: Column): Column =
    piiPatterns.foldLeft((text, lit(0))) { case ((c, n), (re, tag)) =>
      (regexp_replace(c, re, tag),
        n + size(regexp_extract_all(c, lit(re), lit(0))))
    }._2.cast("bigint")

  /** [[redactPii]] + [[piiMatchCount]] fused into ONE native kernel pass
    * per pattern: struct(redacted, matches). The composed form walks the
    * text with eight regex passes (four replaces + four counting
    * re-scans); the kernel replaces and counts in a single Matcher loop
    * per pattern — half the regex CPU, byte-identical output
    * (spec-pinned against the composed columns). */
  def piiScrub(text: Column): Column =
    graft.functions.GraftFunctions.regexScrub(text, piiPatterns)

  /** Interpolated bigram-LM quality score (t20's operator form, round 18):
    * per-position ln(0.8·P(w|prev) + 0.2·P(w)) with corpus-MLE
    * probabilities, averaged per doc in token order. The declared-SQL form
    * re-expands its token CTE on every reference (Spark inlines CTEs), so
    * the corpus tokenized THREE times per run; here the token-array frame
    * is computed once and persisted (the [[Dedup.persistSketch]] /
    * releaseSketchCaches contract), and uni/bigram/context counts all read
    * the cache. Every arithmetic step — count aggregation, the
    * (0.8·bg/ctx + 0.2·uni/total) interpolation, the position-sorted
    * sequential fold, the 4-digit round — is the SQL form's expression
    * tree verbatim, so the emitted doubles are bit-identical and the
    * DuckDB oracle hash-match is unchanged. Single-token docs carry no
    * bigram and drop out, exactly as in the SQL. */
  def bigramLogprob(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val toksarr = Dedup.persistSketch(docs.select(
      col(idCol).as("doc_id"), regexTokens(col(textCol)).as("ts")))
    val toks = toksarr.select(col("doc_id"), explode(col("ts")).as("tok"))
    // Bigrams map-side from each doc's token array (a zip of adjacent
    // slices) — the declared SQL's narrow shape, no lag window.
    val big = toksarr.where(size(col("ts")) >= 2)
      .select(col("doc_id"), posexplode(zip_with(
        slice(col("ts"), lit(1), size(col("ts")) - 1),
        slice(col("ts"), lit(2), size(col("ts")) - 1),
        (x, y) => struct(x.as("a"), y.as("b")))))
      .select(col("doc_id"), (col("pos") + 1).as("pos"),
        col("col.a").as("prev"), col("col.b").as("tok"))
    val uni = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val bg = big.groupBy("prev", "tok").agg(count(lit(1)).as("cnt"))
    val ctx = bg.groupBy("prev").agg(sum("cnt").as("cnt"))
    // `(select total from n)` in the SQL — a 1-row frame; broadcast join
    // attaches the identical bigint to every row.
    val n = uni.agg(sum("cnt").as("total"))
    val scored = big.as("b")
      .join(uni.as("uni"), col("b.tok") === col("uni.tok"))
      .join(ctx.as("ctx"), col("b.prev") === col("ctx.prev"))
      .join(bg.as("bg"),
        col("b.prev") === col("bg.prev") && col("b.tok") === col("bg.tok"))
      .crossJoin(broadcast(n))
      .select(col("b.doc_id").as("doc_id"), col("b.pos").as("pos"),
        log(lit(0.8) * col("bg.cnt") / col("ctx.cnt") +
          lit(0.2) * col("uni.cnt") / col("total")).as("lp"))
    scored.groupBy("doc_id")
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("lp")))),
        s => s("lp")).as("lps"))
      .select(col("doc_id"),
        round(aggregate(col("lps"), lit(0.0), (a, x) => a + x) /
          size(col("lps")), 4).as("mean_bigram_logprob"))
      .orderBy("doc_id")
  }
}
