package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.Text

/** Corpus-level text analytics for training-data pipelines — all
  * single-shuffle aggregations over codegen'd string expressions.
  */
object TextAnalytics {

  /** Redact emails and phone-like numbers. RE2-compatible patterns so
    * the same regexes run in any engine. */
  def redactPii(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\b\\d{3}[-. ]\\d{4}\\b"
    regexp_replace(regexp_replace(c, email, "<EMAIL>"), phone, "<PHONE>")
  }

  /** C4-style heuristic cleaning (Raffel et al. 2020, "Exploring the
    * Limits of Transfer Learning...", §2.2 — the web-scale curation
    * rules behind the C4 corpus), line- and page-level:
    *
    *  LINE rules (a line survives iff ALL hold):
    *   - ends in a terminal punctuation mark (. ! ? or closing quote)
    *   - has at least `minLineWords` words
    *   - does not mention "javascript" (case-insensitive)
    *  PAGE rules (keep_doc):
    *   - at least `minKeptLines` surviving lines
    *   - no "lorem ipsum" (case-insensitive), no '{' anywhere
    *
    * Output: (id, clean_text = surviving lines re-joined, n_lines,
    * n_kept, keep_doc). Pure per-row expressions — zero shuffles, the
    * whole pass pipelines inside the scan at any corpus size. Every
    * predicate is a plain string test (no regex), so the gate replays
    * it verbatim in SQL. The paper's remaining rules live elsewhere:
    * three-sentence-span dedup = [[Dedup.removeDuplicatedSpans]],
    * blocklist words = [[blockwordRatio]], language ID = Text.langId. */
  def c4Clean(df: DataFrame, idCol: String, textCol: String,
              minLineWords: Int = 3, minKeptLines: Int = 5): DataFrame = {
    val txt = coalesce(col(textCol), lit(""))
    val lines = split(txt, "\n")
    val keepLine = (l: org.apache.spark.sql.Column) => {
      val t = trim(l)
      substring(t, -1, 1).isin(".", "!", "?", "\"") &&
        size(filter(split(t, "\\s+"), w => w =!= "")) >= minLineWords &&
        !contains(lower(t), lit("javascript"))
    }
    val kept = filter(lines, keepLine)
    df.select(col(idCol),
      array_join(transform(kept, l => trim(l)), "\n").as("clean_text"),
      size(lines).as("n_lines"),
      size(kept).as("n_kept"),
      (size(kept) >= minKeptLines &&
        !contains(lower(txt), lit("lorem ipsum")) &&
        !contains(txt, lit("{"))).as("keep_doc"))
  }

  /** Blocklist-word exposure: fraction of a doc's tokens on `words`
    * (the C4 "bad words" page rule, reported as a RATE so the caller
    * picks the threshold — drop at > 0 for C4's rule, higher for
    * laxer policies). Pure scan-side expression; the list rides the
    * plan as a literal array (policy lists are hundreds of words —
    * metadata-scale). */
  def blockwordRatio(c: org.apache.spark.sql.Column,
                     words: Seq[String]): org.apache.spark.sql.Column = {
    val toks = Text.tokens(Text.normalizeText(c))
    when(size(toks) === 0, lit(0.0))
      .otherwise(round(
        size(filter(toks, t => t.isin(words.map(lit(_)): _*))).cast("double") /
          size(toks).cast("double"), 6))
  }

  /** Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
    * Methods, Analysis & Insights from Training Gopher", Appendix A —
    * the other canonical web-curation rule set beside [[c4Clean]]).
    * Per-doc metrics in exact integer MICRO-units (count*1e6 DIV
    * denominator — the repo's bit-stable cross-engine mean; no double
    * division anywhere) plus the combined `keep_doc` verdict:
    *
    *   - `n_words` in [minWords, maxWords]        (paper: 50..100k)
    *   - `mean_len_micro` in [3e6, 10e6]          (mean word length 3..10)
    *   - `symbol_micro` <= 1e5                    (#/ellipsis per word <= 0.1)
    *   - `bullet_micro` < 9e5                     (<90% lines bullet-led)
    *   - `ellipsis_micro` < 3e5                   (<30% lines ...-ended)
    *   - `alpha_micro` >= 8e5                     (>=80% words have a letter)
    *   - `required_hits` >= minRequired           (>=2 of the 8 stop words)
    *   - `dup_line_micro` <= 3e5                  (repetition: dup lines <=30%)
    *
    * Pure per-row expressions — zero shuffles, pipelines inside the
    * scan at any corpus size; every metric is integer arithmetic over
    * plain string tests, so the gate replays it verbatim. Gopher's
    * duplicate-N-GRAM repetition screens are corpus-level operators
    * here: [[repetitionRatio]] (q47) and Dedup's q57/q59 machinery. */
  def gopherFilter(df: DataFrame, idCol: String, textCol: String,
                   minWords: Int = 50, maxWords: Int = 100000,
                   minRequired: Int = 2): DataFrame = {
    val M = 1000000L
    val txt = coalesce(col(textCol), lit(""))
    val toks = Text.tokens(txt)
    val nW = size(toks).cast("long")
    val sumLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    // non-overlapping occurrence counts via length deltas (integer-exact)
    val nHash = (length(txt) - length(replace(txt, lit("#"), lit("")))).cast("long")
    val nEll = floor((length(txt) -
      length(replace(txt, lit("..."), lit("")))).cast("long") / 3).cast("long")
    val alphaW = size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long")
    val required = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val hits = size(array_intersect(
      array_distinct(transform(toks, t => lower(t))),
      array(required.map(lit(_)): _*))).cast("long")
    val lines = filter(transform(split(txt, "\n"), l => trim(l)), l => l =!= "")
    val nL = size(lines).cast("long")
    val bulletL = size(filter(lines,
      l => substring(l, 1, 1).isin("-", "*", "•"))).cast("long")
    val ellL = size(filter(lines,
      l => substring(l, -3, 3) === "..." || substring(l, -1, 1) === "…"))
      .cast("long")
    val dupL = nL - size(array_distinct(lines)).cast("long")
    // raw integer counts first, then micro-unit DIVs by NAME (the SQL
    // `div` operator is the only bit-stable integer mean both engines
    // share — double division would reintroduce low-bit drift)
    val base = df.select(col(idCol), nW.as("n_words"), sumLen.as("sum_len"),
      (nHash + nEll).as("n_sym"), alphaW.as("alpha_w"), hits.as("required_hits"),
      nL.as("n_lines"), bulletL.as("bullet_l"), ellL.as("ell_l"), dupL.as("dup_l"))
    def perM(num: String, den: String) =
      expr(s"CASE WHEN $den = 0 THEN 0 ELSE ($num * $M) div $den END")
    base.select(col(idCol), col("n_words"),
        perM("sum_len", "n_words").as("mean_len_micro"),
        perM("n_sym", "n_words").as("symbol_micro"),
        perM("bullet_l", "n_lines").as("bullet_micro"),
        perM("ell_l", "n_lines").as("ellipsis_micro"),
        perM("alpha_w", "n_words").as("alpha_micro"),
        col("required_hits"),
        perM("dup_l", "n_lines").as("dup_line_micro"))
      .withColumn("keep_doc",
        col("n_words") >= minWords && col("n_words") <= maxWords &&
          col("mean_len_micro") >= 3L * M && col("mean_len_micro") <= 10L * M &&
          col("symbol_micro") <= M / 10 &&
          col("bullet_micro") < M * 9 / 10 &&
          col("ellipsis_micro") < M * 3 / 10 &&
          col("alpha_micro") >= M * 8 / 10 &&
          col("required_hits") >= minRequired &&
          col("dup_line_micro") <= M * 3 / 10)
  }

  /** Strip HTML to text: script/style blocks dropped wholesale, tags
    * removed, the five standard entities unescaped, whitespace
    * collapsed. RE2-compatible patterns ((?is) flags, non-greedy, no
    * lookaround) so the identical regex chain runs in DuckDB/RE2 and
    * Java — the boilerplate-removal front door of a crawl pipeline
    * (a trafilatura-class extractor plugs in upstream when layout
    * heuristics are needed; this is the dependency-free floor). */
  /** Entity table shared by the Column API and the SQL-surface
    * catalyst builder (GraftExtensions) — amp LAST, so "&amp;lt;"
    * stays the literal text "&lt;". */
  val htmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  val htmlBlockPattern = "(?is)<(script|style)[^>]*>.*?</(script|style)>"
  val htmlTagPattern = "(?s)<[^>]*>"

  def stripHtml(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val noBlocks = regexp_replace(c, htmlBlockPattern, " ")
    val noTags = regexp_replace(noBlocks, htmlTagPattern, " ")
    val unescaped = htmlEntities
      .foldLeft(noTags) { case (acc, (e, v)) => replace(acc, lit(e), lit(v)) }
    trim(regexp_replace(unescaped, "\\s+", " "))
  }

  /** Sliding-window document chunker — the embedding/retrieval
    * ingestion front door: each doc becomes overlapping windows of
    * `chunkTokens` whitespace tokens advancing by `stride`
    * (overlap = chunkTokens - stride), the shape every
    * embed-then-index pipeline feeds its encoder. Chunk count is
    * 1 + ceil(max(0, n - chunkTokens) / stride) — windows stop once
    * one reaches the end of the doc, so no chunk is a strict suffix
    * of its predecessor (the HF `return_overflowing_tokens` + stride
    * convention). Zero-token docs emit nothing.
    *
    * Output: (id, chunk_idx, n_chunk_tokens, chunk_text) with
    * chunk_text the window re-joined by single spaces (chunking is
    * tokenized — original whitespace is not preserved; pair with the
    * doc table by id when raw offsets matter). Pure per-row
    * explode — no shuffle anywhere; at 100 TB the pass stays inside
    * the scan and output parallelism is input parallelism. Unlike
    * [[graft.operators.Sampling.packChunks]]/packSequences (which
    * pack the CORPUS into fixed training rows across doc boundaries),
    * this is per-doc windowing for retrieval/embedding. */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
                chunkTokens: Int = 128, stride: Int = 96): DataFrame = {
    require(chunkTokens > 0 && stride > 0 && stride <= chunkTokens,
      "need 0 < stride <= chunkTokens")
    val base = df.select(col(idCol),
        Text.tokens(coalesce(col(textCol), lit(""))).as("toks"))
      .withColumn("n", size(col("toks")).cast("long"))
      .where(col("n") > 0L)
      // integer ceil by NAME (div — no double division)
      .withColumn("n_chunks",
        expr(s"1 + (CASE WHEN n > $chunkTokens THEN n - $chunkTokens ELSE 0 END" +
          s" + ${stride - 1}) div $stride"))
    base.select(col(idCol), col("toks"), col("n"),
        posexplode(expr(s"sequence(0L, (n_chunks - 1) * ${stride}L, ${stride}L)"))
          .as(Seq("chunk_idx", "off")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        least(lit(chunkTokens.toLong), col("n") - col("off")).as("n_chunk_tokens"),
        array_join(slice(col("toks"), col("off").cast("int") + 1, lit(chunkTokens)), " ")
          .as("chunk_text"))
  }

  /** The common UTF-8-read-as-cp1252 double-encodings (mojibake),
    * DERIVED from the actual encoding round-trip: each repaired
    * character's UTF-8 bytes decoded as windows-1252 (Java maps the
    * five undefined cp1252 bytes to their C1 controls, which is what
    * survives in real scraped text, e.g. U+201D becomes "\u00e2\u20ac"
    * + U+009D), so no entry can be hand-typo'd. All corrupted forms
    * are 2-3 chars starting with \u00e2/\u00c3/\u00c2 and no form is a
    * prefix of another, so chain order is irrelevant. Public: the
    * gate generates its DuckDB replace chain from this SAME table,
    * making query/oracle drift impossible. */
  val mojibakeTable: Seq[(String, String)] = Seq(
    // smart punctuation (E2 80 xx family) + euro
    '\u2019', '\u2018', '\u201c', '\u201d', '\u2013', '\u2014',
    '\u2026', '\u2022', '\u20ac',
    // Latin-1 letters (C3 xx family)
    '\u00e9', '\u00e8', '\u00e1', '\u00e0', '\u00f3', '\u00ed',
    '\u00fa', '\u00f1', '\u00fc', '\u00f6', '\u00e4', '\u00e7',
    '\u00ef', '\u00eb', '\u00df',
    // symbols incl. NBSP (C2 xx family)
    '\u00ab', '\u00bb', '\u00b0', '\u00b7', '\u00a0'
  ).map { ch =>
    new String(ch.toString.getBytes("UTF-8"), "windows-1252") -> ch.toString
  }

  /** Repair mojibake: scraped corpora are full of UTF-8 text that was
    * decoded as cp1252 and re-encoded ("itâ€™s", "naÃ¯ve", "â€”") —
    * these sequences defeat tokenizers, dedup keys, and language ID.
    * Applies [[mojibakeTable]] as a literal replace chain (the ftfy
    * floor: the high-frequency deterministic repairs, no statistical
    * decoding). Pure scan-side expression, zero shuffles. */
  def fixMojibake(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    mojibakeTable.foldLeft(c) { case (acc, (bad, good)) =>
      replace(acc, lit(bad), lit(good)) }

  /** Count of mojibake sequences present (pre-repair) — the FILTER
    * signal: a high count marks a doc whose source encoding is
    * damaged beyond these repairs. Integer-exact via length deltas. */
  def mojibakeCount(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    mojibakeTable.map { case (bad, _) =>
      ((length(c) - length(replace(c, lit(bad), lit("")))) / bad.length)
        .cast("long")
    }.reduce(_ + _)

  /** HyperLogLog register table per key — the mergeable fixed-RAM
    * cardinality sketch (Flajolet et al. 2007): per-key vocabulary
    * size at 100 TB where COUNT(DISTINCT) would shuffle every token.
    * m = 2^p registers/key; register j holds the max over hashed
    * values landing in bucket j of (leading-zero count of the
    * remaining 60-p hash bits) + 1. Shuffle is keys-only, bounded by
    * |keys|·m rows regardless of corpus size, with map-side partial
    * max; shard sketches MERGE by cell-wise register max
    * (linearity spec'd). Portability: the md5-derived 60-bit hash and
    * rank-via-`bin()`-length (both engines print minimal binary)
    * replay register-for-register in DuckDB. */
  def hllRegisters(df: DataFrame, keyCol: String, valueCol: String,
                   p: Int = 10): DataFrame = {
    require(p >= 4 && p <= 16, "p must be in [4, 16]")
    val m = 1L << p
    val h = graft.functions.Hashes.md5Hash64(col(valueCol))
    // h div m, NOT floor(h/m): double division is lossy above 2^53
    df.select(col(keyCol).as("key"), h.as("h"))
      .select(col("key"), pmod(col("h"), lit(m)).as("bucket"),
        expr(s"h div ${m}L").as("v"))
      .withColumn("rank",
        when(col("v") === 0L, lit(60 - p + 1))
          .otherwise(lit(60 - p + 1) - length(bin(col("v")))))
      .groupBy("key", "bucket")
      .agg(max("rank").as("r"))
  }

  /** HLL cardinality estimates from [[hllRegisters]] output: per key,
    * (key, n_regs, est_floor) where est = alpha_m·m²/Σ2^(−M_j)
    * (absent registers contribute 2^0). The harmonic sum is an
    * ORDERED fold over bucket-sorted registers and every term is a
    * power of two (FP-exact), so the estimate is bit-identical across
    * engines; floor-quantized output. The standard small-range
    * LinearCounting correction needs ln() (not bit-stable
    * cross-engine) — apply it caller-side when |keys| is small; the
    * raw estimate here is within ~1.04/sqrt(m) rel. error outside
    * that regime. */
  def hllEstimate(regs: DataFrame, p: Int = 10): DataFrame = {
    val m = 1L << p
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    regs.groupBy("key")
      .agg(count(lit(1)).as("n_regs"),
        aggregate(array_sort(collect_list(struct(col("bucket"), col("r")))),
          lit(0.0), (acc, x) => acc + pow(lit(2.0), -x.getField("r"))).as("s"))
      .select(col("key"), col("n_regs"),
        floor(lit(alpha * m * m) /
          (col("s") + (lit(m) - col("n_regs")).cast("double")))
          .cast("long").as("est_floor"))
  }

  /** Most frequent lowercase tokens across the corpus: (term, n),
    * top `n` by count desc then term asc. Map-side partial counts →
    * one shuffle; the limit is a TakeOrdered, no global sort. */
  def topTerms(df: DataFrame, textCol: String, n: Int): DataFrame =
    df.select(explode(Text.tokens(lower(col(textCol)))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term").asc)
      .limit(n)

  /** Lightweight suffix-stripping stemmer (Porter step-1-flavoured)
    * as a pure Column expression — collapses plural/participle
    * variants so term statistics aggregate per stem instead of per
    * surface form. Deliberately rule-exact rather than linguistically
    * complete: two fixed CASE passes over `ends_with`/`left`, every
    * rule replayable verbatim in any SQL engine (no regex captures,
    * no lookbehind — the portability constraint). Pass 1 plurals:
    * sses→ss, ies→i, ss kept, s dropped (len ≥ 4); pass 2 suffixes:
    * ing dropped (len ≥ 6), ed (len ≥ 5), ly (len ≥ 5). */
  def stemLite(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def drop(x: org.apache.spark.sql.Column, k: Int) =
      x.substr(lit(1), length(x) - lit(k))
    val p1 = when(c.endsWith("sses"), drop(c, 2))
      .when(c.endsWith("ies"), drop(c, 2))
      .when(c.endsWith("ss"), c)
      .when(c.endsWith("s") && length(c) >= 4, drop(c, 1))
      .otherwise(c)
    when(p1.endsWith("ing") && length(p1) >= 6, drop(p1, 3))
      .when(p1.endsWith("ed") && length(p1) >= 5, drop(p1, 2))
      .when(p1.endsWith("ly") && length(p1) >= 5, drop(p1, 2))
      .otherwise(p1)
  }

  /** [[topTerms]] over stems: lowercase whitespace tokens, punctuation
    * stripped at the edges (`[^a-z0-9]` — same character-class regex
    * in Java and RE2), [[stemLite]] applied, then count desc / stem
    * asc top `n`. Map-side partial counts → one shuffle → TakeOrdered. */
  def stemmedTopTerms(df: DataFrame, textCol: String, n: Int): DataFrame =
    df.select(explode(Text.tokens(lower(col(textCol)))).as("w"))
      .select(regexp_replace(col("w"),
        "^[^a-z0-9]+|[^a-z0-9]+$", "").as("w"))
      .where(col("w") =!= "")
      .select(stemLite(col("w")).as("stem"))
      .groupBy("stem").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("stem").asc)
      .limit(n)

  /** Adjacent-token bigram counts with a minimum frequency. */
  def bigramCounts(df: DataFrame, textCol: String, minCount: Long): DataFrame =
    df.select(explode(graft.plans.native.wordShingles(col(textCol), 2)).as("bigram"))
      .groupBy("bigram")
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)

  /** Benchmark-contamination scan: which documents contain which
    * needle phrases (broadcast needles — the list is tiny, the corpus
    * is not; no shuffle of the corpus). */
  def contamination(df: DataFrame, idCol: String, textCol: String,
                    needles: Seq[String]): DataFrame = {
    val needleCol = explode(array(needles.map(lit): _*)).as("needle")
    df.select(col(idCol), lower(col(textCol)).as("t"))
      .select(col(idCol), col("t"), needleCol)
      .where(col("t").contains(col("needle")))
      .drop("t")
  }

  /** Linear quality-classifier INFERENCE in exact integer micro-units —
    * the fastText / logistic-regression filtering pass every curation
    * pipeline runs after training a small model offline (weights come
    * from the caller; this is the serving side). Features are plain
    * integer counts over the text (n_tokens, n_chars, n_punct,
    * n_stopwords — the same primitives as [[graft.functions.Text]]'s
    * quality heuristic), weights and bias are longs in micro-units
    * (1e-6), and
    *   logit_micro = bias + w_tok·f_tok + w_chr·f_chr + w_pun·f_pun + w_stp·f_stp
    * is exact 64-bit arithmetic — so the decision boundary replays
    * bit-for-bit in any engine (`keep` = logit_micro >= 0, i.e. the
    * sigmoid-0.5 threshold WITHOUT evaluating a sigmoid; probability
    * callers apply it downstream). Scan-shaped: per-row codegen
    * expressions, no shuffle, no UDF — classifier filtering at 100 TB
    * costs exactly one corpus pass.
    * Output: (id, n_tokens, n_chars, n_punct, n_stopwords,
    * logit_micro, keep). */
  def linearQualityScore(df: DataFrame, idCol: String, textCol: String,
                         wTokens: Long, wChars: Long, wPunct: Long,
                         wStopwords: Long, biasMicro: Long): DataFrame = {
    val t = col(textCol)
    df.select(col(idCol),
        Text.tokenCount(t).cast("long").as("n_tokens"),
        length(t).cast("long").as("n_chars"),
        Text.punctCount(t).cast("long").as("n_punct"),
        Text.stopwordCount(t).cast("long").as("n_stopwords"))
      .withColumn("logit_micro",
        lit(biasMicro)
          + col("n_tokens") * wTokens + col("n_chars") * wChars
          + col("n_punct") * wPunct + col("n_stopwords") * wStopwords)
      .withColumn("keep", col("logit_micro") >= 0L)
  }

  /** Intra-document repetition ratio: 1 − |distinct units| / |units|,
    * where a unit is a token (default) or any regex-split segment
    * (lines, sentences). The standard Gopher/C4-style quality signal
    * for boilerplate and keyword-stuffed documents; 0 for empty text.
    * Pure per-row expression — runs in the scan, no shuffle. */
  def repetitionRatio(c: org.apache.spark.sql.Column,
                      splitRegex: String = "\\s+"): org.apache.spark.sql.Column = {
    val units = filter(split(trim(lower(c)), splitRegex), u => u =!= "")
    when(size(units) === 0, lit(0.0))
      .otherwise(lit(1.0) -
        size(array_distinct(units)).cast("double") / size(units).cast("double"))
  }

  /** Domains of http(s) URLs in a text column (RE2-portable pattern) —
    * the per-document extraction behind domain-level corpus curation
    * (allowlists, per-domain caps, dedup by canonical URL). */
  def urlDomains(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_extract_all(lower(c), lit("https?://([a-z0-9.-]+)"), lit(1))

  /** Per-domain document counts over the corpus: explode the (few)
    * domains per document, one shuffle of (domain) keys. */
  def domainStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(array_distinct(urlDomains(col(textCol)))).as("domain"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"))

  /** Count-min sketch over corpus tokens (Cormode & Muthukrishnan
    * 2005): d hash rows × `width` columns of counts — fixed-RAM
    * frequency estimation whose state size is INDEPENDENT of corpus
    * and vocabulary size (vs topTerms' exact per-term counts). The
    * build is explode → (row, col)-keyed count: the shuffle carries at
    * most d·width distinct keys (map-side combined), metadata-scale
    * regardless of corpus size, and sketches from corpus shards merge
    * by cell-wise addition (counts are linear). Point estimates
    * overcount only (min over d rows bounds collision error by
    * ~tokens/width per row). md5-derived hashing, so the gate oracle
    * replays cell-for-cell. Returns (row, col, c) — only nonzero
    * cells. */
  def countMinSketch(df: DataFrame, textCol: String,
                     d: Int = 4, width: Int = 1024): DataFrame = {
    require(d > 0 && width > 0, "d and width must be positive")
    df.select(explode(Text.tokens(Text.normalizeText(col(textCol)))).as("tok"))
      .select(explode(array((0 until d).map(i => struct(
        lit(i).as("row"),
        pmod(graft.functions.Hashes.md5Hash64(
          concat(lit(s"$i|"), col("tok"))), lit(width.toLong)).as("col"))): _*))
        .as("rc"))
      .groupBy(col("rc.row").as("row"), col("rc.col").as("col"))
      .agg(count(lit(1)).as("c"))
  }

  /** Point estimates for `terms` against a count-min sketch built with
    * the same (d, width): est(term) = min over rows of the term's cell
    * count (0 when a cell is empty). The sketch is d·width rows at
    * most — broadcast side; never an estimate under the true count. */
  def cmsEstimate(sketch: DataFrame, terms: Seq[String],
                  d: Int = 4, width: Int = 1024): DataFrame = {
    val spark = sketch.sparkSession
    import spark.implicits._
    val probes = terms.toDF("term")
      .select(col("term"), explode(array((0 until d).map(i => struct(
        lit(i).as("row"),
        pmod(graft.functions.Hashes.md5Hash64(
          concat(lit(s"$i|"), col("term"))), lit(width.toLong)).as("col"))): _*))
        .as("rc"))
      .select(col("term"), col("rc.row").as("row"), col("rc.col").as("col"))
    probes.join(broadcast(sketch), Seq("row", "col"), "left")
      .groupBy("term")
      .agg(min(coalesce(col("c"), lit(0L))).as("est"))
  }

  /** Join-size estimation from two count-min sketches — the classic
    * sketch inner product a query planner uses to cost an equi-join
    * WITHOUT touching either side's rows: true size Σ_v fA(v)·fB(v)
    * is never overestimated BELOW by est = min over hash rows of
    * Σ_col cA·cB (each row's dot product adds only non-negative
    * collision mass, so every row upper-bounds the truth and min
    * tightens it). Both sketches must share (d, width) and the
    * [[countMinSketch]] hash family. The join is cell-keyed —
    * d·width cells a side at most, metadata-scale; products through
    * DECIMAL(38,0). Output: (row, dot, join_size_est) — one row per
    * hash row (absent rows dot 0), est repeated as the headline. */
  def cmsJoinSize(a: DataFrame, b: DataFrame, d: Int = 4): DataFrame = {
    require(d > 0, "d must be positive")
    val spark = a.sparkSession
    import spark.implicits._
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val perRow = a.select(col("row"), col("col"), col("c").as("ca"))
      .join(b.select(col("row"), col("col"), col("c").as("cb")),
        Seq("row", "col"))
      .groupBy("row")
      .agg(sum(col("ca").cast(dec) * col("cb").cast(dec)).cast("long")
        .as("dot"))
    val spine = (0 until d).map(_.toLong).toDF("row")
    val filled = broadcast(spine).join(perRow, Seq("row"), "left")
      .select(col("row"), coalesce(col("dot"), lit(0L)).as("dot"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val est = filled.agg(min("dot").as("join_size_est"))
    filled.crossJoin(broadcast(est))
  }

  /** Log-template mining (Drain-lite): collapse a message stream into
    * its structural templates — messages group by token COUNT (the
    * Drain first-level heuristic), and within a group each token
    * position either holds one constant token (kept) or varies
    * (wildcarded to `<*>`). The inventory-of-shapes view an ingest
    * pipeline runs over raw logs before writing parsers. Only the
    * first `maxTokens` positions are analyzed; longer messages keep
    * their full count as the group key and carry a trailing `<…>`
    * marker. Deterministic: the per-position decision is a distinct
    * count (= 1 ⇒ constant), the rebuild is position-ordered.
    *
    * Scale: one posexplode bounded by maxTokens per message, one
    * (group, pos, token)-keyed aggregate, one (group, pos) distinct
    * fold, one ordered rebuild over ≤ maxTokens cells per group — no
    * message-scale windows. Output: (n_tokens, n_messages, template)
    * ordered by n_tokens downstream. */
  def mineTemplates(df: DataFrame, idCol: String, textCol: String,
                    maxTokens: Int = 16): DataFrame = {
    require(maxTokens >= 1, s"need maxTokens >= 1, got $maxTokens")
    val toks = Text.tokens(lower(col(textCol)))
    val base = df
      .select(col(idCol).as("__id"), toks.as("__toks"))
      .where(size(col("__toks")) > 0)
      .select(col("__id"), size(col("__toks")).cast("long").as("n_tokens"),
        slice(col("__toks"), 1, maxTokens).as("__head"))
    val nMsg = base.groupBy("n_tokens")
      .agg(count(lit(1)).as("n_messages"))
    val cells = base
      .select(col("n_tokens"), posexplode(col("__head")).as(Seq("pos", "tok")))
      .groupBy("n_tokens", "pos")
      .agg(count_distinct(col("tok")).as("nd"),
        min("tok").as("tok1"))
    val slots = cells.select(col("n_tokens"), col("pos"),
      when(col("nd") === 1, col("tok1")).otherwise(lit("<*>")).as("slot"))
    val rebuilt = slots.groupBy("n_tokens")
      .agg(array_join(array_sort(collect_list(struct(col("pos"), col("slot"))))
        .getField("slot"), " ").as("__tpl"))
    nMsg.join(rebuilt, Seq("n_tokens"))
      .select(col("n_tokens"), col("n_messages"),
        when(col("n_tokens") > maxTokens,
          concat(col("__tpl"), lit(" <…>"))).otherwise(col("__tpl"))
          .as("template"))
  }

  /** Canonical "same page" key for web-corpus URL dedup: lowercase,
    * strip fragment, query string, scheme, leading www., default
    * ports, and trailing slashes — the variants crawlers collect for
    * one page (tracking params, http/https, www mirrors) collapse to
    * one key. A sequential chain of effectively-anchored regexp
    * replaces with NO capture groups, so the identical chain replays
    * in any SQL engine (capture-group syntax differs across engines;
    * the port strip therefore uses literal replaces — a ':80/' inside
    * a path segment is out of scope for this heuristic). */
  def canonicalUrl(url: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val c0 = trim(lower(url))
    val c1 = regexp_replace(c0, "#.*$", "")
    val c2 = regexp_replace(c1, "\\?.*$", "")
    val c3 = regexp_replace(c2, "^https?://", "")
    val c4 = regexp_replace(c3, "^www\\.", "")
    val c5 = regexp_replace(
      replace(replace(c4, lit(":80/"), lit("/")), lit(":443/"), lit("/")),
      ":(80|443)$", "")
    regexp_replace(c5, "/+$", "")
  }

  /** URL dedup: one survivor (min id) per canonical URL —
    * (url_canon, id, n_dupes), the q15-exact-dedup posture keyed by
    * [[canonicalUrl]]. Shuffle payload is the canonical key + id. */
  def dedupByUrl(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(col(idCol), canonicalUrl(col(urlCol)).as("url_canon"))
      .groupBy("url_canon")
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dupes"))

  /** Graded n-gram contamination: fraction of a document's distinct
    * word n-grams that appear in the benchmark shingle set. Unlike the
    * binary containment scan, this scores partial overlap — the usual
    * decontamination threshold signal. Needles ride as an array
    * literal (broadcast-in-plan); zero corpus shuffle. */
  def ngramOverlap(df: DataFrame, idCol: String, textCol: String,
                   needleShingles: Seq[String], n: Int = 2): DataFrame = {
    val sh = array_distinct(graft.plans.native.wordShingles(col(textCol), n))
    val needleArr = array(needleShingles.map(lit): _*)
    df.select(col(idCol),
      when(size(sh) === 0, lit(0.0))
        .otherwise(round(
          size(array_intersect(sh, needleArr)).cast("double") /
            size(sh).cast("double"), 6)).as("overlap"))
  }

  /** Per-document n-gram NOVELTY against everything EARLIER in the
    * corpus: the fraction of a doc's distinct word-n-gram shingles
    * whose FIRST corpus occurrence (smallest doc id — "earlier" is
    * the deterministic id order, the ingestion order in a crawl
    * pipeline) is this document. Novelty ~1 = genuinely new content;
    * ~0 = restates what earlier docs already said — the ranking
    * signal for novelty-based subsampling and curriculum ordering
    * (the diversity-pruning family of Sorscher et al. 2022, "Beyond
    * neural scaling laws", applied at the n-gram level), far cheaper
    * than pairwise dedup because NO pair join exists:
    *
    * Scale shape: one shingle-keyed aggregate finds each shingle's
    * first owner, its (already shingle-cardinality) result
    * re-aggregates by owner into per-doc novel counts, and per-doc
    * totals come from a doc-keyed aggregate of the same scan — the
    * two doc-keyed frames then join at DOC cardinality. No
    * shingle-scale join, no posting lists, no window. Docs whose text
    * yields no shingles (NULL text) are absent; docs under n tokens
    * contribute their whole-text shingle (wordShingles contract).
    * Output: (doc_id, n_shingles, n_novel, novelty_micro =
    * n_novel·10⁶ ÷ n_shingles, truncating — non-negative, so Spark
    * DIV and DuckDB // agree exactly). */
  def ngramNovelty(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 3): DataFrame = {
    val sh = df.select(col(idCol).cast("long").as("doc_id"),
      explode(array_distinct(
        graft.plans.native.wordShingles(col(textCol), n))).as("sh"))
    val novel = sh.groupBy("sh").agg(min("doc_id").as("first_id"))
      .groupBy(col("first_id").as("doc_id"))
      .agg(count(lit(1)).as("n_novel"))
    sh.groupBy("doc_id").agg(count(lit(1)).as("n_shingles"))
      .join(novel, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        expr("CAST((COALESCE(n_novel, 0) * 1000000) DIV n_shingles AS BIGINT)")
          .as("novelty_micro"))
  }

  /** ngramOverlap's scale twin for LARGE decontamination sets (a full
    * eval-benchmark suite is millions of shingles — too big for an
    * in-plan literal). The needle set arrives as a DataFrame with a
    * `shingle` column; each document's exploded distinct shingles are
    * counted against it with a left-SEMI broadcast join (needles are
    * dimension-scale: broadcast once, corpus never shuffles for the
    * probe), then per-doc hit counts rejoin the doc's shingle total.
    * Same output contract as ngramOverlap — equality is spec-asserted
    * on a shared needle set. */
  def ngramOverlapLarge(df: DataFrame, idCol: String, textCol: String,
                        needles: DataFrame, n: Int = 2): DataFrame = {
    val needleSet = broadcast(needles.select(col("shingle")).distinct()
      .withColumn("__hit", lit(1)))
    // explode_outer keeps zero-shingle docs (one null-shingle row), so
    // the whole computation is ONE corpus pass: scan → broadcast probe
    // → per-doc aggregate (the only shuffle, keyed by doc id)
    df.select(col(idCol),
        array_distinct(graft.plans.native.wordShingles(col(textCol), n)).as("sh"))
      .select(col(idCol), size(col("sh")).as("n_sh"),
        explode_outer(col("sh")).as("shingle"))
      .join(needleSet, Seq("shingle"), "left")
      .groupBy(col(idCol), col("n_sh"))
      .agg(sum(coalesce(col("__hit"), lit(0))).as("n_hit"))
      .select(col(idCol),
        when(col("n_sh") === 0, lit(0.0))
          .otherwise(round(col("n_hit").cast("double") /
            col("n_sh").cast("double"), 6)).as("overlap"))
  }

  /** Bloom-filter twin of [[ngramOverlapLarge]] for decontamination
    * sets too large even for a broadcast JOIN (billions of shingles):
    * the needle set is folded ONCE into a fixed-RAM Bloom filter
    * (`df.stat.bloomFilter` — distributed build, OR-merged sketches),
    * and the corpus pass probes it per shingle with the codegen'd
    * BloomContains kernel — no join, no explode, no shuffle, not even
    * an aggregate: one projection over the scan. Overlap is an UPPER
    * bound on the exact score (false positives at `fpp`, never false
    * negatives) — the right direction for contamination screening;
    * route flagged docs through [[ngramOverlapLarge]] to confirm. */
  def ngramOverlapBloom(df: DataFrame, idCol: String, textCol: String,
                        needles: DataFrame, n: Int = 2,
                        expectedItems: Long = 0L,
                        fpp: Double = 0.001): DataFrame = {
    val distinctNeedles = needles.select(col("shingle")).distinct()
    val items = if (expectedItems > 0) expectedItems else distinctNeedles.count()
    val bloom = distinctNeedles.stat.bloomFilter("shingle", math.max(items, 1L), fpp)
    df.select(col(idCol),
        array_distinct(graft.plans.native.wordShingles(col(textCol), n)).as("sh"))
      .select(col(idCol), size(col("sh")).as("n_sh"),
        size(filter(col("sh"),
          s => graft.plans.native.bloomContains(s, bloom))).as("n_hit"))
      .select(col(idCol),
        when(col("n_sh") === 0, lit(0.0))
          .otherwise(round(col("n_hit").cast("double") /
            col("n_sh").cast("double"), 6)).as("overlap"))
  }

  /** Bit positions a value sets in a portable Bloom filter of `mBits`
    * bits with `k` probes — the cross-engine-replayable twin of
    * [[ngramOverlapBloom]]'s Murmur3 sketch (same role q127's
    * register-exact HLL plays for approx_count_distinct). Double
    * hashing (Kirsch–Mitzenmacher 2006): the 60-bit md5 hash splits
    * into h1 = h mod 2^30 and an odd stride h2 = (h div 2^30) with the
    * low bit forced on; probe i lands on (h1 + i·h2) mod mBits. All
    * arithmetic stays below 2^35 so it is ANSI-overflow-free and
    * replays integer-exact in DuckDB. */
  private def bloomPositions(h: org.apache.spark.sql.Column, mBits: Int,
                             k: Int): org.apache.spark.sql.Column = {
    val h1 = pmod(h, lit(1L << 30))
    // h is a nonnegative 60-bit value, so unsigned shift IS div 2^30
    // (integral — Column `/` would round-trip through double and lose
    // bits above 2^53); forcing the low bit makes the stride odd.
    val h2raw = shiftrightunsigned(h, 30)
    val h2 = h2raw - pmod(h2raw, lit(2L)) + lit(1L)
    transform(sequence(lit(0), lit(k - 1)),
      i => pmod(h1 + i.cast("long") * h2, lit(mBits.toLong)))
  }

  /** Build the portable Bloom filter over the distinct values of
    * `valueCol`: a sparse (word, bits) table — word w holds the OR of
    * 1L<<(pos mod 64) for every set position with pos div 64 = w. The
    * build is one distinct + one word-keyed BIT_OR aggregate, both
    * map-side-combining; output is metadata-scale (≤ mBits/64 rows
    * regardless of corpus size). Shard sketches built over splits of
    * the value set MERGE by cell-wise BIT_OR ([[bloomMerge]]) — the
    * same associative-merge contract as the HLL (max) and CMS (add)
    * stores, spec'd in TextAnalyticsSpec. */
  /** The 60-bit nonnegative hash feeding the Bloom positions:
    * `portable = true` is the md5 chain DuckDB replays digit-for-digit
    * (gate mode); `portable = false` is codegen'd xxhash64 masked to
    * 60 bits — ~10x cheaper per probe, for production paths where
    * nothing downstream replays the bits (e.g. [[Joins.bloomSemiJoin]],
    * whose exact join makes the result hash-independent). Build and
    * probe must use the SAME mode. */
  private[operators] def bloomHash(c: org.apache.spark.sql.Column,
                                   portable: Boolean): org.apache.spark.sql.Column =
    if (portable) graft.functions.Hashes.md5Hash64(c)
    else xxhash64(c).bitwiseAND(lit((1L << 60) - 1))

  def bloomBuild(values: DataFrame, valueCol: String, mBits: Int,
                 k: Int, portableHash: Boolean = true): DataFrame = {
    require(mBits > 0 && mBits % 64 == 0, "mBits must be a positive multiple of 64")
    require(k >= 1 && k <= 16, "k must be in [1, 16]")
    values.select(col(valueCol).as("v")).distinct()
      .select(explode(bloomPositions(
        bloomHash(col("v"), portableHash), mBits, k)).as("pos"))
      .distinct()
      .select(expr("pos div 64").as("word"),
        call_function("shiftleft", lit(1L), pmod(col("pos"), lit(64L)).cast("int"))
          .as("mask"))
      .groupBy("word").agg(bit_or(col("mask")).as("bits"))
  }

  /** Merge two Bloom shards (same mBits/k): cell-wise OR. */
  def bloomMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("word").agg(bit_or(col("bits")).as("bits"))

  /** Collect a built Bloom into the dense Array[Long] probe form —
    * driver metadata (mBits/64 longs: 16 KiB at 2^20 bits, 16 MiB at
    * 2^30; beyond that probe against the (word, bits) table with a
    * join instead of this literal form). */
  def bloomWords(bloom: DataFrame, mBits: Int): Array[Long] = {
    val words = new Array[Long](mBits / 64)
    bloom.collect().foreach { r =>
      words(r.getLong(0).toInt) = r.getLong(1)
    }
    words
  }

  /** Membership probe against the dense word array: true iff all `k`
    * probe bits are set. The word array rides the plan as ONE
    * ArrayType literal (broadcast with the closure, never shuffled)
    * and the test is a forall over k positions — a pure projection in
    * WholeStageCodegen: no join, no shuffle, no aggregate. False
    * positives at the sized rate, never false negatives — the right
    * direction for decontamination screening (route flagged docs
    * through [[ngramOverlapLarge]] to confirm). Pass a pre-computed
    * md5 hash column to probe many shingles per row without re-hashing. */
  def bloomMightContainHash(h: org.apache.spark.sql.Column, words: Array[Long],
                            mBits: Int, k: Int): org.apache.spark.sql.Column = {
    require(words.length == mBits / 64, "words must be the dense mBits/64 array")
    val wlit = typedLit(words.toSeq)
    // UNROLLED probes (k is a plan-time constant), not a forall over
    // bloomPositions: higher-order functions are CodegenFallback, so
    // the HOF form interprets the whole predicate per row and
    // re-evaluates the md5 chain inside every lambda (~15x per row —
    // measured 13x slower on a 600k-row probe). The unrolled AND
    // chain stays in WholeStageCodegen where subexpression
    // elimination computes h1/h2 (and any md5 feeding them) once.
    val h1 = pmod(h, lit(1L << 30))
    val h2raw = shiftrightunsigned(h, 30)
    val h2 = h2raw - pmod(h2raw, lit(2L)) + lit(1L)
    (0 until k).map { i =>
      val pos = pmod(h1 + lit(i.toLong) * h2, lit(mBits.toLong))
      element_at(wlit, (shiftrightunsigned(pos, 6) + lit(1L)).cast("int"))
        .bitwiseAND(call_function("shiftleft", lit(1L),
          pmod(pos, lit(64L)).cast("int"))) =!= 0L
    }.reduce(_ && _)
  }

  /** [[bloomMightContainHash]] over a raw value column; `portableHash`
    * must match the build's. */
  def bloomMightContain(value: org.apache.spark.sql.Column, words: Array[Long],
                        mBits: Int, k: Int,
                        portableHash: Boolean = true): org.apache.spark.sql.Column =
    bloomMightContainHash(bloomHash(value, portableHash), words, mBits, k)

  /** Top-`k` collocations by pointwise mutual information — the
    * corpus-statistics signal for multi-word expressions ("new york",
    * "machine learning"): raw bigram counts surface "of the"; PMI =
    * ln(p(ab) / (p(a)·p(b))) surfaces pairs that co-occur far above
    * chance, which is what vocabulary curation and tokenizer-merge
    * auditing want. `minCount` guards the classic PMI pathology
    * (hapax pairs score highest).
    *
    * Scale shape: one strict-adjacent-bigram count and one unigram
    * count (both keys-only, map-side combined); the two probability
    * joins are token-CO-KEYED against the vocabulary-scale unigram
    * frame (never a literal); the final cut is a bounded TakeOrdered.
    * The corpus text itself is scanned once and never shuffled. The
    * only driver scalars are the two grand totals.
    *
    * Integer MICRO-NAT scores (the q63 discipline) with the ln
    * argument evaluated in the FIXED order (c_ab / N_bi) / ((c_a /
    * N_uni) * (c_b / N_uni)) — mirrored by the oracle. Output:
    * (bigram, c_ab, c_a, c_b, pmi_micro) by (pmi desc, bigram asc). */
  def pmiCollocations(df: DataFrame, textCol: String, minCount: Long,
                      k: Int): DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    require(k >= 1, "k must be >= 1")
    val toks = df.select(
      filter(graft.plans.native.wordShingles(col(textCol), 1), t => t =!= "")
        .as("tk"))
    val bgArr = {
      val tk = col("tk")
      when(size(tk) < 2, array().cast("array<string>"))
        .otherwise(zip_with(
          slice(tk, lit(1), size(tk) - 1),
          slice(tk, lit(2), size(tk) - 1),
          (a, b) => concat(a, lit(" "), b)))
    }
    val uni = toks.select(explode(col("tk")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
    val big = toks.select(explode(bgArr).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c_ab"))
    val nUni = uni.agg(coalesce(sum("c"), lit(0L))).head().getLong(0)
    val nBi = big.agg(coalesce(sum("c_ab"), lit(0L))).head().getLong(0)
    if (nBi == 0 || nUni == 0)
      return big.select(col("bg").as("bigram"), col("c_ab"),
        lit(0L).as("c_a"), lit(0L).as("c_b"), lit(0L).as("pmi_micro"))
        .limit(0)
    val pmiMicro = round(lit(1e6) *
      log((col("c_ab") / lit(nBi.toDouble)) /
        ((col("c_a") / lit(nUni.toDouble)) *
         (col("c_b") / lit(nUni.toDouble))))).cast("long")
    big.where(col("c_ab") >= minCount)
      .join(uni.select(col("t"), col("c").as("c_a")),
        substring_index(col("bg"), " ", 1) === col("t"))
      .drop("t")
      .join(uni.select(col("t"), col("c").as("c_b")),
        substring_index(col("bg"), " ", -1) === col("t"))
      .drop("t")
      .select(col("bg").as("bigram"), col("c_ab"), col("c_a"), col("c_b"),
        pmiMicro.as("pmi_micro"))
      .orderBy(col("pmi_micro").desc, col("bigram").asc)
      .limit(k)
  }

  /** Log-likelihood-ratio collocations (Dunning 1993, "Accurate
    * methods for the statistics of surprise and coincidence") —
    * the SIGNIFICANCE-weighted companion of [[pmiCollocations]]: PMI
    * over-ranks rare pairs (two hapaxes that co-occur once score
    * maximal PMI); G² weighs the evidence, so frequent-but-strong
    * collocations rank first. Over the adjacent-bigram table with
    * first/second-position margins:
    *   G² = 2·(Σ_cells x·ln x − Σ_rows x·ln x − Σ_cols x·ln x
    *           + N·ln N)
    * (the entropy form; 0-count cells contribute 0). Counts are
    * exact integers; the ln terms evaluate in ONE documented
    * parenthesization and micro-round once, so any engine replays
    * the ranking. Same shuffle shape as PMI (bigram agg + two margin
    * joins). Output: (bigram, c_ab, c_a_first, c_b_second, g2_micro),
    * top `k` by (g2 desc, bigram asc). */
  def llrCollocations(df: DataFrame, textCol: String, minCount: Long,
                      k: Int): DataFrame = {
    require(minCount >= 1 && k >= 1, "minCount and k must be >= 1")
    val toks = df.select(
      filter(graft.plans.native.wordShingles(col(textCol), 1), t => t =!= "")
        .as("tk"))
    val bgArr = {
      val tk = col("tk")
      when(size(tk) < 2, array().cast("array<string>"))
        .otherwise(zip_with(
          slice(tk, lit(1), size(tk) - 1),
          slice(tk, lit(2), size(tk) - 1),
          (a, b) => concat(a, lit(" "), b)))
    }
    val big = toks.select(explode(bgArr).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("c_ab"))
      .localCheckpoint(false)
    val firsts = big.groupBy(substring_index(col("bg"), " ", 1).as("t"))
      .agg(sum("c_ab").as("c_a_first"))
    val seconds = big.groupBy(substring_index(col("bg"), " ", -1).as("t"))
      .agg(sum("c_ab").as("c_b_second"))
    val nBi = big.agg(coalesce(sum("c_ab"), lit(0L))).head().getLong(0)
    if (nBi == 0)
      return big.select(col("bg").as("bigram"), col("c_ab"),
        lit(0L).as("c_a_first"), lit(0L).as("c_b_second"),
        lit(0L).as("g2_micro")).limit(0)
    // x·ln x with x·ln 0 := 0 (the entropy-form convention)
    def xlx(c: org.apache.spark.sql.Column) =
      when(c > 0, c.cast("double") * log(c.cast("double"))).otherwise(lit(0.0))
    val k11 = col("c_ab")
    val k12 = col("c_a_first") - col("c_ab")
    val k21 = col("c_b_second") - col("c_ab")
    val k22 = lit(nBi) - col("c_a_first") - col("c_b_second") + col("c_ab")
    // ONE parenthesization, replayed verbatim by the oracle
    val g2 = lit(2.0) * ((((xlx(k11) + xlx(k12)) + xlx(k21)) + xlx(k22))
      - (xlx(col("c_a_first")) + xlx(lit(nBi) - col("c_a_first")))
      - (xlx(col("c_b_second")) + xlx(lit(nBi) - col("c_b_second")))
      + xlx(lit(nBi)))
    big.where(col("c_ab") >= minCount)
      .join(firsts, substring_index(col("bg"), " ", 1) === col("t"))
      .drop("t")
      .join(seconds, substring_index(col("bg"), " ", -1) === col("t"))
      .drop("t")
      .select(col("bg").as("bigram"), col("c_ab"), col("c_a_first"),
        col("c_b_second"), round(g2 * 1e6).cast("long").as("g2_micro"))
      .orderBy(col("g2_micro").desc, col("bigram").asc)
      .limit(k)
  }

  /** Interpolated Kneser-Ney bigram model (fixed discount d = 0.5) —
    * the smoothing that actually ranks continuations well, because
    * the backoff is the CONTINUATION probability (in how many distinct
    * contexts does w₂ appear?) rather than raw frequency; "francisco"
    * is frequent but follows only "san", so KN correctly scores it low
    * after anything else. (Kneser & Ney, ICASSP'95 — public method.)
    *
    *   p(w₂|w₁) = (c₁₂ − d)/c₁ + (d·N₁₊(w₁)/c₁) · (N_cont(w₂)/D)
    *
    * with c₁ = Σ_w c₁w (bigram-start total), N₁₊(w₁) = distinct
    * continuations of w₁, N_cont(w₂) = distinct predecessors of w₂,
    * D = distinct bigram types. Everything derives from ONE
    * vocabulary-scale bigram count table (strict in-document adjacent
    * pairs, [[pmiCollocations]]'s construction): two keys-only
    * re-aggregations for the w₁/w₂ margins, token-co-keyed joins
    * back, D the single driver scalar. Corpus text is scanned once
    * and never shuffled.
    *
    * Counts are exact longs; the float formula runs per output row in
    * the FIXED order (c₁₂−0.5)/c₁ + (N₁₊/(2·c₁))·(N_cont/D), mirrored
    * literally by the oracle — bit-stable micros (the q63/q160
    * discipline). Output: (w1, w2, c12, c1, n1p, ncont, p_micro) for
    * c₁₂ ≥ `minCount`. */
  def knBigramTable(df: DataFrame, textCol: String, minCount: Long): DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    val toks = df.select(
      filter(graft.plans.native.wordShingles(col(textCol), 1), t => t =!= "")
        .as("tk"))
    val pairArr = {
      val tk = col("tk")
      when(size(tk) < 2, array().cast("array<struct<w1:string,w2:string>>"))
        .otherwise(zip_with(
          slice(tk, lit(1), size(tk) - 1),
          slice(tk, lit(2), size(tk) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2"))))
    }
    val big = toks.select(explode(pairArr).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val left = big.groupBy("w1").agg(sum("c12").as("c1"),
      count(lit(1)).as("n1p"))
    val right = big.groupBy("w2").agg(count(lit(1)).as("ncont"))
    val d = big.count() // distinct bigram types: the one driver scalar
    val out =
      if (d == 0)
        big.select(col("w1"), col("w2"), col("c12"), lit(0L).as("c1"),
          lit(0L).as("n1p"), lit(0L).as("ncont"), lit(0L).as("p_micro"))
          .limit(0)
      else big.where(col("c12") >= minCount)
        .join(left, Seq("w1"))
        .join(right, Seq("w2"))
        .select(col("w1"), col("w2"), col("c12"), col("c1"), col("n1p"),
          col("ncont"),
          round(lit(1e6) *
            ((col("c12").cast("double") - lit(0.5)) / col("c1").cast("double") +
             (col("n1p").cast("double") / (lit(2.0) * col("c1").cast("double"))) *
             (col("ncont").cast("double") / lit(d.toDouble))))
            .cast("long").as("p_micro"))
    val cached = out.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cached.count()
    big.unpersist(false)
    cached
  }

  /** Per-document TF-IDF top-`k` keyword extraction — the corpus-aware
    * "what is this page about" signal (topic labeling, cluster naming,
    * mixture auditing): raw TF alone surfaces stopwords, IDF alone
    * surfaces typos; tf·idf surfaces the terms that are frequent HERE
    * and rare elsewhere. idf = ln((N + 1) / (df + 1)) + 1 (unit-offset
    * smoothing — never zero, never negative since df <= N).
    *
    * Scale shape: one (doc, term) count shuffle builds TF; DF is a
    * keys-only rollup of that frame (vocabulary-scale, map-side
    * combining); the idf join is term-co-keyed (never a literal — a
    * 100 TB vocabulary doesn't broadcast); the final top-k window
    * partitions by doc, whose group size is bounded by DOCUMENT length
    * (not corpus size), so no partition outgrows a task at any corpus
    * width. Nothing in the plan materializes per-corpus state on the
    * driver except the single row count N.
    *
    * Scores are exact integers: idf in MICRO-units (ln rounded at
    * 1e-6, + the 1e6 offset) times the integer tf — products stay
    * under 2^40, ANSI-overflow-free, and the oracle replays them
    * decimal-exact (the q63 micro-unit discipline; the ln argument is
    * evaluated in the FIXED order (N + 1.0) / (df + 1.0) on both
    * engines). Output: (idCol, rank, term, tf, df, score_micro), the
    * top `k` terms per doc by (score desc, term asc). */
  def tfidfKeywords(df: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val toks = df.select(col(idCol),
      filter(graft.plans.native.wordShingles(col(textCol), 1), t => t =!= "")
        .as("tk"))
    // DISTINCT ids, not rows: on a unique-id corpus they coincide, and
    // under grouped reuse (many rows per cluster id — clusterKeywords)
    // N stays the number of "documents" idf is defined over.
    val n = toks.agg(count_distinct(col(idCol))).head().getLong(0)
    val tf = toks.select(col(idCol), explode(col("tk")).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idfMicro = round(lit(1e6) *
      log((lit(n.toDouble) + lit(1.0)) / (col("df") + lit(1.0)))).cast("long") +
      lit(1000000L)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol))
      .orderBy(col("score_micro").desc, col("term").asc)
    tf.join(dfreq, Seq("term"))
      .select(col(idCol), col("term"), col("tf"), col("df"),
        (col("tf") * idfMicro).as("score_micro"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("tf"), col("df"),
        col("score_micro"))
  }

  /** Cluster auto-labeling by class-based TF-IDF (the BERTopic
    * c-TF-IDF idea, Grootendorst 2022): treat each cluster as one
    * pseudo-document — tf aggregates over ALL the cluster's docs, df
    * counts CLUSTERS containing the term, N is the cluster count — so
    * the top terms are what distinguishes a cluster from the other
    * clusters, which is the label a corpus map wants. Pure reuse:
    * exactly [[tfidfKeywords]] keyed by the cluster column (tf rows
    * accumulate per (cluster, term) in the same one count shuffle; no
    * per-cluster text concatenation ever materializes — the cluster
    * "pseudo-document" exists only as aggregation state). */
  def clusterKeywords(df: DataFrame, clusterCol: String, textCol: String,
                      k: Int): DataFrame =
    tfidfKeywords(df, clusterCol, textCol, k)

  /** Okapi BM25 relevance of every document against a (small) query
    * term set — the standard retrieval score, useful for search-style
    * curation (pull the corpus slice most relevant to a topic).
    * tf comes from one explode filtered to the query terms (the
    * corpus never shuffles rows that match no term), df from the
    * metadata-scale (term, doc) frame, and N/avgdl from one
    * aggregate. Scores are integer MICRO-units of the BM25 value
    * (per-(doc, term) score rounded to 1e-6, then summed exactly) so
    * results replay decimal-exact across engines; divide by 1e6 for
    * the float score. Docs matching no term score 0 (still emitted).
    *
    * The per-pair formula is evaluated with a FIXED operation order —
    * idf = ln(1 + (N - df + 0.5) / (df + 0.5)),
    * s = idf * ((tf * (k1 + 1)) / (tf + k1 * (1 - b + b * (dl /
    * avgdl)))) — mirrored parenthesis-for-parenthesis by the oracle
    * SQL, which is what makes the doubles bit-identical before the
    * micro rounding. */
  def bm25Scores(df: DataFrame, idCol: String, textCol: String,
                 terms: Seq[String], k1: Double = 1.2,
                 b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "terms must be non-empty")
    val toks = df.select(col(idCol),
      graft.plans.native.wordShingles(col(textCol), 1).as("tk"))
      .select(col(idCol), filter(col("tk"), t => t =!= "").as("tk"))
    val lens = toks.select(col(idCol), size(col("tk")).cast("long").as("dl"))
    val totRow = lens.agg(count(lit(1)).as("n"), sum("dl").as("s")).head()
    val n = totRow.getLong(0)
    if (n == 0)
      return lens.select(col(idCol), col("dl").as("n_tokens"),
        lit(0L).as("score_micro"))
    val avgdl = totRow.getLong(1).toDouble / n
    val tf = toks
      .select(col(idCol), explode(col("tk")).as("term"))
      .where(col("term").isin(terms.map(_.toLowerCase): _*))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) + (lit(n) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val denom = col("tf") + lit(k1) *
      (lit(1.0 - b) + lit(b) * (col("dl") / lit(avgdl)))
    val pairMicro = round(lit(1e6) *
      (idf * ((col("tf") * lit(k1 + 1.0)) / denom))).cast("long")
    val scored = tf
      .join(broadcast(dfreq), Seq("term"))
      .join(lens, Seq(idCol))
      .select(col(idCol), pairMicro.as("m"))
      .groupBy(col(idCol)).agg(sum("m").as("score_micro"))
    lens.join(scored, Seq(idCol), "left")
      .select(col(idCol), col("dl").as("n_tokens"),
        coalesce(col("score_micro"), lit(0L)).as("score_micro"))
  }

  /** HYBRID lexical + semantic retrieval (round 12) — the standard
    * two-tower curation recipe: per query, Okapi BM25 top-`n` over
    * the text corpus AND exact-cosine top-`n` over the embedding
    * corpus, fused by reciprocal-rank fusion (Cormack et al., SIGIR
    * 2009 — the same integer convention as [[Sampling.rrfFuse]]:
    * term = 1e6 div (rrfK + rank), missing from a list = no term).
    * BM25 catches exact lexical matches embeddings blur; the ANN side
    * catches paraphrases BM25 misses — fused, it is the "pull the
    * corpus slice most relevant to these seed topics" operator a
    * training-data pipeline runs at selection time.
    *
    * `queries`: (query_id, terms array<string> — lowercased, vector)
    * — broadcast-small (the [[graft.operators.Knn.bruteForce]]
    * contract). The two corpora may have different id universes
    * (text-only docs can only surface lexically, embedding-only ids
    * only semantically) — the fusion's outer join handles both.
    *
    * Deterministic end-to-end: per-(doc, term) BM25 micros (q64's
    * fixed operation order) summed exactly per (query, doc), ranks
    * break ties on id ASC, RRF terms are integer division, final
    * top-k by (rrf DESC, id ASC). Scale shape (round-13 rework, r12
    * verdict ask #2 — 13 → ~9 exchanges, corpus passes 2 → 1): the
    * corpus is tokenized ONCE — the term prune happens IN-ROW against
    * the queries' literal term union (no pre-shuffle join) and the
    * corpus stats (n, Σdl) ride the SAME pass as `observe` metrics
    * instead of their own aggregate job; df comes from a window over
    * the checkpointed term-pruned tf (no dfreq aggregate + broadcast
    * join back); the two towers fuse by UNION + one (query, doc)-keyed
    * sum (missing-from-a-list = no term — set union), not a full-outer
    * sort-merge join. The semantic side is the broadcast-queries
    * bruteForce; everything after tf is n-rows-per-query scale.
    * Output: (query_id, doc_id, rrf_micro, rank ≤ k). */
  def hybridRetrieve(docs: DataFrame, docIdCol: String, textCol: String,
                     embs: DataFrame, embIdCol: String, vecCol: String,
                     queries: DataFrame, queryIdCol: String,
                     termsCol: String, queryVecCol: String,
                     n: Int, k: Int, rrfK: Int = 60,
                     k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(n >= 1 && k >= 1 && rrfK >= 0,
      s"need n/k >= 1 and rrfK >= 0, got n=$n k=$k rrfK=$rrfK")
    import org.apache.spark.sql.expressions.Window
    // queries materialize ONCE (they are broadcast-small by contract —
    // the bruteForce bound): the operator references them four ways
    // (term union, per-query term attribution, the semantic probe) and
    // an unmaterialized frame re-executes its whole upstream plan per
    // reference — the round-13 profile measured ~0.2 s × 4 of exactly
    // that on the gate's broadcast-join-shaped queries frame
    val q0 = queries.select(col(queryIdCol).cast("long").as("query_id"),
        array_distinct(col(termsCol)).as("terms"),
        col(queryVecCol).as("qvec"))
      .localCheckpoint(true)
    // ---- lexical tower: multi-query BM25 ---------------------------
    // the term union collects to a literal, so the corpus-side prune
    // is an in-row set-membership filter with ZERO join machinery; qt
    // (per-query terms) still broadcasts for the score attribution
    val qt = broadcast(q0.select(col("query_id"),
      explode(col("terms")).as("term")))
    val termSet = q0
      .select(explode(col("terms")).as("t"))
      .distinct().collect().map(_.getString(0)).sorted.toSeq
    // ONE corpus pass: tokenize, keep the full-length dl, prune the
    // token list in-row to query terms; (nDocs, Σdl) are observe
    // metrics on that same pass — no second tokenize for avgdl
    val obs = new org.apache.spark.sql.Observation()
    val tf = docs.select(col(docIdCol).cast("long").as("id"),
        filter(graft.plans.native.wordShingles(col(textCol), 1),
          t => t =!= "").as("tk"))
      // isInCollection → InSet (hash-set membership, O(1) per token)
      // once the term union passes the optimizer's In threshold — an
      // array_contains over a literal array would be O(|terms|)/token
      .select(col("id"), size(col("tk")).cast("long").as("dl"),
        filter(col("tk"), t => t.isInCollection(termSet)).as("mtk"))
      .observe(obs, count(lit(1)).as("n"), sum("dl").as("s"))
      .select(col("id"), col("dl"), explode(col("mtk")).as("term"))
      .groupBy("id", "dl", "term").agg(count(lit(1)).as("tf"))
      .localCheckpoint(true) // eager: the observe metrics are now set
    val nDocs = obs.get("n").asInstanceOf[Long]
    require(nDocs > 0, "empty text corpus")
    val avgdl = obs.get("s").asInstanceOf[Long].toDouble / nDocs
    // df in-window over the checkpointed tf (matched docs × terms —
    // small): no dfreq aggregate, no broadcast join back
    val df = count(lit(1)).over(Window.partitionBy("term"))
    val idf = log(lit(1.0) +
      (lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val denom = col("tf") + lit(k1) *
      (lit(1.0 - b) + lit(b) * (col("dl") / lit(avgdl)))
    val pairMicro = round(lit(1e6) *
      (idf * ((col("tf") * lit(k1 + 1.0)) / denom))).cast("long")
    val lexScores = tf.withColumn("df", df)
      .join(qt, Seq("term"))
      .groupBy("query_id", "id").agg(sum(pairMicro).as("score_micro"))
    val wLex = Window.partitionBy("query_id")
      .orderBy(col("score_micro").desc, col("id").asc)
    val lexTop = lexScores.withColumn("lex_rank", row_number().over(wLex))
      .where(col("lex_rank") <= n)
      .select(col("query_id"), col("id"), col("lex_rank").as("r"))
    // ---- semantic tower: exact cosine top-n ------------------------
    val semTop = Knn.bruteForce(embs, embIdCol, vecCol,
        q0.select(col("query_id"), col("qvec")),
        "query_id", "qvec", n)
      .select(col("query_id").cast("long").as("query_id"),
        col("neighbor_id").cast("long").as("id"),
        col("rank").as("r"))
    // ---- reciprocal-rank fusion ------------------------------------
    // rrfFuse's exact-integer convention: `div`, never float division
    // (a correctly-rounded double quotient can truncate differently).
    // UNION + one keyed sum replaces the full-outer join: each list
    // contributes its term, a doc missing from a list contributes
    // nothing — identical semantics, two sorts and a join fewer.
    val term = expr(s"1000000L div (${rrfK}L + r)").as("m")
    val fused = lexTop.select(col("query_id"), col("id"), term)
      .unionByName(semTop.select(col("query_id"), col("id"), term))
      .groupBy("query_id", "id").agg(sum("m").as("rrf_micro"))
    val wF = Window.partitionBy("query_id")
      .orderBy(col("rrf_micro").desc, col("id").asc)
    fused.withColumn("rank", row_number().over(wF))
      .where(col("rank") <= k)
      .select(col("query_id"), col("id").as("doc_id"),
        col("rrf_micro"), col("rank"))
  }

  /** Token-type Shannon entropy per document — low entropy flags
    * repetitive/boilerplate text (a handful of token types dominate),
    * high entropy tracks lexical diversity; complements
    * [[repetitionRatio]] (adjacent repeats) with a distributional
    * signal. One (doc, token)-keyed count shuffle + a per-doc sum.
    * Integer MICRO-NAT output (each type's -p·ln(p) rounded at 1e-6,
    * summed exactly — the q63 trick) so the oracle replays it
    * decimal-exact; divide by 1e6 for nats. */
  def tokenEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol),
      filter(graft.plans.native.wordShingles(col(textCol), 1), t => t =!= "").as("tk"))
    val lens = toks.select(col(idCol), size(col("tk")).cast("long").as("n_tokens"))
    val counts = toks.select(col(idCol), explode(col("tk")).as("t"))
      .groupBy(col(idCol), col("t")).agg(count(lit(1)).as("c"))
    val ratio = col("c") / col("n_tokens").cast("double")
    val micro = round(lit(1e6) * -(ratio * log(ratio))).cast("long")
    val scored = counts.join(lens, Seq(idCol))
      .select(col(idCol), micro.as("m"))
      .groupBy(col(idCol)).agg(sum("m").as("entropy_micro"))
    lens.join(scored, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("entropy_micro"), lit(0L)).as("entropy_micro"))
  }

  /** Bigram language-model log-probability per document — the
    * CCNet-style perplexity quality filter ("CCNet: Extracting High
    * Quality Monolingual Datasets from Web Crawl Data", Wenzek et al.
    * 2020): fit an add-one-smoothed bigram LM on `model` and score
    * every `corpus` doc's total log P(w_i | w_{i-1}); low per-bigram
    * log-prob (high perplexity) flags noisy/garbled text, and
    * anomalously HIGH scores flag boilerplate. Pass the same frame as
    * both to self-score a corpus.
    *
    * P(w2|w1) = (C(w1 w2) + 1) / (C(w1 ·) + V), V = distinct token
    * types in the model. Scale shape: the bigram-count table is
    * corpus-sized at 100 TB, so scoring joins doc bigrams to it on the
    * bigram key (one co-keyed shuffle each side — never a literal);
    * the context table is vocabulary-sized (dimension scale) and
    * broadcasts. V is the only driver-side scalar.
    *
    * Returns (idCol, n_bigrams, logprob_micro): integer MICRO-NATS
    * (each occurrence's ln P rounded at 1e-6, summed exactly — the
    * q63/q74 trick) so the result replays decimal-exact across
    * engines; divide by 1e6·n_bigrams for the per-token log-prob.
    * Docs with <2 tokens emit (0, 0). The per-occurrence formula is
    * evaluated with a FIXED operation order — ln((c2 + 1.0) / (c1 +
    * V)) — mirrored parenthesis-for-parenthesis by the oracle SQL. */
  def lmScores(corpus: DataFrame, model: DataFrame, idCol: String,
               textCol: String): DataFrame = {
    def toks(c: org.apache.spark.sql.Column) =
      filter(graft.plans.native.wordShingles(c, 1), t => t =!= "")
    // strict adjacent bigrams (none for <2 tokens — wordShingles'
    // whole-text fallback would fabricate a unigram "bigram" here)
    val bg = {
      val tk = col("tk")
      when(size(tk) < 2, array().cast("array<string>"))
        .otherwise(zip_with(
          slice(tk, lit(1), size(tk) - 1),
          slice(tk, lit(2), size(tk) - 1),
          (a, b) => concat(a, lit(" "), b)))
    }
    val modelBg = model.select(toks(col(textCol)).as("tk"))
      .select(bg.as("bg"))
    val corpusBg = corpus.select(col(idCol), toks(col(textCol)).as("tk"))
      .select(col(idCol), bg.as("bg"))
    val c2 = modelBg.select(explode(col("bg")).as("b"))
      .groupBy("b").agg(count(lit(1)).as("c2"))
    val c1 = modelBg.select(explode(col("bg")).as("b"))
      .select(substring_index(col("b"), " ", 1).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c1"))
    val v = model.select(explode(toks(col(textCol))).as("t"))
      .agg(countDistinct(col("t"))).head().getLong(0)
    val lens = corpusBg.select(col(idCol), size(col("bg")).cast("long").as("n_bigrams"))
    val occ = corpusBg.select(col(idCol), explode(col("bg")).as("b"))
    val micro = round(lit(1e6) *
      log((coalesce(col("c2"), lit(0L)) + lit(1.0)) /
        (coalesce(col("c1"), lit(0L)) + lit(v.toDouble)))).cast("long")
    val scored = occ
      .join(c2, Seq("b"), "left")
      .join(broadcast(c1), substring_index(col("b"), " ", 1) === c1("w1"), "left")
      .select(col(idCol), micro.as("m"))
      .groupBy(idCol).agg(sum("m").as("logprob_micro"))
    lens.join(scored, Seq(idCol), "left")
      .select(col(idCol), col("n_bigrams"),
        coalesce(col("logprob_micro"), lit(0L)).as("logprob_micro"))
  }

  /** DSIR-style hashed n-gram importance weights ("Data Selection for
    * Language Models via Importance Resampling", Xie et al. 2023,
    * arXiv:2302.03169): every doc's unigrams+bigrams hash into
    * `buckets` slots; a add-one-smoothed multinomial is fit over the
    * buckets on the TARGET set and on the raw corpus, and each doc
    * scores the sum over its grams of log(p_target / p_corpus) — high
    * scorers look like the target distribution and survive
    * importance resampling.
    *
    * Scale shape: the two distributions are keys-only aggregates
    * (`buckets` keys, map-side combined) collected to a
    * metadata-scale array; scoring is then a ZERO-shuffle corpus scan
    * — the log-ratio table rides the plan as a literal and each doc
    * folds its own gram buckets. Returns (idCol, n_grams,
    * score_micro): the score in integer MICRO-nats (each bucket's
    * log-ratio rounded to 1e-6 then summed exactly), which is what
    * makes the result decimal-exact across engines; divide by 1e6
    * for the float weight. `portableHash` swaps xxhash64 for the
    * md5 hash the DuckDB oracle replays. */
  def dsirScores(corpus: DataFrame, target: DataFrame, idCol: String,
                 textCol: String, buckets: Int = 8192,
                 portableHash: Boolean = false): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    def grams(c: org.apache.spark.sql.Column) =
      filter(concat(graft.plans.native.wordShingles(c, 1),
        graft.plans.native.wordShingles(c, 2)), g => g =!= "")
    def bucketOf(g: org.apache.spark.sql.Column) =
      pmod(if (portableHash) graft.functions.Hashes.md5Hash64(g) else xxhash64(g),
        lit(buckets.toLong)).cast("int")
    def dist(df: DataFrame): (Array[Long], Long) = {
      val rows = df.select(explode(grams(col(textCol))).as("g"))
        .select(bucketOf(col("g")).as("b"))
        .groupBy("b").agg(count(lit(1)).as("c"))
        .collect()
      val arr = new Array[Long](buckets)
      rows.foreach(r => arr(r.getInt(0)) = r.getLong(1))
      (arr, arr.sum)
    }
    val (cp, np) = dist(target)
    val (cq, nq) = dist(corpus)
    val lamMicro: Array[Long] = Array.tabulate(buckets) { b =>
      math.round(1e6 * math.log(
        ((cp(b) + 1.0) * (nq + buckets.toDouble)) /
          ((cq(b) + 1.0) * (np + buckets.toDouble))))
    }
    val lamLit = typedLit(lamMicro.toSeq)
    corpus.select(col(idCol), grams(col(textCol)).as("gr"))
      .select(col(idCol), size(col("gr")).cast("long").as("n_grams"),
        aggregate(transform(col("gr"), g => element_at(lamLit, bucketOf(g) + 1)),
          lit(0L), (acc, x) => acc + x).as("score_micro"))
  }

  /** Flesch reading ease per document — the classic readability
    * filter (a pretraining-quality signal alongside the Gopher rules
    * and LM scores): 206.835 − 1.015·(words/sentences) −
    * 84.6·(syllables/word), with the standard regex heuristics —
    * sentences = runs of [.!?] (floored at 1), syllables = vowel-group
    * runs of [aeiouy] in the lowercased text (whitespace already
    * breaks groups; RE2-safe so any engine counts identically). All
    * three counts are exact integers from a pure scan projection
    * (zero shuffles, whole-stage codegen); the formula then runs per
    * row in fixed float order → micros. Docs with no words emit NULL
    * (no prose to score). Output: (idCol, n_words, n_sentences,
    * n_syllables, flesch_micro). */
  def readability(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val words = Text.tokenCount(col(textCol)).cast("long")
    val sentences = greatest(lit(1L),
      regexp_count(col(textCol), lit("[.!?]+")).cast("long"))
    val syllables = regexp_count(lower(col(textCol)), lit("[aeiouy]+")).cast("long")
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    df.select(col(idCol), words.as("n_words"), sentences.as("n_sentences"),
        syllables.as("n_syllables"))
      .withColumn("flesch_micro",
        when(col("n_words") > 0,
          round(lit(1e6) * (lit(206.835)
            - lit(1.015) * (d(col("n_words")) / d(col("n_sentences")))
            - lit(84.6) * (d(col("n_syllables")) / d(col("n_words")))))
            .cast("long")))
  }

  /** Zipf rank–frequency fit over the corpus's top `maxRank` tokens —
    * the "is this corpus natural language?" diagnostic (natural text
    * slopes ≈ −1; templated/generated corpora flatten or kink). The
    * head is a TakeOrdered top-k (count desc, token asc — no global
    * sort; everything downstream is k-bounded regardless of corpus or
    * vocabulary size), ranks come from one window over those ≤ k
    * rows, and the log-log OLS runs over per-rank micro-quantized
    * (ln rank, ln freq) terms summed as exact integers, closed with
    * one fixed-order float expression — the q219/alpha discipline.
    * Output (one row): (n_ranks, slope_micro, intercept_micro). */
  def zipfFit(df: DataFrame, textCol: String,
              maxRank: Int = 1000): DataFrame = {
    require(maxRank >= 2, s"need maxRank >= 2, got $maxRank")
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val top = topTerms(df, textCol, maxRank)
    val ranked = top
      .withColumn("r", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("n").desc, col("term").asc)))
    val lx = round(log(col("r").cast("double")) * 1e6).cast("long")
    val ly = round(log(col("n").cast("double")) * 1e6).cast("long")
    val m = ranked.select(lx.as("x"), ly.as("y"))
      .agg(count(lit(1)).as("k"),
        sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
        sum(col("x").cast(dec) * col("y").cast(dec)).as("sxy"),
        sum(col("x").cast(dec) * col("x").cast(dec)).as("sxx"))
    def d(c: String) = col(c).cast("double")
    val det = d("k") * d("sxx") - d("sx") * d("sx")
    val slope = (d("k") * d("sxy") - d("sx") * d("sy")) / det
    val icept = (d("sy") - slope * d("sx")) / d("k") / lit(1e6)
    m.select(col("k").as("n_ranks"),
      when(col("k") >= 2 && det =!= 0.0,
        round(slope * 1e6).cast("long")).as("slope_micro"),
      when(col("k") >= 2 && det =!= 0.0,
        round(icept * 1e6).cast("long")).as("intercept_micro"))
  }

  /** Tokenizer FERTILITY per key (pieces-per-word): how many subword
    * pieces a tokenizer spends per whitespace word, the standard
    * tokenizer-efficiency readout per language/source — fertility ≈ 1
    * for languages the vocabulary fits, ≫ 1 where everything
    * fragments (the signal behind per-language token budgeting).
    * Pieces here are the RE2-PORTABLE proxy `[A-Za-z0-9_]+` runs plus
    * individual non-space symbols (one regexp_extract_all both
    * engines evaluate identically — deliberately NOT
    * [[graft.functions.Text.subwordCount]], whose lookaround split
    * has no RE2 twin). One map-side-combined aggregate; the ratio is
    * one fixed-order float expression over exact long sums. Output:
    * (key, n_docs, n_words, n_pieces, fertility_micro). */
  def tokenizerFertility(df: DataFrame, keyCol: String,
                         textCol: String): DataFrame = {
    val words = Text.tokenCount(col(textCol)).cast("long")
    val pieces = size(regexp_extract_all(col(textCol),
      lit("[A-Za-z0-9_]+|[^\\sA-Za-z0-9_]"), lit(0))).cast("long")
    df.where(col(keyCol).isNotNull)
      .groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n_docs"), sum(words).as("n_words"),
        sum(pieces).as("n_pieces"))
      .select(col("key"), col("n_docs"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        coalesce(col("n_pieces"), lit(0L)).as("n_pieces"),
        when(coalesce(col("n_words"), lit(0L)) > 0,
          round(col("n_pieces").cast("double") /
            col("n_words").cast("double") * 1e6).cast("long"))
          .as("fertility_micro"))
  }

  /** Gini–Simpson token diversity per corpus group (Simpson 1949,
    * "Measurement of diversity"): D = Σ cᵢ(cᵢ−1) / (N(N−1)) is the
    * probability two tokens drawn without replacement are the SAME
    * type; 1−D is diversity. The concentration sibling of the entropy
    * readouts (q74 token entropy, q260 l-diversity): dominated by
    * head mass, robust to the long tail — a template-y or boilerplate
    * slice scores high D even when its raw vocabulary looks large.
    * Exact integer sums (DECIMAL(38,0)) with one IEEE division →
    * deterministic micros; groups with n < 2 emit NULL micros.
    * Output: (group, n_tokens, n_types, simpson_micro,
    * gini_simpson_micro). */
  def simpsonDiversity(df: DataFrame, groupCol: String,
                       textCol: String): DataFrame = {
    val dec = DecimalType(38, 0)
    val cells = df
      .select(col(groupCol).as("group"),
        explode(Text.tokens(lower(col(textCol)))).as("tok"))
      .groupBy("group", "tok").agg(count(lit(1)).as("c"))
    val g = cells.groupBy("group").agg(sum("c").as("n_tokens"),
      count(lit(1)).as("n_types"),
      sum(col("c").cast(dec) * (col("c").cast(dec) - lit(1).cast(dec)))
        .as("s2"))
    val nD = col("n_tokens").cast("double")
    val d = col("s2").cast("double") / (nD * (nD - lit(1.0)))
    g.select(col("group"), col("n_tokens"), col("n_types"),
      when(col("n_tokens") >= 2, round(d * 1e6).cast("long"))
        .as("simpson_micro"),
      when(col("n_tokens") >= 2, round((lit(1.0) - d) * 1e6).cast("long"))
        .as("gini_simpson_micro"))
  }

  /** Multi-needle containment scan through ONE broadcast Aho–Corasick
    * automaton (Aho & Corasick 1975, "Efficient string matching: an
    * aid to bibliographic search") — the scale path for benchmark-
    * contamination screens: [[contamination]]'s per-needle `contains`
    * projection re-reads every document once PER NEEDLE, fine for a
    * handful, hopeless for the 10k-needle eval-suite n-gram lists;
    * the automaton finds all needles' occurrences in one left-to-
    * right pass per document regardless of needle count.
    *
    * mapPartitions is the documented last resort and earns its place
    * here: a failure-link state machine is genuinely imperative
    * per-character state, inexpressible as columnar functions. The
    * needle list broadcasts; each partition builds the automaton once
    * (O(Σ|needle|) — amortized across the partition's rows).
    * Occurrence counts are OVERLAPPING (standard AC semantics; equal
    * to non-overlapping counts whenever needles are border-free).
    * Output: (idCol, needle, n_hits), hit rows only. */
  def multiNeedleScan(df: DataFrame, idCol: String, textCol: String,
                      needles: Seq[String]): DataFrame = {
    require(needles.nonEmpty && needles.forall(_.nonEmpty),
      "needles must be non-empty strings")
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(needles.toArray)
    df.select(col(idCol).cast("long").as("id"),
        col(textCol).cast("string").as("t"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val pats = bc.value
        val ac = AhoCorasick.build(pats)
        it.flatMap { case (id, text) =>
          if (text == null) Iterator.empty
          else {
            val counts = ac.countAll(text)
            Iterator.range(0, pats.length)
              .filter(counts(_) > 0L)
              .map(i => (id, pats(i), counts(i)))
          }
        }
      }
      .toDF("id", "needle", "n_hits")
      .withColumnRenamed("id", idCol)
  }

  private object AhoCorasick {
    final class Automaton(goto: Array[scala.collection.mutable.HashMap[Char, Int]],
                          fail: Array[Int], out: Array[Array[Int]],
                          nNeedles: Int) extends Serializable {
      def countAll(text: String): Array[Long] = {
        val counts = new Array[Long](nNeedles)
        var s = 0
        var i = 0
        while (i < text.length) {
          val c = text.charAt(i)
          while (s != 0 && !goto(s).contains(c)) s = fail(s)
          s = goto(s).getOrElse(c, 0)
          val o = out(s)
          var j = 0
          while (j < o.length) { counts(o(j)) += 1L; j += 1 }
          i += 1
        }
        counts
      }
    }

    def build(pats: Array[String]): Automaton = {
      import scala.collection.mutable
      val goto = mutable.ArrayBuffer(mutable.HashMap.empty[Char, Int])
      val own = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
      for (pi <- pats.indices) {
        var s = 0
        for (c <- pats(pi)) {
          s = goto(s).getOrElseUpdate(c, {
            goto += mutable.HashMap.empty[Char, Int]
            own += mutable.ArrayBuffer.empty[Int]
            goto.size - 1
          })
        }
        own(s) += pi
      }
      val n = goto.size
      val fail = new Array[Int](n)
      val out = Array.fill(n)(Array.empty[Int])
      val queue = mutable.Queue.empty[Int]
      for ((_, v) <- goto(0)) { fail(v) = 0; queue += v }
      out(0) = own(0).toArray
      for ((_, v) <- goto(0)) out(v) = own(v).toArray ++ out(0)
      while (queue.nonEmpty) {
        val u = queue.dequeue()
        for ((c, v) <- goto(u)) {
          queue += v
          var f = fail(u)
          while (f != 0 && !goto(f).contains(c)) f = fail(f)
          fail(v) = if (goto(f).contains(c) && goto(f)(c) != v) goto(f)(c)
                    else 0
          out(v) = own(v).toArray ++ out(fail(v))
        }
      }
      new Automaton(goto.map(identity).toArray, fail, out, pats.length)
    }
  }

  /** Exact heavy hitters in BOUNDED memory — the Misra–Gries summary
    * (Misra & Gries 1982, "Finding repeated elements") as pass 1,
    * exact verification as pass 2: each partition keeps at most k
    * decrement-counters over its token stream (mapPartitions —
    * bounded imperative state is the whole point); any token with
    * global frequency > N/(k+1) is GUARANTEED to survive in at least
    * one partition's summary (pigeonhole over the per-partition
    * guarantee), so the union of summaries is a provable candidate
    * superset. Pass 2 rescans counting ONLY the ≤ partitions·k
    * candidates (broadcast semi join) and keeps the exact top n —
    * equal to the unconstrained exact top n whenever the nth
    * frequency clears N/(k+1) (size k accordingly: k ≥ N/f_n).
    * The deterministic cousin of the CMS/TopK sketches: no hash
    * collisions, no approximation in the final answer.
    * Output: (term, n) by (n desc, term asc), n rows. */
  def heavyHitters(df: DataFrame, textCol: String, k: Int,
                   topN: Int): DataFrame = {
    require(k >= 1 && topN >= 1, "k and topN must be >= 1")
    val toks = df.select(explode(Text.tokens(lower(col(textCol))))
      .as("term"))
    val partials = mgSummaries(toks, k).select("term").distinct()
    toks.join(broadcast(partials), Seq("term"), "left_semi")
      .groupBy("term").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term").asc)
      .limit(topN)
  }

  /** Per-partition Misra–Gries summaries WITH their retained counter
    * weights: at most k (term, w) rows per partition, where each
    * retained w satisfies c_p(t) − n_p/(k+1) ≤ w ≤ c_p(t) (the MG
    * guarantee per partition of n_p tokens). Weighted summaries are
    * MERGEABLE by plain cell-wise addition — summing over partitions
    * (or micro-batches) keeps the additive error ≤ N/(k+1) because
    * the per-partition decrement rounds sum (Agarwal et al., "
    * Mergeable summaries", TODS 2013) — which is what lets
    * [[heavyHitters]]'s pass 1 and the streaming twin
    * ([[graft.streaming.StreamMonitor.misraGriesStream]]) share this
    * kernel: batch keeps only the keys (candidates for an exact
    * second pass); streaming keeps the weights (no second pass over
    * an unbounded stream). `toks` is a single-column frame of terms. */
  private[graft] def mgSummaries(toks: DataFrame, k: Int): DataFrame = {
    val spark = toks.sparkSession
    import spark.implicits._
    toks.as[String].mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      for (t <- it) {
        if (m.contains(t)) m(t) += 1L
        else if (m.size < k) m(t) = 1L
        else {
          val dead = List.newBuilder[String]
          for ((key, v) <- m) {
            if (v == 1L) dead += key else m(key) = v - 1L
          }
          dead.result().foreach(m.remove)
        }
      }
      m.iterator
    }.toDF("term", "w")
  }

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    * SIGMOD 2003, "Winnowing: local algorithms for document
    * fingerprinting" — the MOSS algorithm; public): hash every k-char
    * gram of the whitespace-normalized lowercased text, slide a
    * w-hash window, and keep each window's MINIMUM hash with ties
    * broken by RIGHTMOST position (the paper's choice — consecutive
    * windows then mostly re-pick the same gram, minimizing distinct
    * fingerprints); identical picks dedup. The local-selection
    * guarantee: any shared substring of length ≥ w + k − 1 between
    * two documents yields at least one SHARED fingerprint, and no
    * document gap longer than w goes unfingerprinted — the
    * position-robust alternative to fixed-stride shingling for
    * copy/plagiarism/near-dup detection.
    *
    * Shape: ONE in-row projection per document (normalize → gram
    * hashes → per-window min → rightmost-argmin → dedup → explode) —
    * zero shuffle at any corpus size. The gram-hash and window-min
    * arrays are bound as LAMBDA VARIABLES (`transform(array(x),
    * v -> …)[1]`, the SQL let-trick) instead of chained withColumns:
    * Catalyst collapses stacked projections and re-inlines an array
    * expression into every `element_at` site, which turns the fold
    * into an O(n²·w) recompute-per-access blowup (measured: a 300-
    * char doc hung the gate) — a lambda binding evaluates each array
    * exactly once per row. Folds use SCALAR accumulators only
    * (array_min + a rightmost-position fold) because engines disagree
    * on struct-accumulator fold semantics (the q288 DuckDB in-place
    * finding). `portableHash = true` swaps xxhash64 for the md5
    * 60-bit gate hash so oracles replay bit-identically; production
    * keeps xxhash64, and at 100 TB the per-gram hash would be the
    * O(1)-per-step rolling form — the winnowing SELECTION is
    * identical either way. Output: (id, pos, fp) — 1-based gram
    * position, ordered by the caller. */
  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
                         k: Int, w: Int,
                         portableHash: Boolean = false): DataFrame = {
    require(k >= 2 && w >= 2, s"need k >= 2 and w >= 2, got k=$k w=$w")
    val h = if (portableHash)
      s"CAST(conv(substring(md5(CAST(substr(__t, __d, $k) AS BINARY)), 1, 15), 16, 10) AS BIGINT)"
    else s"xxhash64(substr(__t, __d, $k))"
    val picks =
      s"""CASE WHEN __n >= $w THEN
         |  element_at(transform(
         |    array(transform(sequence(1, __n), __d -> $h)), __hl ->
         |    element_at(transform(
         |      array(transform(sequence(1, __n - ${w - 1}), __s2 ->
         |        array_min(slice(__hl, __s2, $w)))), __wl ->
         |      transform(
         |        array_distinct(transform(sequence(1, size(__wl)), __s ->
         |          aggregate(sequence(__s, __s + ${w - 1}), -1L,
         |            (__acc, __p) -> IF(element_at(__hl, __p)
         |                = element_at(__wl, __s),
         |              CAST(__p AS BIGINT), __acc)))),
         |        __p2 -> named_struct(
         |          'm', element_at(__hl, CAST(__p2 AS INT)),
         |          'pos', __p2))), 1)), 1)
         |ELSE CAST(array() AS ARRAY<STRUCT<m: BIGINT, pos: BIGINT>>)
         |END""".stripMargin
    df.select(col(idCol).as("id"),
        trim(regexp_replace(lower(col(textCol)), "\\s+", " ")).as("__t"))
      .withColumn("__n", length(col("__t")) - lit(k - 1))
      .select(col("id"), explode(expr(picks)).as("pk"))
      .select(col("id"), col("pk.pos").as("pos"), col("pk.m").as("fp"))
  }

  /** Pairwise vocabulary overlap between corpus groups (sources,
    * languages, time slices): for each group pair, exact distinct-
    * token intersection/union sizes and Jaccard micros — the
    * corpus-composition drift readout at the VOCABULARY level
    * ([[Dedup]] compares documents; [[KeyChecks.statsDrift]] compares
    * numeric moments; this compares what words each slice even uses).
    *
    * Scale shape: one row-scale (group, token) distinct aggregate,
    * then a token-keyed self-join whose per-token fan-out is bounded
    * by the GROUP count squared — groups are metadata-scale by
    * construction (sources, languages), so the pair stream is
    * G²-bounded per token, never corpus². Jaccard closes in integer
    * arithmetic: inter·10⁶ div (va + vb − inter).
    * Output: (g_a, g_b, vocab_a, vocab_b, intersection,
    * jaccard_micro) for pairs g_a < g_b. */
  def vocabOverlap(df: DataFrame, groupCol: String,
                   textCol: String): DataFrame = {
    val gt = df
      .select(col(groupCol).cast("string").as("g"),
        explode(graft.functions.Text.tokens(lower(col(textCol))))
          .as("tok"))
      .distinct()
    val sizes = gt.groupBy("g").agg(count(lit(1)).as("v"))
    val inter = gt.select(col("g").as("g_a"), col("tok"))
      .join(gt.select(col("g").as("g_b"), col("tok")), Seq("tok"))
      .where(col("g_a") < col("g_b"))
      .groupBy("g_a", "g_b").agg(count(lit(1)).as("intersection"))
    inter
      .join(sizes.select(col("g").as("g_a"), col("v").as("vocab_a")),
        Seq("g_a"))
      .join(sizes.select(col("g").as("g_b"), col("v").as("vocab_b")),
        Seq("g_b"))
      .select(col("g_a"), col("g_b"), col("vocab_a"), col("vocab_b"),
        col("intersection"),
        expr("intersection * 1000000L div " +
          "(vocab_a + vocab_b - intersection)").as("jaccard_micro"))
  }

  /** RAKE keyword extraction (Rose, Engel, Cramer & Cowley 2010,
    * "Automatic keyword extraction from individual documents"):
    * candidate phrases are maximal stopword/punctuation-free token
    * runs; word score = degree/frequency over those phrases (degree =
    * Σ phrase length across a word's occurrences — co-occurring words
    * boost each other); phrase score = Σ member word scores. The
    * unsupervised keyphrase extractor that needs no corpus statistics
    * beyond one pass.
    *
    * Exact-replay discipline: word scores are (deg·10⁶) div freq —
    * non-negative integer division both engines agree on — so phrase
    * scores are order-free integer sums. Phrase splitting is two
    * deterministic regex passes (punctuation → break; ' stop ' →
    * break, twice, because a replacement consumes the delimiter space
    * of its neighbor — two passes close any run of adjacent
    * stopwords in both Java and RE2 regex engines).
    *
    * Scale shape: pure scan projections until the two keyed
    * aggregates (word stats, phrase counts — both vocabulary/phrase-
    * cardinality); the top-n cut is a bounded TakeOrdered. Output:
    * (phrase, n_occurrences, score_micro), ties broken by phrase. */
  def rakeKeywords(df: DataFrame, textCol: String,
                   stopwords: Seq[String], topN: Int,
                   maxWords: Int = 4): DataFrame = {
    require(stopwords.nonEmpty && topN >= 1 && maxWords >= 1)
    val stopAlt = stopwords.map(java.util.regex.Pattern.quote)
      .mkString("|")
    val pat = s" (?:$stopAlt) "
    val t0 = concat(lit(" "),
      regexp_replace(lower(col(textCol)), "[^a-z0-9\\s]+", " | "),
      lit(" "))
    val t2 = regexp_replace(regexp_replace(t0, pat, " | "), pat, " | ")
    val words = filter(split(trim(col("p")), "\\s+"), w => w =!= "")
    val ph = df.select(explode(split(t2, "\\|")).as("p"))
      .select(words.as("w"))
      .where(size(col("w")).between(1, maxWords))
      .select(array_join(col("w"), " ").as("phrase"),
        size(col("w")).as("plen"), col("w"))
    val wsc = ph.select(col("plen"), explode(col("w")).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("freq"), sum("plen").as("deg"))
      .select(col("word"), expr("deg * 1000000L div freq").as("ws"))
    val pc = ph.groupBy("phrase").agg(count(lit(1)).as("n_occurrences"))
    pc.select(col("phrase"), col("n_occurrences"),
        explode(split(col("phrase"), " ")).as("word"))
      .join(wsc, Seq("word"))
      .groupBy("phrase", "n_occurrences")
      .agg(sum("ws").as("score_micro"))
      .orderBy(col("score_micro").desc, col("phrase").asc)
      .limit(topN)
  }
}
