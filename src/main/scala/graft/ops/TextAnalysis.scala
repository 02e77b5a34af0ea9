package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{graft => bridge}

import graft.functions.{HeavyHitters, RepetitionStats, RollingMinHash, WinnowedFingerprints}

/** Text-analysis operators for a large-scale training-data pipeline:
  * tokenization, language ID, quality scoring, document fingerprinting.
  *
  * These extend the reference's surface (it has no text functions —
  * SURVEY.md §2 "Scalar functions") with the operations an LLM data
  * pipeline needs over a `documents(doc_id, text, lang, source, n_chars)`
  * table.
  *
  * Scale posture: every operator here is a pure per-row projection built
  * from codegen'd Catalyst expressions (`split` / `transform` /
  * `aggregate` / `regexp_extract_all`) — no UDFs, no shuffles, no state.
  * On a 1000-executor cluster these run map-side at scan speed and
  * column-prune down to `(doc_id, text)`.
  */
object TextAnalysis {

  /** Whitespace tokens with empties dropped — one canonical tokenizer
    * shared by every operator (and mirrored exactly in the DuckDB oracles
    * as `list_filter(regexp_split_to_array(text, ' +'), t -> t <> '')`).
    *
    * Native kernel ([[graft.functions.WsTokens]]): the HOF formula's
    * `filter` is CodegenFallback and one fallback expression blacklists
    * its whole projection from whole-stage codegen — tokenization sits
    * under EVERY text operator, so the HOF form was silently dragging
    * the shingle/minhash/entropy projections out of codegen.
    */
  def tokens(text: Column): Column =
    bridge.column(graft.functions.WsTokens(bridge.expression(text)))

  /** The HOF formula [[tokens]] replaces (differential tests only). */
  def tokensHof(text: Column): Column =
    filter(split(text, " +"), t => t =!= lit(""))

  /** BPE-ish subword segmentation: letter runs, digit runs, single
    * punctuation marks — the pre-tokenizer regex most BPE vocabularies
    * (GPT-2 style) apply before merges.
    */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  // --- language ID --------------------------------------------------------

  /** Marker stopwords per language, checked as whole tokens. Tiny on
    * purpose: broadcast as literals into the row projection.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "de", "et", "est"),
    "zh" -> Seq("的", "是", "在", "了", "我"))

  /** Marker-hit count for one language: distinct-token set intersect the
    * marker set (set semantics on both engines).
    */
  def langScore(toks: Column, markers: Seq[String]): Column =
    size(array_intersect(array_distinct(toks),
      array(markers.map(lit): _*)))

  /** Predicted language = argmax marker-hit count, ties broken by the
    * fixed order of [[langMarkers]] (en first). Emitted as a chain of
    * `when`s so the DuckDB oracle can be a literally-identical CASE chain.
    */
  def langId(toks: Column): Column = {
    val scores = langMarkers.map { case (l, m) => l -> langScore(toks, m) }
    scores.zipWithIndex.foldRight(lit(scores.last._1)) {
      case (((lang, s), i), elseCol) =>
        val later = scores.drop(i + 1).map(_._2)
        if (later.isEmpty) elseCol
        else when(later.map(s >= _).reduce(_ && _), lang).otherwise(elseCol)
    }
  }

  // --- quality scoring ----------------------------------------------------

  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "is", "in", "to", "for", "on", "with")

  /** Quality features + a composite score in [0,1]:
    * length saturation × (1 − punctuation ratio) × stopword presence.
    * The exact formula is mirrored in the oracle; its virtue is being
    * deterministic and cheap, not linguistically deep.
    */
  def qualityColumns(text: Column): Seq[Column] = {
    val toks = tokens(text)
    val nToks = size(toks).cast("long")
    val nPunct = size(regexp_extract_all(text, lit("[^a-z0-9\\s]"), lit(0))).cast("long")
    val nStop = bridge.column(graft.functions.TokenSetCount(
      bridge.expression(toks), stopwords))
    val punctRatio = nPunct.cast("double") / greatest(length(text).cast("double"), lit(1.0))
    val stopRatio = nStop.cast("double") / greatest(nToks.cast("double"), lit(1.0))
    val score = least(nToks.cast("double") / lit(100.0), lit(1.0)) *
      (lit(1.0) - punctRatio) * (lit(0.5) + lit(0.5) * stopRatio)
    Seq(
      nToks.as("n_tokens"),
      nPunct.as("n_punct"),
      round(stopRatio, 4).as("stop_ratio"),
      round(score, 4).as("quality"))
  }

  /** A rate in [0, 1] as an 8-hex-digit threshold: a row is "below the
    * rate" iff the first 8 hex chars of md5(id) sort below it (hex
    * lexicographic order == numeric order, so this is a uniform 32-bit
    * draw). Stable across runs, engines, partitionings, and cluster
    * sizes — the property seeded `rand()` sampling does NOT have (rand
    * is per-partition-seeded; a repartition changes the sample).
    */
  def hexThreshold(rate: Double): String =
    if (rate >= 1.0) "g" // sorts above every hex digit → keep all
    else if (rate <= 0.0) "00000000"
    else f"${(rate * 4294967296L).toLong}%08x"

  def hashBucket(id: Column): Column =
    substring(md5(id.cast("string")), 1, 8)

  /** Hash-based stratified sampling: per-stratum keep-rates applied as
    * [[hexThreshold]] cuts on the id hash. Map-only, reproducible, exact
    * per-row membership (a row is in or out forever — what dataset
    * versioning needs).
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
      rates: Map[String, Double], defaultRate: Double = 1.0): DataFrame = {
    val thr = rates.toSeq.sortBy(_._1).foldLeft(lit(hexThreshold(defaultRate))) {
      case (acc, (k, r)) => when(col(stratumCol) === k, lit(hexThreshold(r))).otherwise(acc)
    }
    df.filter(hashBucket(col(idCol)) < thr)
  }

  /** Deterministic train/validation/test assignment from the same hash
    * draw: [0, trainFrac) → train, [trainFrac, trainFrac+valFrac) → val,
    * rest → test. Disjoint, exhaustive, reproducible.
    */
  def assignSplit(id: Column, trainFrac: Double, valFrac: Double): Column = {
    val h = hashBucket(id)
    when(h < hexThreshold(trainFrac), "train")
      .when(h < hexThreshold(trainFrac + valFrac), "val")
      .otherwise("test")
  }

  /** Token-quota curriculum sampling: downsample each stratum (source,
    * domain, language…) to ≈ `quotaTokens` tokens by computing the
    * stratum's keep-rate FROM THE DATA (quota / measured tokens) and
    * applying it as the same md5-threshold membership rule as
    * [[stratifiedSample]] — the op behind "hit this domain mix" corpus
    * curricula.
    *
    * Fully distributed: the per-stratum totals are a tiny broadcast
    * aggregate and the hex threshold is computed IN the row expression
    * (`lower(lpad(hex(floor(rate·2³²)), 8, '0'))`), so no rate ever
    * round-trips through the driver. Membership stays per-row
    * deterministic: re-running with a bigger quota only ADDS docs (the
    * hash draw is fixed), which is what incremental curriculum rebuilds
    * need.
    */
  def tokenQuotaSample(docs: DataFrame, idCol: String, textCol: String,
      stratumCol: String, quotaTokens: Long): DataFrame = {
    val tl = docs.select(col(idCol), col(stratumCol),
      size(tokens(col(textCol))).cast("long").as("n_tok"))
    val tot = tl.groupBy(stratumCol)
      .agg(sum(col("n_tok")).cast("double").as("__tot"))
    val rate = lit(quotaTokens.toDouble) / col("__tot")
    val thr = lower(lpad(hex(floor(rate * lit(4294967296L)).cast("long")), 8, "0"))
    tl.join(broadcast(tot), stratumCol)
      .filter(rate >= 1.0 || hashBucket(col(idCol)) < thr)
      .drop("__tot")
  }

  /** Temperature-balanced multi-source mixing (the XLM-R / mT5 / LLaMA
    * data recipe): split a token budget across sources proportional to
    * p_s^α so head sources stop drowning the tail, here at α = 1/2 in
    * EXACT arithmetic — the per-source weight is the integer sqrt of
    * its measured token total (IEEE-754 requires sqrt correctly
    * rounded, so `floor(sqrt(·))` is engine-identical — unlike pow(),
    * whose last ulp differs across libm implementations and could flip
    * a threshold-boundary document), the normalizer is an exact
    * integer sum, and each source's keep rate is ONE double division
    * of two exact DECIMAL products. Membership is the same
    * md5-permutation rule as [[tokenQuotaSample]]: per-row
    * deterministic, monotone in the budget (raising it only ADDS
    * docs). Everything source-sized rides broadcasts; the corpus never
    * shuffles.
    */
  def temperatureMixSample(docs: DataFrame, idCol: String, textCol: String,
      srcCol: String, budgetTokens: Long): DataFrame = {
    val tl = docs.select(col(idCol), col(srcCol),
      size(tokens(col(textCol))).cast("long").as("n_tok"))
    val tot = tl.groupBy(srcCol)
      .agg(sum(col("n_tok")).as("__tot"))
      .withColumn("__w", floor(sqrt(col("__tot").cast("double"))).cast("long"))
    val norm = tot.agg(sum(col("__w")).as("__sumw"))
    val rate = (lit(budgetTokens).cast("decimal(38,0)") * col("__w"))
      .cast("double") /
      (col("__sumw").cast("decimal(38,0)") * col("__tot")).cast("double")
    val thr = lower(lpad(hex(floor(rate * lit(4294967296L)).cast("long")), 8, "0"))
    tl.join(broadcast(tot), srcCol).crossJoin(broadcast(norm))
      .filter(rate >= 1.0 || hashBucket(col(idCol)) < thr)
      .drop("__tot", "__w", "__sumw")
  }

  /** Out-of-vocabulary rate per document against the corpus top-`vocabSize`
    * vocabulary — the classic "does this doc look like the corpus" quality
    * gate (docs full of rare tokens are OCR noise, code dumps, or another
    * language). Deterministic head selection: ties at the cut break on the
    * token string, so the vocabulary is reproducible across engines and
    * re-runs.
    *
    * Two corpus passes by design: pass 1 builds the vocabulary head (a
    * map-side-combined unigram count; the top-V head itself is tiny and
    * broadcast), pass 2 re-scans docs and joins tokens against the
    * broadcast head — no shuffle of the corpus, only of per-doc partial
    * counts. At 100 TB the vocabulary pass is amortizable: build it once,
    * persist it, and pass 2 becomes a single map-side scan.
    */
  def oovRate(docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int): DataFrame = {
    val toks = docs.select(col(idCol), explode(tokens(col(textCol))).as("token"))
    val vocab = toks.groupBy("token").agg(count(lit(1)).as("__n"))
      .orderBy(col("__n").desc, col("token")).limit(vocabSize)
      .select(col("token"), lit(true).as("__in_vocab"))
    toks.join(broadcast(vocab), Seq("token"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / col("n_tokens"), 4))
  }

  /** Pointwise mutual information of token co-occurrence (both tokens in
    * the same document), restricted to the top-`vocabSize` vocabulary head:
    * PMI(a,b) = log2(n_ab · N / (n_a · n_b)) with document frequencies.
    * The vocabulary restriction is what makes this scale: the per-doc
    * self-join is bounded by V tokens per side, so candidate pairs are
    * ≤ V² regardless of corpus size — unbounded-vocab PMI would square
    * the document length instead. All counts stay exact integers; the
    * only float op is the final log2, rounded to 4 (the same margin
    * doc_entropy's oracle established).
    *
    * Plan shape: one doc-keyed exchange feeds BOTH sides of the self-join
    * (ReuseExchange; asserted in PlanSpec), vocabulary and document
    * frequencies ride broadcasts, N is a broadcast scalar.
    */
  def tokenPmi(docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int, minPairCount: Long): DataFrame = {
    val dt = docs.select(col(idCol).as("__doc"),
      explode(array_distinct(tokens(col(textCol)))).as("token"))
    val vocab = dt.groupBy("token").agg(count(lit(1)).as("__df"))
      .orderBy(col("__df").desc, col("token")).limit(vocabSize)
    val dv = dt.join(broadcast(vocab.select("token")), Seq("token"))
    val nDocs = docs.agg(count(lit(1)).cast("double").as("__n"))
    val a = dv.select(col("__doc"), col("token").as("w1"))
    val b = dv.select(col("__doc"), col("token").as("w2"))
    val pairs = a.join(b, Seq("__doc")).filter(col("w1") < col("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
    val dfa = dv.groupBy(col("token").as("w1"))
      .agg(count(lit(1)).cast("double").as("__na"))
    val dfb = dv.groupBy(col("token").as("w2"))
      .agg(count(lit(1)).cast("double").as("__nb"))
    pairs.join(broadcast(dfa), Seq("w1")).join(broadcast(dfb), Seq("w2"))
      .crossJoin(broadcast(nDocs))
      .select(col("w1"), col("w2"), col("n_ab"),
        round(log2(col("n_ab").cast("double") * col("__n") /
          (col("__na") * col("__nb"))), 4).as("pmi"))
  }

  /** Heavy-hitters aggregate over a string column: Misra–Gries sketch
    * with at most `k` counters per partial — the bounded-state way to get
    * the vocabulary head at corpus scale (see
    * [[graft.functions.HeavyHitters]] for the guarantees).
    */
  def heavyHitters(c: Column, k: Int): Column =
    bridge.column(HeavyHitters(bridge.expression(c), k).toAggregateExpression())

  /** Repetition signals (Gopher/C4-style quality rules): fraction of
    * duplicate tokens and of duplicate word bigrams — high values mark
    * boilerplate/spam. Pure per-row projections; the keep/drop rule
    * composes them with the length gate.
    *
    * Counts come from the one-pass native [[RepetitionStats]] kernel (the
    * HOF bigram formula it replaces — `transform(sequence…, slice)` — is
    * quadratic per document in the interpreter); the ratio arithmetic
    * stays here in the Column layer, mirrored exactly by the oracle.
    */
  def repetitionColumns(text: Column): Seq[Column] = {
    val stats = bridge.column(RepetitionStats(bridge.expression(tokens(text))))
    val n = stats.getField("n_tokens").cast("double")
    val nDist = stats.getField("n_distinct_tokens").cast("double")
    val nB = stats.getField("n_bigrams").cast("double")
    val nBDist = stats.getField("n_distinct_bigrams").cast("double")
    Seq(
      round(lit(1.0) - nDist / greatest(n, lit(1.0)), 4).as("dup_token_ratio"),
      round(lit(1.0) - nBDist / greatest(nB, lit(1.0)), 4).as("dup_bigram_ratio"))
  }

  /** The HOF formula [[repetitionColumns]] replaces — kept for
    * differential testing of the native node. */
  def repetitionColumnsHof(text: Column): Seq[Column] = {
    val toks = tokens(text)
    val n = size(toks).cast("double")
    val bigrams = when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2),
        i => concat_ws(" ", slice(toks, i + lit(1), lit(2)))))
      .otherwise(array())
    val nB = size(bigrams).cast("double")
    Seq(
      round(lit(1.0) - size(array_distinct(toks)).cast("double")
        / greatest(n, lit(1.0)), 4).as("dup_token_ratio"),
      round(lit(1.0) - size(array_distinct(bigrams)).cast("double")
        / greatest(nB, lit(1.0)), 4).as("dup_bigram_ratio"))
  }

  // --- PII redaction ------------------------------------------------------

  /** Redaction patterns, ordered: emails before URLs before IPs (an IP
    * inside a URL is consumed by the URL rule). Written in the common
    * subset of Java regex and RE2 ([.] instead of \\. etc.) so the DuckDB
    * oracle can reuse them verbatim.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}" -> "<EMAIL>",
    "https?://[^ ]+" -> "<URL>",
    "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}" -> "<IP>")

  /** Scrub emails/URLs/IPs to placeholder tokens — the text-cleaning pass
    * an LLM corpus runs before training. Pure codegen'd regexp_replace
    * chain (global replace on both engines), map-side at any scale.
    */
  def redactPii(text: Column): Column =
    piiPatterns.foldLeft(text) { case (acc, (re, token)) =>
      regexp_replace(acc, re, token)
    }

  /** Match counts per PII class (audit columns for the redaction pass). */
  def piiCounts(text: Column): Seq[Column] = Seq(
    size(regexp_extract_all(text, lit(piiPatterns(0)._1), lit(0)))
      .cast("long").as("n_email"),
    size(regexp_extract_all(text, lit(piiPatterns(1)._1), lit(0)))
      .cast("long").as("n_url"),
    size(regexp_extract_all(text, lit(piiPatterns(2)._1), lit(0)))
      .cast("long").as("n_ip"))

  // --- char-marker language ID -------------------------------------------

  /** Char-marker language score: total occurrences of the language's
    * markers (token-boundary-padded) in the text — non-overlapping
    * left-to-right matches. Unlike [[langScore]]'s distinct-token-set
    * intersection, repeated markers count every time — a frequency
    * profile, not a set profile; no tokenization pass needed, so this
    * variant survives texts where whitespace tokenization is wrong (CJK,
    * concatenated scripts). One native pass over the text
    * ([[graft.functions.MarkerCounts]]) instead of a compiled-regex pass
    * per marker.
    */
  def langScoreChar(padded: Column, markers: Seq[String]): Column = {
    val counts = bridge.column(graft.functions.MarkerCounts(
      bridge.expression(padded), markers.map(m => s" $m ")))
    markers.indices.map(i => element_at(counts, i + 1)).reduce(_ + _)
  }

  /** Predicted language from char-marker frequencies: argmax over
    * [[langMarkers]], ties broken by fixed order (same CASE-chain shape
    * as [[langId]] so the oracle mirrors it literally). Text must be
    * space-padded by the caller (`concat(lit(" "), text, lit(" "))`) so
    * edge tokens match. The per-language scores all slice ONE
    * [[graft.functions.MarkerCounts]] array — identical subtrees, so
    * codegen's subexpression elimination evaluates the scan once per row.
    */
  def langIdChar(padded: Column): Column = {
    val all = bridge.column(graft.functions.MarkerCounts(
      bridge.expression(padded),
      langMarkers.flatMap(_._2).map(m => s" $m ")))
    val offsets = langMarkers.scanLeft(0)(_ + _._2.length)
    val scores = langMarkers.zipWithIndex.map { case ((l, ms), li) =>
      l -> ms.indices.map(i => element_at(all, offsets(li) + i + 1)).reduce(_ + _)
    }
    scores.zipWithIndex.foldRight(lit(scores.last._1)) {
      case (((lang, s), i), elseCol) =>
        val later = scores.drop(i + 1).map(_._2)
        if (later.isEmpty) elseCol
        else when(later.map(s >= _).reduce(_ && _), lang).otherwise(elseCol)
    }
  }

  /** The regexp-trick formula the native [[graft.functions.MarkerCounts]]
    * kernel replaces — (len(t) − len(replace(t, m, ''))) / len(m), the
    * same count the DuckDB oracle computes. Kept for differential tests.
    */
  def markerOccurrencesHof(padded: Column, marker: String): Column = {
    val m = s" $marker "
    ((length(padded) - length(regexp_replace(padded,
      java.util.regex.Pattern.quote(m), ""))) / lit(m.length)).cast("long")
  }

  def langScoreCharHof(padded: Column, markers: Seq[String]): Column =
    markers.map(markerOccurrencesHof(padded, _)).reduce(_ + _)

  def langIdCharHof(padded: Column): Column = {
    val scores = langMarkers.map { case (l, m) => l -> langScoreCharHof(padded, m) }
    scores.zipWithIndex.foldRight(lit(scores.last._1)) {
      case (((lang, s), i), elseCol) =>
        val later = scores.drop(i + 1).map(_._2)
        if (later.isEmpty) elseCol
        else when(later.map(s >= _).reduce(_ && _), lang).otherwise(elseCol)
    }
  }

  // --- tokenizer induction / information content --------------------------

  /** Adjacent-token pairs ("bigram merge candidates") — the counting step
    * of one BPE merge iteration, generalized to whitespace tokens.
    * Native one-pass kernel ([[graft.functions.AdjacentPairs]]);
    * [[mergePairsHof]] is the zip-of-slices formula it replaces.
    */
  def mergePairs(text: Column): Column =
    bridge.column(graft.functions.AdjacentPairs(
      bridge.expression(tokens(text))))

  /** The HOF formula [[mergePairs]] replaces (differential tests only). */
  def mergePairsHof(text: Column): Column = {
    val toks = tokensHof(text)
    val m = greatest(size(toks) - 1, lit(0)) // 0 pairs for 0- or 1-token docs
    zip_with(slice(toks, lit(1), m), slice(toks, lit(2), m),
      (a, b) => concat_ws(" ", a, b))
  }

  /** Shannon entropy (bits/token) of the document's unigram token
    * distribution — an information-content quality signal (boilerplate
    * and template spam score low; natural prose scores ~7-9 bits).
    *
    * Map-only (native one-pass kernel, [[graft.functions.TokenEntropy]]):
    * entropy = log2(n) − Σc·log2(c)/n. The explode + double-groupBy
    * formulation computes the same thing with two shuffles; at 100 TB
    * this stays at scan speed instead. Null for an empty document.
    */
  def tokenEntropy(text: Column): Column =
    round(bridge.column(
      graft.functions.TokenEntropy(bridge.expression(tokens(text)))), 4)

  /** The expression-level sorted-fold formula the [[tokenEntropy]] kernel
    * replaces (differential twin; interpreted HOF, ~10× slower).
    */
  def tokenEntropyHof(text: Column): Column = {
    val toks = sort_array(tokens(text))
    val n = size(toks).cast("double")
    val runTerm = (st: Column) =>
      when(st("run") > 0, st("run") * log2(st("run"))).otherwise(lit(0.0))
    val sumCLogC = aggregate(
      toks,
      struct(lit(null).cast("string").as("prev"), lit(0.0).as("run"),
        lit(0.0).as("s")),
      (st, t) =>
        when(st("prev").isNull || st("prev") =!= t,
          struct(t.as("prev"), lit(1.0).as("run"),
            (st("s") + runTerm(st)).as("s")))
          .otherwise(struct(st("prev").as("prev"),
            (st("run") + 1.0).as("run"), st("s").as("s"))),
      st => st("s") + runTerm(st))
    when(n > 0, round(log2(n) - sumCLogC / n, 4))
  }

  /** Canonical text normalization for dedup/fingerprinting: lowercase,
    * strip everything outside [a-z0-9 ], collapse whitespace runs, trim.
    * Pure codegen'd projection (lower/regexp_replace/trim); feeding
    * [[graft.ops.Dedup.exactGroups]] a normalized column turns it into
    * normalization-aware dedup ("same text modulo case/punctuation").
    * Mirrored exactly by the DuckDB oracle.
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  // --- fingerprinting -----------------------------------------------------

  /** Character n-grams of the raw text (the shingling behind winnowing
    * fingerprints); short texts collapse to one whole-string gram.
    */
  def charGrams(text: Column, n: Int): Column =
    when(length(text) >= n,
      transform(sequence(lit(0), length(text) - n),
        i => text.substr(i + lit(1), lit(n))))
      .otherwise(array(text))

  /** Document fingerprint pair: exact content hash (md5 of the full text)
    * plus a rolling-hash minimum over character 8-grams — the 1-hash
    * degenerate case of a MinHash/winnowing sketch, robust to small edits
    * at either end of the document.
    */
  def fingerprintColumns(text: Column): Seq[Column] = Seq(
    md5(text).as("content_md5"),
    bridge.column(RollingMinHash(bridge.expression(text), 8)).as("rolling_min"))

  /** The expression-level formula [[RollingMinHash]] replaces
    * (differential tests only).
    */
  def rollingMinHof(text: Column, n: Int): Column =
    array_min(transform(charGrams(text, n), g => md5(g)))

  /** Winnowing fingerprint set (sorted distinct window minima of char
    * `k`-gram md5s over windows of `w`) — see
    * [[graft.functions.WinnowedFingerprints]] for the density/recall
    * contract. [[Dedup.winnowOverlapPairs]] is the pair-join consumer.
    */
  def winnow(text: Column, k: Int = 8, w: Int = 4): Column =
    bridge.column(WinnowedFingerprints(bridge.expression(text), k, w))

  /** The expression-level formula [[WinnowedFingerprints]] replaces
    * (differential tests only).
    */
  def winnowHof(text: Column, k: Int, w: Int): Column = {
    val hs = when(length(text) < k, array(md5(text)))
      .otherwise(transform(sequence(lit(0), length(text) - k),
        i => md5(text.substr(i + lit(1), lit(k)))))
    array_sort(array_distinct(transform(
      sequence(lit(0), greatest(size(hs) - w, lit(0))),
      i => array_min(slice(hs, i + lit(1), least(lit(w), size(hs)))))))
  }

  /** Per-source vocabulary drift: KL(P_source ‖ P_corpus) over the
    * corpus's top-`vocabSize` vocabulary head, add-one smoothed — the
    * ingest-feed health monitor: a feed whose token distribution diverges
    * from the corpus (boilerplate flood, language shift, spam) spikes
    * here before any per-document quality gate notices. `head_coverage`
    * (the fraction of a source's tokens that land in the corpus head) is
    * the companion signal — a feed of out-of-head tokens drifts even
    * when its in-head mix looks corpus-like.
    *
    * Scale: one corpus-scale token count, then everything is
    * vocabulary-bounded — the head is V rows (deterministic
    * (count desc, token) tie-break), the source×head grid is V·|sources|
    * rows of broadcast-sized relations, and each KL is a V-term sum.
    * Counts are exact integers, probabilities/logs derive from them
    * identically on any engine, and the V-term float sum rounds at 6
    * decimals — far above summation-order noise.
    */
  def sourceDrift(df: DataFrame, sourceCol: String, textCol: String,
      vocabSize: Int = 50): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val counts = df
      .select(col(sourceCol).as("source"), explode(tokens(col(textCol))).as("token"))
      .groupBy("source", "token").agg(count(lit(1)).as("c"))
    val corpus = counts.groupBy("token").agg(sum("c").as("ct"))
    val head = corpus
      .withColumn("rank",
        row_number().over(w.orderBy(col("ct").desc, col("token"))))
      .filter(col("rank") <= vocabSize)
      .withColumn("ctot", sum("ct").over(w.partitionBy()))
      // the add-one denominator must add the ACTUAL head size (the head
      // can be smaller than vocabSize on a narrow vocabulary) or the
      // smoothed distributions don't normalize and "KL" can go negative
      .withColumn("hsize", count(lit(1)).over(w.partitionBy()))
      .select("token", "ct", "ctot", "hsize")
    val srcAll = counts.groupBy("source").agg(sum("c").as("cs_all"))
    val grid = broadcast(head)
      .crossJoin(counts.select("source").distinct())
      .join(counts, Seq("source", "token"), "left")
      .withColumn("c", coalesce(col("c"), lit(0L)))
      .withColumn("cs", sum("c").over(w.partitionBy("source")))
    val v = col("hsize").cast("double")
    val p = (col("c") + lit(1.0)) / (col("cs") + v)
    val q = (col("ct") + lit(1.0)) / (col("ctot") + v)
    grid
      .groupBy("source")
      .agg(round(sum(p * log(p / q)), 6).as("kl"),
        max(col("cs")).as("__cs"))
      .join(broadcast(srcAll), Seq("source"))
      .select(col("source").as(sourceCol), col("kl"),
        round(col("__cs").cast("double") / col("cs_all"), 4)
          .as("head_coverage"))
  }

  /** Zipf fit of the vocabulary head: OLS slope/intercept of ln(count)
    * against ln(rank) over the top-`vocabSize` tokens — the classic
    * corpus-health diagnostic (natural text sits near slope −1; a
    * template/boilerplate-flooded corpus flattens, a truncated/synthetic
    * vocabulary steepens). Rank/count are exact integers; the V-term
    * moment sums round once at the end.
    */
  def zipfFit(df: DataFrame, textCol: String, vocabSize: Int = 100): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val head = df
      .select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .withColumn("rank",
        row_number().over(w.orderBy(col("n").desc, col("token"))))
      .filter(col("rank") <= vocabSize)
    val x = log(col("rank").cast("double"))
    val y = log(col("n").cast("double"))
    val m = head.agg(
      count(lit(1)).cast("double").as("nt"),
      sum(x).as("sx"), sum(y).as("sy"),
      sum(x * y).as("sxy"), sum(x * x).as("sxx"))
    val slope = (col("nt") * col("sxy") - col("sx") * col("sy")) /
      (col("nt") * col("sxx") - col("sx") * col("sx"))
    m.select(col("nt").cast("long").as("n_tokens"),
      round(slope, 4).as("zipf_slope"),
      round((col("sy") - slope * col("sx")) / col("nt"), 4).as("intercept"))
  }
}
