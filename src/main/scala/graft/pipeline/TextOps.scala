package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis primitives for large-scale training-data pipelines, built
 * entirely from Catalyst higher-order functions (`transform`/`aggregate`/
 * `filter`) — no UDFs, so everything stays inside whole-stage codegen and
 * scales linearly with input partitions (no shuffle is introduced by any
 * helper here).
 *
 * All hashes are *portable* polynomial hashes (mod 1e9+7) rather than
 * xxhash/murmur so an independent engine (the DuckDB oracle) can reproduce
 * them exactly; at production scale swap `polyHash` for `xxhash64` — the
 * pipeline shape is identical.
 */
object TextOps {

  /** Modulus for portable polynomial hashing: keeps every intermediate
    * (`acc*31 + char`) well inside signed-64 range in any engine. */
  val P = 1000000007L

  /** Characters of `s` as an array column (no trailing empties). */
  def chars(s: Column): Column = filter(split(s, ""), c => c =!= "")

  /** Portable polynomial hash of a string: fold (acc*31 + code) mod P.
    * Native codegen'd expression (`StringPolyHash`); the HOF equivalent
    * interprets two lambdas per character. */
  def polyHash(s: Column): Column = graft.functions.VectorFunctions.polyHashNative(s)

  /** Whitespace tokens: split on ASCII whitespace RUNS (Java `\s+`) and
    * drop empties, so tabs/newlines/consecutive spaces never produce
    * phantom tokens. This is the ONE tokenization rule of the text stack —
    * token counts, shingles (incl. the native one-pass hasher in
    * `WordShingleUtil`), packing budgets, vocabulary, and encoding all
    * agree on it. Every oracle mirrors it with the EXPLICIT class
    * `list_filter(string_split_regex(text, '[ \t\n\f\r\x0b]+'), x -> x <> '')`
    * — never RE2's `\s`, which (unlike Java's) excludes vertical tab;
    * OracleConsistencySpec pins `\s`-free oracles. */
  def words(text: Column): Column = filter(split(text, "\\s+"), w => w =!= "")

  /** Compute-parallelism floor for CPU-bound per-row stages (optimization
    * guide §2.5 input skew / §2.6 idle capacity): gram explosion, chained
    * merge rewrites and Viterbi segmentation cost per ROW, not per byte,
    * so a narrow input layout — one tiny single-row-group parquet file, an
    * unsplittable archive — serializes the whole stage on a handful of
    * cores (measured: q_bpe_encode's tokenize pass was ONE 2.5 s task on
    * a 32-core session). When the incoming layout is a SHUFFLE-FREE plan
    * narrower than the session's core count, spread rows round-robin once
    * before the expensive projection; any at-scale input (>= cores scan
    * partitions) or post-shuffle frame (already session-width) takes the
    * identity branch — no exchange added where the layout already
    * parallelizes. Plans carrying a shuffle boundary or a subquery are
    * left untouched WITHOUT inspecting partitioning: probing `.rdd` on an
    * adaptive plan materializes its query stages eagerly (double
    * execution), and their width is the session's anyway. Streaming
    * micro-batches arrive pre-partitioned and `.rdd` is undefined on an
    * unstarted stream — identity there too. */
  private[graft] def spreadForCompute(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    if (df.isStreaming) return df
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
    val lp = df.queryExecution.logical
    val hasBoundaryOrSubquery = lp.collectFirst {
      case n @ (_: Join | _: Aggregate | _: Window | _: Sort | _: Distinct |
                _: Repartition | _: RepartitionByExpression | _: GlobalLimit |
                _: SetOperation | _: Deduplicate) => n
      case n if n.expressions.exists(_.exists(_.isInstanceOf[SubqueryExpression])) => n
    }.isDefined
    if (hasBoundaryOrSubquery) df
    else {
      val target = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
    }
  }

  /** Distinct word n-gram shingles ("a b c" strings). */
  def wordShingles(text: Column, n: Int): Column = {
    val ws = words(text)
    when(size(ws) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), size(ws) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(ws, i + j)): _*))))
  }

  /** Distinct character n-gram shingles. */
  def charShingles(text: Column, n: Int): Column =
    when(length(text) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), length(text) - (n - 1)),
        i => text.substr(i, lit(n)))))

  /** Exact Jaccard similarity of two (distinct-element) array columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Number of whitespace tokens. */
  def tokenCountWhitespace(text: Column): Column = size(words(text))

  /** BPE-ish token count: alnum runs + isolated punctuation, via a single
    * regexp pass (codegen'd `regexp_count`). */
  def tokenCountRegex(text: Column): Column =
    regexp_count(text, lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"))

  /** Rolling-hash document fingerprint (content-defined identity). */
  def fingerprint(text: Column): Column = polyHash(text)

  /** CCNet-style unicode normalization (Wenzek et al. LREC 2020): NFKD,
    * accent-mark strip, locale-free lowercase, digits → 0, whitespace
    * collapse — the canonical pre-hash fold of fuzzy-dedup pipelines
    * (RefinedWeb normalizes the same way before MinHash). A codegen'd
    * stateless projection (`functions.UnicodeFold`), dual-mode by
    * construction. */
  def normalizeText(text: Column): Column =
    graft.functions.TextNormalize.fold(text)

  /** HTML/markup strip (the web-corpus extraction step, jusText-lite):
    * drop script/style blocks, strip tags, decode the six common
    * entities, collapse whitespace. Built from regexp/replace built-ins
    * in the Java ∩ RE2 regex subset (inline `(?is)` flags + non-greedy,
    * NO backreferences), so the DuckDB oracle runs the identical chain. */
  def stripMarkup(text: Column): Column = {
    val noBlocks = regexp_replace(
      regexp_replace(
        regexp_replace(text, "(?is)<script[^>]*>.*?</script>", " "),
        "(?is)<style[^>]*>.*?</style>", " "),
      "(?s)<!--.*?-->", " ")
    // tag-SHAPED spans only (</?letter… or <!DOCTYPE…): a bare
    // inequality in prose ("a<b and c>d") is NOT a tag and survives
    val noTags = regexp_replace(noBlocks, "</?[A-Za-z][^>]*>|<![A-Za-z][^>]*>", " ")
    // &amp; decodes LAST: '&amp;lt;' is the TEXT '&lt;', one decode only
    val decoded = Seq("&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, r)) => replace(c, lit(e), lit(r)) }
    trim(regexp_replace(decoded, "[ \\t\\n\\f\\r\\x0B]+", " "))
  }

  /** Lowercased hosts of every URL in the text — the input to
    * domain-blocklist filtering (RefinedWeb-style URL rules). Distinct,
    * first-occurrence order; an optional userinfo component
    * (`user@host`) is skipped so a blocklisted host cannot hide behind
    * credentials. */
  def domainsOf(text: Column): Column =
    array_distinct(transform(
      regexp_extract_all(text,
        lit("(?i)https?://(?:[^/@ \\t\\n\\f\\r\\x0B]+@)?([A-Za-z0-9.-]+)"), lit(1)),
      h => lower(h)))

  /** Canonical form of a single URL — the key of URL-level dedup, the
    * FIRST and cheapest dedup stage of crawl curation (dedup by canonical
    * URL before any content hashing touches text): lowercase the scheme
    * and host — the case-insensitive components; userinfo, path and query
    * stay case-sensitive per RFC 3986 — strip an explicit default port
    * (`:80` http / `:443` https), drop the fragment, and drop the
    * standard tracking parameters (`utm_*`, `fbclid`, `gclid`, names
    * matched case-insensitively) from the QUERY ONLY, with separator
    * repair and a dangling `?`/`&` trim. The path is never rewritten —
    * `&` is a legal path sub-delimiter, so a path-blind strip would
    * truncate real paths and falsely merge distinct documents under the
    * dedup key. Pure codegen'd string expressions the DuckDB oracle
    * mirrors; strings without a `scheme://` pass through unchanged (not
    * a URL — never corrupt what can't be parsed, the same degradation
    * stance as the media stages). That passthrough INCLUDES
    * protocol-relative references (`//host/path`) by design: their
    * effective scheme is the linking page's, which a URL column does not
    * carry, so canonicalizing them would have to guess http vs https —
    * resolve them upstream where the source scheme is known. */
  def canonicalUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostportRaw = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    // userinfo (user:pass@) is case-SENSITIVE per RFC 3986 — preserved;
    // only host (+ port) lowercases
    val userinfo = regexp_extract(hostportRaw, "^(.*@)", 1)
    val host0 = lower(regexp_replace(hostportRaw, "^.*@", ""))
    val host = when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .otherwise(host0)
    // path and query split at the FIRST '?': '&' is a legal path
    // sub-delimiter (RFC 3986), so tracking-strip and separator repair
    // must never touch the path — only the query is rewritten
    val rest = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    val path = regexp_extract(rest, "^([^?]*)", 1)
    val query = regexp_extract(rest, "(\\?.*)$", 1)
    // tracking NAMES match case-insensitively (messy crawl data carries
    // UTM_SOURCE= variants); param VALUES and genuine params keep case.
    // The value is OPTIONAL (crawls carry valueless '?fbclid&q=1'), so a
    // bare name must end at '&' or end-of-query — expressed by consuming
    // a whole RUN of tracking params up to its terminator (keeping the
    // leading separator) because neither Java nor RE2-compatible
    // lookahead is available in the shared oracle subset; 'fbclidX'
    // never matches (no terminator after the literal name)
    val trackParam = "(?i:utm_[^&=]*|fbclid|gclid)(=[^&]*)?"
    val noTrack = regexp_replace(query,
      "([?&])" + trackParam + "(&" + trackParam + ")*(&|$)", "$1")
    // each removal keeps its leading separator: collapse &&+ runs, heal
    // the (anchored — a query starts with '?') ?&, trim a dangling ?/&
    val repaired = regexp_replace(regexp_replace(regexp_replace(
      noTrack, "&{2,}", "&"), "^\\?&", "?"), "[?&]$", "")
    when(scheme === "", url)
      .otherwise(concat(scheme, lit("://"), userinfo, host, path, repaired))
  }

  /** Winnowing document fingerprints (Schleimer et al., SIGMOD 2003 — the
    * MOSS algorithm): word-`n`-gram hashes in position order, each window
    * of `w` selecting its rightmost minimum ([[graft.functions.WinnowSelect]],
    * one codegen'd O(len) pass per document). Output is one row per
    * selected (0-based gram position, hash): a sparse position-robust
    * signature at expected density 2/(w+1) with the paper's guarantee —
    * any shared run of at least w+n-1 words between two documents shares
    * at least one fingerprint hash, so an equi-join of fingerprint tables
    * on `fp` finds local overlaps that whole-document hashing misses and
    * fixed-stride sampling can align past. Zero shuffle; documents with
    * fewer than `w` grams winnow as a single window, so every document
    * with >= n words carries >= 1 fingerprint. */
  def winnowFingerprints(docs: org.apache.spark.sql.DataFrame, idCol: String,
                         textCol: String, n: Int = 3,
                         w: Int = 4): org.apache.spark.sql.DataFrame = {
    require(n >= 1 && w >= 1, s"need n >= 1 and w >= 1, got n=$n w=$w")
    val vf = graft.functions.VectorFunctions
    docs.select(col(idCol), vf.wordShingleHashes(col(textCol), n).as("__hs"))
      .where(size(col("__hs")) >= 1)
      .select(col(idCol), explode(vf.winnowSelect(col("__hs"), w)).as("__f"))
      .select(col(idCol), col("__f.pos").as("pos"), col("__f.h").as("fp"))
  }

  /** Local-overlap candidate pairs from winnowing fingerprints — the
    * plagiarism-index shape the paper builds (MOSS): documents sharing at
    * least `minShared` distinct fingerprint hashes. The join keys on the
    * 8-byte fingerprint ONLY (never text); a fingerprint appearing in
    * more than `maxBucket` documents is boilerplate (a hot bucket would
    * quadratically dominate the join) and is dropped from pairing — the
    * same frequent-key cap every LSH bucket join here applies, mirrored
    * exactly in the oracle. Complements Jaccard near-dup: two documents
    * sharing one long run inside otherwise-different text have low
    * resemblance but many CONSECUTIVE shared fingerprints. */
  def winnowOverlapPairs(docs: org.apache.spark.sql.DataFrame, idCol: String,
                         textCol: String, n: Int = 3, w: Int = 4,
                         minShared: Int = 2,
                         maxBucket: Int = 64): org.apache.spark.sql.DataFrame = {
    require(minShared >= 1 && maxBucket >= 2,
      s"need minShared >= 1 and maxBucket >= 2, got $minShared, $maxBucket")
    val byFp = winnowFingerprints(docs, idCol, textCol, n, w)
      .select(col(idCol), col("fp")).distinct()
    val keep = byFp.groupBy(col("fp"))
      .agg(count(lit(1)).as("__n")).where(col("__n") <= maxBucket)
      .select(col("fp"))
    val pruned = byFp.join(keep, Seq("fp"))
    pruned.select(col("fp"), col(idCol).as("id_a"))
      .join(pruned.select(col("fp"), col(idCol).as("id_b")), Seq("fp"))
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Count of words that appear in the given marker list. */
  def markerHits(text: Column, markers: Seq[String]): Column =
    size(filter(words(text), w => markers.map(m => w === m).reduce(_ || _)))

  /** Language markers for the n-gram/stopword language-ID heuristic. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "es", "una"))

  /** Heuristic language ID: argmax of marker hits, ties resolved in
    * `LangMarkers` declaration order. */
  def langId(text: Column): Column = {
    val hits = LangMarkers.map { case (l, ms) => l -> markerHits(text, ms) }
    hits.init.zipWithIndex.foldRight(lit(hits.last._1)) { case (((l, h), i), rest) =>
      val laterHits = hits.drop(i + 1).map(_._2)
      when(laterHits.map(h >= _).reduce(_ && _), l).otherwise(rest)
    }
  }

  /** Common English stopwords used by the quality score. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Repetition features (Gopher-style quality filters — Rae et al.,
    * "Scaling Language Models: ... Gopher", 2021 §A1.1): duplicate-word
    * fraction, most-frequent-word fraction, most-frequent-bigram fraction.
    * High values flag boilerplate and spam for corpus filtering.
    *
    * Pure projection, NO shuffle: the per-document multiplicity stats
    * ([total, distinct, max] over words and bigrams) compute in one
    * codegen'd pass per row (`WordGramStats`, exact string counts) — the
    * previous formulation exploded the tokenized corpus through two
    * (doc, term)-keyed aggregations, i.e. shuffled every token twice.
    * Documents with no words produce no row (explode-formulation parity). */
  def repetitionFeatures(docs: org.apache.spark.sql.DataFrame,
                         idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    val s1 = graft.functions.VectorFunctions.wordGramStats(col(textCol), 1)
    val s2 = graft.functions.VectorFunctions.wordGramStats(col(textCol), 2)
    // explode(array(struct(...))) is the usual Generate barrier: without
    // it CollapseProject inlines each stats pass into every element_at
    // reference below and the text tokenizes once per reference
    docs.select(col(idCol),
        explode(array(struct(s1.as("s1"), s2.as("s2")))).as("__st"))
      .filter(element_at(col("__st.s1"), 1) > 0)
      .select(col(idCol),
        round(lit(1.0) - element_at(col("__st.s1"), 2).cast("double") /
          element_at(col("__st.s1"), 1), 4).as("dup_word_frac"),
        round(element_at(col("__st.s1"), 3).cast("double") /
          element_at(col("__st.s1"), 1), 4).as("max_word_frac"),
        when(element_at(col("__st.s2"), 1) > 0,
          round(element_at(col("__st.s2"), 3).cast("double") /
            element_at(col("__st.s2"), 1), 4))
          .otherwise(lit(0.0)).as("top_bigram_frac"))
  }

  /** Corpus-wide n-gram counts: explode codegen'd zipped slices (no
    * interpreted per-element lambda), then a two-stage count aggregation. */
  def ngramCounts(docs: org.apache.spark.sql.DataFrame, textCol: String,
                  n: Int): org.apache.spark.sql.DataFrame = {
    val ws = words(col(textCol))
    val castTo = (0 until n).map(j => s"w$j:string").mkString("array<struct<", ",", ">>")
    val zipped = when(size(ws) < n, array().cast(castTo))
      .otherwise(arrays_zip((0 until n).map(j =>
        slice(ws, lit(j + 1), size(ws) - (n - 1)).as(s"w$j")): _*))
    docs.select(explode(zipped).as("__g"))
      .select(concat_ws(" ", (0 until n).map(j => col(s"__g.w$j")): _*).as("ngram"))
      .groupBy("ngram").agg(count(lit(1)).as("cnt"))
  }

  /** Top-k most frequent n-grams (heavy hitters for boilerplate
    * detection): partial aggregation + TakeOrdered — the k results travel,
    * never the full frequency table. Ties break lexicographically. */
  def topNgrams(docs: org.apache.spark.sql.DataFrame, textCol: String,
                n: Int, k: Int): org.apache.spark.sql.DataFrame =
    ngramCounts(docs, textCol, n).orderBy(desc("cnt"), col("ngram")).limit(k)

  /** Per-document top TF-IDF word: tf·ln(N/df), argmax per doc (ties on
    * the rounded score break toward the lexicographically larger word, so
    * the result is engine-portable). Two count aggregations + one
    * word-keyed join — linear, no all-pairs.
    *
    * SEMANTIC CHOICE (not just a scan optimization): N is the number of
    * documents with >= 1 token, derived from the tf table as a broadcast
    * one-row aggregate — NOT total corpus size via a separate
    * `docs.count()` pass (a whole extra 100 TB scan). When wordless
    * documents exist, every word's IDF is computed against the smaller N;
    * since a wordless document contributes to no word's df and produces
    * no output row, this is the self-consistent definition (df <= N always
    * holds, so IDF >= 0). Callers needing classic total-corpus N should
    * count the corpus upstream and pass it through their own column. */
  def tfidfTopWord(docs: org.apache.spark.sql.DataFrame, idCol: String,
                   textCol: String): org.apache.spark.sql.DataFrame = {
    val tf = docs.select(col(idCol), explode(words(col(textCol))).as("__w"))
      .groupBy(col(idCol), col("__w")).agg(count(lit(1)).as("__tf"))
    // ONE pass over tf yields BOTH stats via rollup: the (__w) groups give
    // per-word document frequencies, the grand-total group's distinct-doc
    // count is N — previously two separate aggregations whose differently
    // pruned inputs defeated ReuseExchange (three tokenization passes;
    // two is the floor for corpus-stat-then-score without caching)
    val stats = tf.rollup(col("__w"))
      .agg(count(lit(1)).as("__df"), countDistinct(col(idCol)).as("__ndist"),
        grouping(col("__w")).as("__g"))
    val dfx = stats.filter(col("__g") === 0).select(col("__w"), col("__df"))
    val nd = stats.filter(col("__g") === 1).select(col("__ndist").as("__nd"))
    tf.join(dfx, "__w")
      .crossJoin(broadcast(nd))
      .withColumn("__tfidf", col("__tf") * log(col("__nd").cast("double") / col("__df")))
      .groupBy(col(idCol))
      .agg(max_by(struct(col("__w").as("top_word"), round(col("__tfidf"), 4).as("top_tfidf")),
        struct(round(col("__tfidf"), 6), col("__w"))).as("__t"))
      .select(col(idCol), col("__t.top_word").as("top_word"),
        col("__t.top_tfidf").as("top_tfidf"))
  }

  /** BM25 (Okapi; Lucene's non-negative idf variant `ln(1 + (N - df +
    * 0.5)/(df + 0.5))`) top-k retrieval for a literal term query — the
    * ranked keyword search a corpus-curation pipeline runs to pull
    * topic-relevant documents. The query terms are literals and few, so
    * per-term frequencies become COLUMNS of one projection (no token
    * explode, no token shuffle): one corpus pass feeds a single one-row
    * aggregate carrying N, avgdl, and every per-term df, which broadcasts
    * back to a second pass that scores — two scans, the floor for
    * corpus-stat-then-score without caching. (The exploded formulation
    * referenced its tf table three times — scores, df, corpus stats — and
    * the differently-pushed filters defeated ReuseExchange: three corpus
    * scans plus a token-row shuffle.) Only the k
    * result rows travel (TakeOrdered); ties on the rounded score break
    * toward the lower document id. */
  def bm25TopK(docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
               query: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): org.apache.spark.sql.DataFrame = {
    require(query.nonEmpty, "bm25TopK needs at least one query term")
    val terms = query.distinct.sorted
    val ws = words(col(textCol))
    val perDoc = docs.select(col(idCol) +: size(ws).as("__dl") +:
      terms.zipWithIndex.map { case (t, i) =>
        size(filter(ws, w => w === lit(t))).as(s"__tf$i")
      }: _*)
    val aggCols = count(lit(1)).cast("double").as("__n") +:
      avg(col("__dl")).as("__avgdl") +:
      terms.indices.map(i => sum((col(s"__tf$i") > 0).cast("long")).as(s"__df$i"))
    val stats = perDoc.agg(aggCols.head, aggCols.tail: _*)
    val perTerm = terms.indices.map { i =>
      val idf = log((col("__n") - col(s"__df$i") + lit(0.5)) /
        (col(s"__df$i") + lit(0.5)) + lit(1.0))
      when(col(s"__tf$i") > 0,
        idf * (col(s"__tf$i") * lit(k1 + 1)) /
          (col(s"__tf$i") + lit(k1) * (lit(1 - b) + lit(b) * col("__dl") / col("__avgdl"))))
        .otherwise(lit(0.0))
    }
    perDoc.crossJoin(broadcast(stats))
      .select(col(idCol),
        round(perTerm.reduce(_ + _), 4).as("bm25"),
        terms.indices.map(i => (col(s"__tf$i") > 0).cast("long")).reduce(_ + _).as("n_terms"))
      .filter(col("n_terms") > 0)
      .orderBy(desc("bm25"), col(idCol))
      .limit(k)
  }

  /** Batched BM25 retrieval — the SCALE face of [[bm25TopK]] (which stays
    * as the single-query, literal-term correctness baseline): top-k
    * documents per query for a whole QUERY TABLE at once — the batch
    * retrieval shape of RAG-corpus curation, dedup-by-retrieval, and
    * benchmark-contamination sweeps. Output: (qIdCol, idCol, bm25, rank).
    *
    * Plan shape for 100 TB: the corpus NEVER shuffles by term. Postings
    * (doc, term, tf) come from one partial-aggregated groupBy (a
    * document's tokens sit in one partition, so map-side combine
    * collapses them before the exchange carries per-doc distinct terms
    * once); document frequencies are computed ONLY for the query
    * vocabulary (broadcast semi-join first — the full vocab-sized df
    * table never materializes); and the query-term × idf × avgdl table
    * joins BROADCAST against the postings (a query batch is bounded by
    * contract: thousands of queries × tens of terms — the corpus is the
    * scaled side). A stopword in a query matches every document, so the
    * per-(query, doc) score aggregate is the load-bearing stage: a SUM —
    * partially aggregated map-side like any sum — and the final ranking
    * rides the bounded-heap [[graft.operators.GroupTopK]], so the rank
    * exchange carries queries × k pairs, never candidate lists. Scores
    * round to 4 decimals BEFORE ranking, ties on ascending doc id — rank
    * is stable against fp summation order across engines/partitionings.
    * Same Lucene/Robertson idf as [[bm25TopK]]:
    * ln((N − df + 0.5)/(df + 0.5) + 1). Queries with no words (or no
    * indexed term) return no rows.
    *
    * Streaming queries: micro-batch the query stream into bounded
    * batches and call THIS face per batch (foreachBatch) — deliberately
    * no flatMapGroupsWithState ingest face, because a per-query
    * stateless combine would concentrate a stopword query's
    * corpus-sized match list in ONE task, exactly the shape the batch
    * face's partial-aggregated sum spreads. */
  def bm25Retrieve(docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
                   queries: org.apache.spark.sql.DataFrame, qIdCol: String,
                   qTextCol: String, k: Int,
                   k1: Double = 1.2, b: Double = 0.75,
                   /** default: the bounded-query-batch contract FORCES the
                     * query-term × idf broadcast. Pass false for query
                     * tables beyond broadcast size — the postings join
                     * then shuffles on the term (planner-sized; a hot
                     * stopword term concentrates its probe rows in one
                     * STREAMING task — linear, no sort — and AQE's skew
                     * split can subdivide it), the dedupAgainstCorpus
                     * broadcastRef convention. */
                   broadcastQueries: Boolean = true): org.apache.spark.sql.DataFrame = {
    require(k > 0, s"bm25Retrieve needs k > 0, got $k")
    graft.operators.GroupTopK.requireIntegralId(docs, idCol, "bm25Retrieve")
    // output is (qIdCol, idCol, bm25, rank): reject collisions up front
    // with a named contract error (the topKPerKey convention) — queries
    // drawn from the docs table without renaming their id would otherwise
    // emit two same-named columns and fail downstream as
    // AMBIGUOUS_REFERENCE
    require(qIdCol != idCol,
      s"bm25Retrieve: qIdCol and idCol are both '$idCol' — rename one " +
        "(output is (qIdCol, idCol, bm25, rank))")
    Seq(qIdCol, idCol).foreach(c => require(c != "bm25" && c != "rank",
      s"bm25Retrieve: id column '$c' collides with an output column " +
        "(output is (qIdCol, idCol, bm25, rank))"))
    val ws = words(col(textCol))
    val tf = docs
      .select(col(idCol).as("__did"), ws.as("__w"))
      .select(col("__did"), size(col("__w")).as("__dl"), explode(col("__w")).as("__t"))
      .groupBy(col("__did"), col("__dl"), col("__t"))
      .agg(count(lit(1)).cast("double").as("__tf"))
    // N and avgdl count EVERY document, empty ones included (the explode
    // drops them from the postings but not from the collection stats —
    // the bm25TopK convention)
    val stats = docs.select(size(ws).as("__dl0"))
      .agg(count(lit(1)).cast("double").as("__n"), avg(col("__dl0")).as("__avgdl"))
    val qt = queries.select(col(qIdCol).as("__qid"),
      explode(array_distinct(words(col(qTextCol)))).as("__t"))
    val qVocab = qt.select(col("__t")).distinct()
    val qVocabSide = if (broadcastQueries) broadcast(qVocab) else qVocab
    val dfTab = tf.join(qVocabSide, Seq("__t"), "left_semi")
      .groupBy(col("__t")).agg(count(lit(1)).cast("double").as("__df"))
    val qIdf = qt.join(dfTab, Seq("__t")).crossJoin(stats)
      .select(col("__qid"), col("__t"),
        log((col("__n") - col("__df") + lit(0.5)) / (col("__df") + lit(0.5)) + lit(1.0))
          .as("__idf"),
        col("__avgdl"))
    val qIdfSide = if (broadcastQueries) broadcast(qIdf) else qIdf
    val scored = tf.join(qIdfSide, Seq("__t"))
      .select(col("__qid"), col("__did"),
        (col("__idf") * col("__tf") * lit(k1 + 1) /
          (col("__tf") + lit(k1) * (lit(1 - b) + lit(b) * col("__dl") / col("__avgdl"))))
          .as("__c"))
      .groupBy(col("__qid"), col("__did"))
      .agg(round(sum(col("__c")), 4).as("__bm25"))
    graft.operators.GroupTopK.topKPerKey(scored, Seq("__qid"), "__did",
        col("__bm25"), k, scoreAs = "bm25")
      .select(col("__qid").as(qIdCol), col("__did").as(idCol),
        col("bm25"), col("rank"))
  }

  /** Hybrid retrieval fusion — the BM25 lexical leg and the dense ANN
    * leg fused by reciprocal-rank fusion (Cormack, Clarke & Büttcher
    * 2009: RRF(q, d) = Σ_legs 1/(kRrf + rank_leg), the standard
    * score-free fusion of RAG-corpus curation): each query retrieves its
    * top-`legK` documents by BM25 ([[bm25Retrieve]] over `textCol` vs
    * `qTextCol`) and by cosine over the embedding column
    * ([[Similarity.bruteForceTopKPartial]] by default; pass
    * `ivfCentroids` + `nProbe` to route the dense leg through
    * [[Ivf.search]]'s cell probes for beyond-brute corpora), the legs
    * union as (query, doc, rank) and
    * fuse with ONE groupBy, and the fused top-`k` rides the bounded-heap
    * [[graft.operators.GroupTopK]]. A document on one leg only takes
    * that leg's term (standard RRF). Ranking is on the exact fused
    * double (integer ranks → IEEE-identical across engines) with
    * ascending-id ties; the output `rrf` rounds to 6 decimals AFTER
    * ranking. Leg conventions are kept as their operators define them:
    * the ANN leg excludes the query's own id, the BM25 leg does not (a
    * self-match ranks by its own lexical score).
    *
    * Output: (qIdCol, idCol, rrf, rank), rank 1..k per query.
    *
    * Scale shape: both legs are map-side bounded-heap top-k (the corpus
    * never shuffles by term and never pairs all vectors); the fusion
    * input is queries × 2·legK rows, so the fusing groupBy and the final
    * heap are query-bounded regardless of corpus size. Batch-only on
    * both sides, like its legs — micro-batch a query stream via
    * foreachBatch. */
  def hybridRrfRetrieve(docs: org.apache.spark.sql.DataFrame, idCol: String,
                        textCol: String, vecCol: String,
                        queries: org.apache.spark.sql.DataFrame, qIdCol: String,
                        qTextCol: String, qVecCol: String, k: Int,
                        /** per-leg retrieval depth; 0 (default) = `k`. */
                        legK: Int = 0,
                        /** the RRF smoothing constant (60 in Cormack et
                          * al. and every production default). */
                        kRrf: Int = 60,
                        k1: Double = 1.2, b: Double = 0.75,
                        broadcastQueries: Boolean = true,
                        /** IVF routing for the ANN leg — the beyond-brute
                          * face: with a trained codebook
                          * ([[graft.pipeline.Ivf.train]]) and `nProbe`
                          * > 0, each query scores exact cosine within its
                          * `nProbe` nearest cells ONLY
                          * ([[graft.pipeline.Ivf.search]] — the corpus
                          * never cross-joins the query set). The default
                          * keeps the brute-force leg: exhaustive, exact,
                          * right for corpora one broadcast pass can
                          * scan. */
                        ivfCentroids: Option[org.apache.spark.sql.DataFrame] = None,
                        nProbe: Int = 0): org.apache.spark.sql.DataFrame = {
    require(k > 0, s"hybridRrfRetrieve needs k > 0, got $k")
    require(legK >= 0, s"legK must be >= 0 (0 = use k), got $legK")
    require(kRrf > 0, s"kRrf must be positive, got $kRrf")
    require(ivfCentroids.isEmpty == (nProbe == 0),
      "hybridRrfRetrieve: IVF routing takes BOTH a trained codebook and " +
        s"nProbe > 0 (got centroids=${ivfCentroids.nonEmpty}, nProbe=$nProbe)")
    require(!docs.isStreaming && !queries.isStreaming,
      "hybridRrfRetrieve is batch-only on both sides (corpus-wide " +
        "collection stats + bounded top-k legs); micro-batch a query " +
        "stream via foreachBatch")
    // fail by name BEFORE the BM25 leg's long cast can corrupt a
    // non-integral id into NULLs (the bounded heaps carry (id, score))
    graft.operators.GroupTopK.requireIntegralId(docs, idCol, "hybridRrfRetrieve")
    val lk = if (legK == 0) k else legK
    val bmLeg = bm25Retrieve(docs, idCol, textCol,
        queries.select(col(qIdCol), col(qTextCol)), qIdCol, qTextCol, lk,
        k1, b, broadcastQueries)
      .select(col(qIdCol), col(idCol).cast("long").as(idCol),
        col("rank").cast("long").as("__r"))
    val annLeg = (ivfCentroids match {
      case Some(cent) => graft.pipeline.Ivf.search(
          docs.select(col(idCol), col(vecCol)),
          queries.select(col(qIdCol), col(qVecCol).as(vecCol)),
          idCol, vecCol, qIdCol, cent, topK = lk, nProbe = nProbe,
          broadcastQueries = broadcastQueries)
      case None => graft.pipeline.Similarity.bruteForceTopKPartial(
          docs.select(col(idCol), col(vecCol)),
          queries.select(col(qIdCol), col(qVecCol).as(vecCol)),
          idCol, vecCol, qIdCol, lk)
    }).select(col(qIdCol), col(idCol).cast("long").as(idCol),
      col("rn").cast("long").as("__r"))
    val fused = bmLeg.unionByName(annLeg)
      .groupBy(col(qIdCol), col(idCol))
      .agg(sum(lit(1.0) / (lit(kRrf.toLong) + col("__r"))).as("__rrf"))
    graft.operators.GroupTopK.topKPerKey(fused, Seq(qIdCol), idCol,
        col("__rrf"), k, scoreAs = "rrf")
      .withColumn("rrf", round(col("rrf"), 6))
  }

  /** Sequence packing: assign documents, in a stable order within each
    * partition key, to consecutive training chunks of ~`budget` tokens
    * (streaming-greedy: a chunk takes documents until the budget is
    * crossed, so chunks overflow by at most one document — the standard
    * packing used when assembling fixed-length training sequences).
    *
    * Scale shape: the per-key running token sum is a DISTRIBUTED exact
    * prefix ([[RangedPrefix]] — range partition on the unique
    * (partCol, idCol) total order, one narrow checkpoint of
    * (id, key, n_tokens) rows, per-(range, key) token sums as offsets),
    * not a per-key window. The caller picks `partCol`, and a packing run
    * over one corpus slice — a single source, a single epoch — is a
    * NATURAL call whose coarse key would otherwise fold the entire
    * corpus's prefix sum in one task; with the ranged prefix every task
    * is bounded by the range width regardless of key skew
    * (capTokensPerKey's shape — the same greedy budget walk). Requires
    * `idCol` unique within each key (the order the greedy walk follows;
    * duplicate ids would make the walk itself ill-defined). */
  def packChunks(docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
                 partCol: String, budget: Long): org.apache.spark.sql.DataFrame = {
    require(budget > 0, s"budget=$budget: chunk budget must be positive " +
      "(zero would divide the running token sum by zero)")
    val toks = tokenCountWhitespace(col(textCol)).cast("long")
    val base = docs.select(col(idCol), col(partCol), toks.as("n_tokens"))
    // chunk boundary = floor(prefix EXCLUDING the current doc / budget),
    // on the shared running-sum kernel
    RangedPrefix.runningSum(base, groupCols = Seq(partCol),
        orderCols = Seq(col(idCol)), valueExpr = col("n_tokens"),
        inclusive = false, as = "__pfx")
      .withColumn("chunk_id", floor(col("__pfx") / budget).cast("long"))
      .select(col(idCol), col(partCol), col("n_tokens"), col("chunk_id"))
  }

  /** Frequency-ranked vocabulary: words with >= `minCount` occurrences,
    * top `maxSize` by (count desc, word asc), contiguous ids from 0 in
    * that order. The corpus-wide count is one partial-aggregated shuffle;
    * ranking is DISTRIBUTED: range-partition the counted words by the
    * vocab order, row_number within each range, then add per-range
    * offsets (a #partitions-row driver aggregate) — contiguous global ids
    * with no single-partition window or sort anywhere, and no driver-side
    * top-K merge. The RESULT (bounded by `maxSize`) remains the one
    * intentionally driver-sized artifact of the encode pipeline (it is
    * broadcast by `encodeTokens`), like the IVF codebook. */
  def buildVocab(docs: org.apache.spark.sql.DataFrame, textCol: String,
                 minCount: Long, maxSize: Int): org.apache.spark.sql.DataFrame = {
    // cap where "driver-sized" stops being true (~10^7 rows is already
    // hundreds of MB broadcast; a 10^8 request is a mistake, not a vocab)
    require(maxSize > 0 && maxSize <= 10000000,
      s"maxSize=$maxSize: the vocabulary is collected to the driver and " +
        "broadcast to every encode task; it must stay driver-sized (<= 1e7)")
    import org.apache.spark.sql.expressions.Window
    val spark = docs.sparkSession
    val sc = spark.sparkContext
    // expected "lineage truncated" WARN per id — superseded checkpoints
    // are never re-read (same hygiene as connectedComponents)
    def unpersistIds(ids: Set[Int]): Unit = graft.api.Pinned.unpersist(sc, ids)
    // materialize the counts BEFORE range partitioning: RangePartitioner's
    // boundary sampling is itself a pass over its child, so an
    // uncheckpointed count aggregate would run twice (sampling + shuffle);
    // checkpointed, the corpus-scanning explode+aggregate runs exactly once
    val counted = docs.select(explode(words(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("wcount"))
      .filter(col("wcount") >= minCount)
      .localCheckpoint()
    val countedIds = graft.api.Pinned.idsOf(counted)
    val nBuckets = math.max(1, sc.defaultParallelism)
    // pin ONE bucketing: RangePartitioner's boundary sampling is seeded
    // per-physical-plan, so an unpinned range exchange derives DIFFERENT
    // bucket boundaries in every job that scans it — per-bucket sizes
    // measured in one job would not describe the bucketing the id
    // assignment (or any later re-read) actually sees, corrupting every
    // id past bucket 0. Checkpointing here makes the bucket assignment a
    // fact, not a plan; the per-bucket histogram rides the checkpoint
    // action as an observed metric (the checkpointTracked pattern from
    // connectedComponents) instead of costing a second job.
    val obs = org.apache.spark.sql.Observation()
    val bucketed = counted
      .repartitionByRange(nBuckets, desc("wcount"), col("word"))
      .withColumn("__b", spark_partition_id())
      .observe(obs, graft.functions.VectorFunctions.countByIntKey(col("__b")).as("__sizes"))
      .localCheckpoint()
    val bucketedIds = graft.api.Pinned.idsOf(bucketed)
    val sizes = obs.get("__sizes").asInstanceOf[scala.collection.Map[Int, Long]]
    val offsets = (0 until nBuckets).map(sizes.getOrElse(_, 0L)).scanLeft(0L)(_ + _)
    // ranges come back ordered by partition id (highest counts in range 0),
    // so offset(b) + local rank is the exact global (count desc, word) rank
    val offExpr = element_at(
      map((0 until nBuckets).flatMap(b => Seq(lit(b), lit(offsets(b)))): _*), col("__b"))
    val w = Window.partitionBy(col("__b")).orderBy(desc("wcount"), col("word"))
    // the result is driver-sized by contract (<= maxSize rows; encodeTokens
    // broadcasts it) — materialize it once and release the corpus-sized
    // intermediates NOW: every later consumer re-reads maxSize pinned rows,
    // never the corpus scan or the range exchange (which also guarantees
    // repeated reads agree — the ranking is computed exactly once)
    val out = bucketed
      .withColumn("id", (offExpr + row_number().over(w) - 1).cast("long"))
      .filter(col("id") < maxSize)
      .select(col("word"), col("wcount"), col("id"))
      .localCheckpoint()
    // only the driver-sized result stays pinned; a long-lived service
    // frees it via graft.api.Pinned.release once encoding completes
    graft.api.Pinned.register(spark, graft.api.Pinned.idsOf(out))
    unpersistIds(countedIds ++ bucketedIds)
    out
  }

  /** Encode documents to token-id arrays against a vocabulary frame
    * (`word`, `id`): tokens keep their positions through `posexplode`, the
    * vocab joins broadcast (it is maxSize rows), unknown words become
    * `oovId`, and per-document arrays re-assemble in token order. Output:
    * (idCol, ids array<long>, n_oov). One shuffle on the document id. */
  def encodeTokens(docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
                   vocab: org.apache.spark.sql.DataFrame,
                   oovId: Long = -1L): org.apache.spark.sql.DataFrame =
    docs.select(col(idCol), posexplode(words(col(textCol))).as(Seq("__pos", "__w")))
      .join(broadcast(vocab.select(col("word").as("__w"), col("id"))), Seq("__w"), "left")
      .groupBy(col(idCol))
      .agg(
        transform(
          array_sort(collect_list(struct(col("__pos"),
            coalesce(col("id"), lit(oovId)).as("__id")))),
          s => s.getField("__id")).as("ids"),
        sum(when(col("id").isNull, 1L).otherwise(0L)).as("n_oov"))

  /** Overlapping token-window chunking — splitting long documents into
    * fixed-size windows with stride < size (the RAG-indexing / context-
    * length-preprocessing sibling of `packChunks`). Pure per-row explode:
    * chunk starts are `0, stride, 2·stride, …` while < n_tokens, the last
    * window truncates, chunk_id = start/stride. The token array
    * materializes once before the Generate barrier so per-chunk slicing
    * never re-tokenizes. No shuffle at all — scales with the scan. */
  def chunkTokens(docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
                  chunkSize: Int, stride: Int): org.apache.spark.sql.DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    // zero-word documents produce no chunks (and must not reach sequence():
    // sequence(0, -1, stride) is an ANSI error, the same trap Sampling.scala
    // documents) — the filter mirrors the oracle's empty generate_series
    val base = docs.select(col(idCol), words(col(textCol)).as("__ws"))
      .filter(size(col("__ws")) >= 1)
    base.select(col(idCol), col("__ws"),
        explode(sequence(lit(0), size(col("__ws")) - 1, lit(stride))).as("__s"))
      .select(col(idCol),
        (col("__s") / stride).cast("long").as("chunk_id"),
        concat_ws(" ", slice(col("__ws"), col("__s") + 1, lit(chunkSize))).as("chunk_text"),
        least(lit(chunkSize), size(col("__ws")) - col("__s")).cast("long").as("n_tokens"))
  }

  /** Sentence segmentation in the Java ∩ RE2 regex subset (no
    * lookarounds, so the DuckDB oracle runs the IDENTICAL pattern):
    * maximal runs of non-terminator characters plus their trailing
    * `.?!` run, trimmed, empties dropped. Unpunctuated text is one
    * sentence; an all-punctuation string yields none. A heuristic by
    * design (abbreviations split — the documented trade of every
    * regex segmenter); the value is that it is engine-reproducible. */
  def sentencesOf(text: Column): Column =
    filter(transform(
      regexp_extract_all(text, lit("[^.!?]+[.!?]*"), lit(0)), s => trim(s)),
      s => s =!= "")

  /** Sentence-aware chunking — the RAG-ingestion sibling of
    * [[chunkTokens]] (fixed token windows cut mid-sentence; retrieval
    * chunks should not): consecutive SENTENCES pack greedily into
    * chunks of ~`maxTokens` whitespace tokens, [[packChunks]]'
    * convention exactly (a chunk takes sentences until the budget is
    * crossed, so chunks overflow by at most one sentence; an oversized
    * single sentence gets its own chunk rather than splitting). Output
    * (idCol, chunk_id, chunk_text, n_tokens, n_sentences); documents
    * with no sentences produce no chunks.
    *
    * Scale shape: the running sum is a per-DOCUMENT window — bounded by
    * a single document's sentence count, the operator's natural unit
    * (never a corpus-scale partition). Dual-mode: the streaming face
    * reassembles each arriving document's chunks in the stateless
    * per-batch combine (every sentence row derives from its own input
    * row — the encodeTokensIngest pattern), zero state rows. Requires
    * `idCol` unique (the packChunks contract): duplicate ids would give
    * colliding sentence positions and an arbitrary tie-broken running
    * sum. */
  def chunkSentences(docs: org.apache.spark.sql.DataFrame, idCol: String,
                     textCol: String, maxTokens: Long,
                     sep: String = " "): org.apache.spark.sql.DataFrame = {
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    val e = docs
      .select(col(idCol), posexplode(sentencesOf(col(textCol))).as(Seq("__pos", "__sent")))
      .withColumn("__t", tokenCountWhitespace(col("__sent")).cast("long"))
    // the shared kernel's plain-window face: the group is one DOCUMENT's
    // sentences — the natural bounded unit
    e.withColumn("chunk_id",
        floor(RangedPrefix.windowedSum(Seq(col(idCol)), Seq(col("__pos")),
          col("__t"), inclusive = false) / maxTokens).cast("long"))
      .groupBy(col(idCol), col("chunk_id"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("__pos"), col("__sent")))),
          x => x.getField("__sent")), sep).as("chunk_text"),
        sum(col("__t")).as("n_tokens"),
        count(lit(1)).as("n_sentences"))
  }

  /** Dual-mode [[chunkSentences]] at ingest: batch delegates to the
    * window face (the q_chunk_sent oracle face); streaming explodes each
    * arriving doc's sentences and reassembles chunks in the stateless
    * per-batch combine — identical greedy fold, zero state rows. */
  def chunkSentencesIngest(stream: graft.api.MStream, idCol: String,
                           textCol: String, maxTokens: Long,
                           sep: String = " "): graft.api.MStream = {
    import org.apache.spark.sql.{Encoder, Row}
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    import org.apache.spark.sql.types._
    require(maxTokens > 0, s"maxTokens must be positive, got $maxTokens")
    val df = stream.df
    if (!df.isStreaming)
      return stream.lift(chunkSentences(df, idCol, textCol, maxTokens, sep))
    val u = df
      .select(col(idCol).as("__id"),
        posexplode(sentencesOf(col(textCol))).as(Seq("__pos", "__sent")))
      .withColumn("__t", tokenCountWhitespace(col("__sent")).cast("long"))
    val idType = df.schema(idCol).dataType
    val outT = StructType(Seq(
      StructField("__id", idType),
      StructField("chunk_id", LongType, nullable = false),
      StructField("chunk_text", StringType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("n_sentences", LongType, nullable = false)))
    val outEnc: Encoder[Row] = RowEncoder.encoderFor(outT)
    val (posIdx, sentIdx, tIdx) =
      (u.schema.fieldIndex("__pos"), u.schema.fieldIndex("__sent"),
        u.schema.fieldIndex("__t"))
    val out = graft.streaming.PerBatchCombine(u, Seq("__id"), outEnc) {
        (key: Row, it: Iterator[Row]) =>
          val rows = it.toArray.sortBy(_.getInt(posIdx))
          val chunks = scala.collection.mutable.LinkedHashMap
            .empty[Long, (StringBuilder, Long, Long)]
          var prefix = 0L
          rows.foreach { r =>
            val cid = prefix / maxTokens
            val t = r.getLong(tIdx)
            prefix += t
            chunks.get(cid) match {
              case Some((sb, nt, ns)) =>
                chunks(cid) = (sb.append(sep).append(r.getString(sentIdx)), nt + t, ns + 1)
              case None =>
                chunks(cid) = (new StringBuilder(r.getString(sentIdx)), t, 1L)
            }
          }
          chunks.iterator.map { case (cid, (sb, nt, ns)) =>
            Row(key.get(0), cid, sb.toString, nt, ns)
          }
      }
      .select(col("__id").as(idCol), col("chunk_id"), col("chunk_text"),
        col("n_tokens"), col("n_sentences"))
    stream.lift(out)
  }

  /** Benchmark decontamination — n-gram-overlap hygiene between a training
    * corpus and an evaluation set (the published practice for GPT-3/PaLM
    * training data: drop or flag documents sharing word-n-grams with a
    * benchmark). The benchmark is small by nature, so its distinct n-gram
    * hashes BROADCAST; the corpus side is one explode + broadcast
    * semi-join + per-doc count — the only shuffle carries (doc, hits),
    * never text. Same portable shingle hashes as the dedup stack, so the
    * overlap set is engine-reproducible. */
  def decontaminate(docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
                    bench: org.apache.spark.sql.DataFrame, benchTextCol: String,
                    n: Int = 8, minOverlap: Int = 1): org.apache.spark.sql.DataFrame = {
    val grams = graft.functions.VectorFunctions.wordShingleHashes(col(textCol), n)
    val docGrams = docs.select(col(idCol),
      explode(array_distinct(grams)).as("__g"))
    val benchGrams = bench.select(explode(array_distinct(
      graft.functions.VectorFunctions.wordShingleHashes(col(benchTextCol), n))).as("__g"))
      .distinct()
    val hits = docGrams.join(broadcast(benchGrams), "__g")
      .groupBy(col(idCol)).agg(count(lit(1)).as("__n")) // doc grams are distinct already
    docs.select(col(idCol)).join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("__n"), lit(0L)).as("n_overlap"),
        (coalesce(col("__n"), lit(0L)) >= minOverlap).cast("int").as("contaminated"))
  }

  /** CCNet-style LM quality signal (Wenzek et al., "CCNet: Extracting High
    * Quality Monolingual Datasets from Web Crawl Data", 2020 — their
    * KenLM perplexity filter, with the LM trained on the corpus itself):
    * an add-alpha-smoothed bigram model over adjacent token pairs, each
    * document scored by its average per-pair log-likelihood
    * ln((c(u,v) + a) / (c(u) + a·V)). Low scores flag OCR noise and
    * gibberish; anomalously high ones flag boilerplate (the corpus's own
    * most-repeated continuations).
    *
    * Scale shape: the LM tables derive from ONE corpus pass (context
    * counts and the vocabulary fold over the bigram aggregate, which is
    * `localCheckpoint`ed — it is the trained-model artifact, orders of
    * magnitude smaller than the corpus, and three consumers would
    * otherwise each re-derive the corpus explode); scoring is a second
    * pass joining pairs against the pinned model — the two-scan floor of
    * every corpus-stat-then-score operator here. Pair keys are the token
    * strings so an independent engine reproduces scores exactly; at
    * 100 TB the join key would be a 64-bit pair hash with the strings
    * kept only in the model table. Documents with under 2 tokens score
    * NULL (no pairs). */
  def bigramLmScore(docs: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String, alpha: Double = 0.5): org.apache.spark.sql.DataFrame = {
    val id = col(idCol)
    val pairs = docs
      .select(id, words(col(textCol)).as("__w")).where(size(col("__w")) >= 2)
      .select(id, explode(arrays_zip(
        slice(col("__w"), lit(1), size(col("__w")) - 1).as("u"),
        slice(col("__w"), lit(2), size(col("__w")) - 1).as("v"))).as("__p"))
      .select(id, col("__p.u").as("__u"), col("__p.v").as("__v"))
    val bc = pairs.groupBy(col("__u"), col("__v")).agg(count(lit(1)).as("__c"))
      .localCheckpoint()
    graft.api.Pinned.register(docs.sparkSession, graft.api.Pinned.idsOf(bc))
    val cc = bc.groupBy(col("__u")).agg(sum(col("__c")).as("__cu"))
    val vv = bc.agg(count_distinct(col("__v")).as("__nv"))
    val scored = pairs
      .join(bc, Seq("__u", "__v")).join(cc, Seq("__u"))
      .crossJoin(broadcast(vv))
      .withColumn("__lp", log((col("__c") + alpha) / (col("__cu") + col("__nv") * alpha)))
      .groupBy(id)
      .agg(count(lit(1)).as("n_pairs"), round(avg(col("__lp")), 3).as("avg_logprob"))
    docs.select(id).join(scored, Seq(idCol), "left")
      .select(id, coalesce(col("n_pairs"), lit(0L)).as("n_pairs"), col("avg_logprob"))
  }

  /** Interpolated trigram LM quality score — one model order up from
    * [[bigramLmScore]] toward the 5-gram KenLM real CCNet pipelines score
    * with (counts-based n-gram models are the exact, oracle-able family;
    * the interpolation is Jelinek-Mercer): P(t | u v) =
    * λ3·P̂3(t|u,v) + λ2·P̂2(t|v) + λ1·P̂1(t), each P̂ add-alpha-smoothed
    * over the self-corpus counts with V = the distinct-unigram vocabulary,
    * and each document scored by the average ln P over its trigram
    * positions (< 3 tokens → NULL score, n_tris 0 — the bigram face's
    * convention).
    *
    * Scale shape: the model is three PARTIAL-AGGREGATED count tables —
    * (u,v,t) trigrams, (v,t) bigrams, unigrams — each corpus-token-
    * bounded, shuffled by its own keys, and checkpointed once (two
    * consumers each: its context-total derivation and the scoring join).
    * Scoring joins the exploded positions against the five count frames
    * (equi joins; the planner broadcasts the small ones) plus the
    * one-row (N, V) cross join, then folds per document — the same
    * two-pass stat-then-score floor as the bigram face, one n-gram order
    * deeper. A hot token ("the") concentrates its positions' join rows
    * in one task, but the build sides are count rows and the probe
    * STREAMS (hash join, no per-key sort) — the spans-join posture. */
  def trigramLmScore(docs: org.apache.spark.sql.DataFrame, idCol: String,
                     textCol: String, alpha: Double = 0.5,
                     lambdas: (Double, Double, Double) = (0.6, 0.3, 0.1))
      : org.apache.spark.sql.DataFrame = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    require(!docs.isStreaming,
      "trigramLmScore trains on its own input — batch only (score a stream " +
        "against a static reference with lm3ScoreAgainst)")
    val (l3, l2, l1) = lambdas
    require(l3 >= 0 && l2 >= 0 && l1 >= 0 && math.abs(l3 + l2 + l1 - 1.0) < 1e-9,
      s"lambdas must be non-negative and sum to 1, got $lambdas")
    val id = col(idCol)
    val spark = docs.sparkSession
    val ws = words(col(textCol))
    val tris = docs
      .select(id, ws.as("__w")).where(size(col("__w")) >= 3)
      .select(id, explode(arrays_zip(
        slice(col("__w"), lit(1), size(col("__w")) - 2).as("u"),
        slice(col("__w"), lit(2), size(col("__w")) - 2).as("v"),
        slice(col("__w"), lit(3), size(col("__w")) - 2).as("t"))).as("__p"))
      .select(id, col("__p.u").as("__u"), col("__p.v").as("__v"), col("__p.t").as("__t"))
    // the three count builds are independent actions — pin concurrently
    // (the ngramModel pattern), registered failure-safely on the caller
    import scala.concurrent.Future
    import scala.concurrent.ExecutionContext.Implicits.global
    val done = awaitPinned(spark, Seq(
      Future(graft.api.Pinned.checkpointTracked(
        docs.select(explode(ws).as("__t"))
          .groupBy("__t").agg(count(lit(1)).as("__c1")))),
      Future(graft.api.Pinned.checkpointTracked(
        docs.select(ws.as("__w")).where(size(col("__w")) >= 2)
          .select(explode(arrays_zip(
            slice(col("__w"), lit(1), size(col("__w")) - 1).as("v"),
            slice(col("__w"), lit(2), size(col("__w")) - 1).as("t"))).as("__p"))
          .select(col("__p.v").as("__v"), col("__p.t").as("__t"))
          .groupBy("__v", "__t").agg(count(lit(1)).as("__c2")))),
      Future(graft.api.Pinned.checkpointTracked(
        tris.groupBy("__u", "__v", "__t").agg(count(lit(1)).as("__c3"))))))(_._2)
    val Seq(c1, c2, c3) = done.map(_._1)
    val nv = c1.agg(sum(col("__c1")).cast("double").as("__n"),
      count(lit(1)).cast("double").as("__vv"))
    val c2x = c2.groupBy("__v").agg(sum(col("__c2")).as("__c2x"))
    val c3x = c3.groupBy("__u", "__v").agg(sum(col("__c3")).as("__c3x"))
    val scored = tris
      .join(c3, Seq("__u", "__v", "__t")).join(c3x, Seq("__u", "__v"))
      .join(c2, Seq("__v", "__t")).join(c2x, Seq("__v"))
      .join(c1, Seq("__t"))
      .crossJoin(broadcast(nv))
      .withColumn("__lp", log(
        lit(l3) * (col("__c3") + alpha) / (col("__c3x") + col("__vv") * alpha) +
          lit(l2) * (col("__c2") + alpha) / (col("__c2x") + col("__vv") * alpha) +
          lit(l1) * (col("__c1") + alpha) / (col("__n") + col("__vv") * alpha)))
      .groupBy(id)
      .agg(count(lit(1)).as("n_tris"), round(avg(col("__lp")), 3).as("avg_logprob"))
    docs.select(id).join(scored, Seq(idCol), "left")
      .select(id, coalesce(col("n_tris"), lit(0L)).as("n_tris"), col("avg_logprob"))
  }

  // ================================================================ order-n LM

  /** Jelinek-Mercer weights for [[ngramLmScore]], highest order first.
    * Explicit weights must have `order` entries, be non-negative and sum
    * to 1; `Nil` takes the halving default λ_j ∝ 2^j (normalized), the
    * standard strong-preference-for-the-longest-context prior. */
  private[graft] def lambdasFor(order: Int, lambdas: Seq[Double]): Seq[Double] = {
    if (lambdas.isEmpty) {
      val raw = (order - 1 to 0 by -1).map(j => math.pow(2.0, j))
      val s = raw.sum
      raw.map(_ / s)
    } else {
      require(lambdas.length == order,
        s"ngram LM of order $order needs $order lambdas (highest order " +
          s"first), got ${lambdas.length}")
      require(lambdas.forall(_ >= 0) && math.abs(lambdas.sum - 1.0) < 1e-9,
        s"lambdas must be non-negative and sum to 1, got $lambdas")
      lambdas
    }
  }

  /** Await concurrently-submitted pin futures, registering EVERY
    * completed checkpoint's ids on the CALLING thread (Pinned scopes are
    * thread-local) even when a sibling FAILS — then rethrow the first
    * failure. Without this, one failing count-table build would orphan
    * every sibling's already-persisted blocks (nothing registered, so
    * scope release could never unpersist them); with it the failure
    * path leaks zero blocks. When SEVERAL siblings fail, the others'
    * exceptions attach to the first as suppressed — two concurrent
    * count-table builds failing for different reasons both surface. */
  private[graft] def awaitPinned[A](spark: org.apache.spark.sql.SparkSession,
                                    futs: Seq[scala.concurrent.Future[A]])(
                                    ids: A => Set[Int]): Seq[A] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    import scala.util.{Failure, Success}
    val done = Await.result(
      Future.sequence(futs.map(_.transform(t => Success(t)))), Duration.Inf)
    done.foreach {
      case Success(x) => graft.api.Pinned.register(spark, ids(x))
      case Failure(_) => ()
    }
    done.collectFirst { case Failure(e) =>
      done.foreach {
        case Failure(e2) if !(e2 eq e) && !(e2 eq e.getCause) => e.addSuppressed(e2)
        case _ => ()
      }
      throw e
    }
    done.collect { case Success(x) => x }
  }

  /** Per-order count tables of the n-gram LM: counts(j) is keyed by the
    * last j position columns (__p{order-j+1}..__p{order}) with count
    * __c{j}; ctxs(j) (j >= 2) drops the last key with total __cx{j}.
    * Suffix-aligned key names make every scoring join a plain
    * Seq-column equi join against the position frame. Each table is
    * pinned once (two consumers: its context derivation and the scoring
    * join) — the model artifact, orders of magnitude under corpus size. */
  private def ngramModel(train: org.apache.spark.sql.DataFrame, textCol: String,
                         order: Int,
                         /** prune counts < minCount at orders >= 2 (KenLM
                           * practice — a raw order-5 table is near
                           * position-count-sized; pruning is what makes
                           * the model a broadcastable ARTIFACT at scale;
                           * unigrams never prune, matching KenLM). */
                         minCount: Long = 1L,
                         /** Some(c) = PER-LANGUAGE models in one pass
                           * ([[knModel]]'s convention): column c threads
                           * as key "__l" through every count/context
                           * groupBy, so each language's model is an
                           * independent slice of the same tables. None
                           * keeps the shared-model shape byte-for-byte. */
                         langCol: Option[String] = None)
      : (Map[Int, org.apache.spark.sql.DataFrame],
         Map[Int, org.apache.spark.sql.DataFrame]) = {
    val spark = train.sparkSession
    // materialize the key ONCE under its canonical name (gramsOf
    // re-evaluates its keep expressions on the intermediate frame)
    val train2 = langCol.map(c => train.withColumn("__l", col(c))).getOrElse(train)
    val keyNames: Seq[String] = langCol.map(_ => "__l").toSeq
    val keyKeep: Seq[Column] = keyNames.map(col)
    // the per-order count builds are INDEPENDENT actions; submit their
    // eager checkpoints concurrently (Spark schedules jobs from multiple
    // threads — later small stages fill slots the earlier shuffle leaves
    // idle, cutting the serial job-floor tax of `order` sequential pins)
    // and register the ids on the CALLING thread, where a per-run Pinned
    // scope (thread-local) still captures them
    val counts = {
      import scala.concurrent.Future
      import scala.concurrent.ExecutionContext.Implicits.global
      awaitPinned(spark, (1 to order).map { j =>
        Future {
          val names = gramCols(order, j)
          val raw = gramsOf(train2, textCol, j, names, keyKeep)
            .groupBy((keyNames ++ names).map(col): _*).agg(count(lit(1)).as(s"__c$j"))
          val kept =
            if (j >= 2 && minCount > 1L) raw.filter(col(s"__c$j") >= minCount)
            else raw
          val (cp, ids) = graft.api.Pinned.checkpointTracked(kept)
          (j, cp, ids)
        }
      }.toSeq)(_._3).map { case (j, cp, _) => j -> cp }.toMap
    }
    val ctxs = (2 to order).map { j =>
      val names = gramCols(order, j)
      j -> counts(j).groupBy((keyNames ++ names.dropRight(1)).map(col): _*)
        .agg(sum(col(s"__c$j")).as(s"__cx$j"))
    }.toMap
    (counts, ctxs)
  }

  /** Suffix-aligned key names of the j-gram within an order-n position:
    * __p{n-j+1}..__p{n}. */
  private[pipeline] def gramCols(order: Int, j: Int): Seq[String] =
    (order - j + 1 to order).map(i => s"__p$i")

  private lazy val logger = org.slf4j.LoggerFactory.getLogger("graft.pipeline.TextOps")

  /** Measured persisted bytes (memory + disk blocks) of a PINNED model
    * table — known exactly at decision time because the count tables are
    * localCheckpointed before scoring. Deserialized block sizes
    * overestimate the broadcast wire size, so the auto decision errs
    * toward shuffling — the safe direction. */
  private def pinnedBytes(df: org.apache.spark.sql.DataFrame): Long = {
    val ids = graft.api.Pinned.idsOf(df)
    df.sparkSession.sparkContext.getRDDStorageInfo
      .filter(i => ids.contains(i.id)).map(i => i.memSize + i.diskSize).sum
  }

  /** The AUTO broadcast decision for one pinned model table: its caller
    * passed no explicit lever, so broadcast iff the measured table fits
    * the session's autoBroadcastJoinThreshold (a disabled threshold, -1,
    * auto-broadcasts nothing). Derived frames (context aggregates) are
    * bounded by their pinned parent and inherit its decision. */
  private def decideBroadcast(lever: Option[Boolean],
                              table: org.apache.spark.sql.DataFrame): Boolean =
    lever.getOrElse {
      val thr = table.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
      thr > 0 && pinnedBytes(table) <= thr
    }

  /** Shared lever hygiene of the against faces: warn when an unpruned
    * high-order model is being built (the count tables approach
    * position-count size — the 100 TB posture depends on `minCount`),
    * and name the streaming constraint when the model does not
    * broadcast. */
  private def checkLevers(label: String, order: Int, minCount: Long,
                          streaming: Boolean, allBroadcast: => Boolean): Unit = {
    if (minCount == 1L && order >= 4)
      logger.warn(s"$label: order-$order model with minCount = 1 — the raw " +
        "count tables are near position-count-sized on real corpora; " +
        "KenLM-style pruning (minCount >= 2) is the lever that keeps the " +
        "model a broadcastable artifact at scale")
    require(!streaming || allBroadcast,
      s"$label: the streaming face needs every model table to broadcast " +
        "(a per-micro-batch model shuffle would dominate ingest) but the " +
        "model exceeds the broadcast threshold (or the lever forces " +
        "broadcastModel = false) — prune with minCount until the model " +
        "broadcasts, or score in bounded batches via foreachBatch")
  }

  /** Explode every j-gram position of `d` into suffix-aligned columns
    * `names` (plus `keep`). Documents under j tokens contribute nothing. */
  private[pipeline] def gramsOf(d: org.apache.spark.sql.DataFrame, textCol: String, j: Int,
                      names: Seq[String],
                      keep: Seq[Column]): org.apache.spark.sql.DataFrame = {
    val ws = words(col(textCol))
    d.select(keep :+ ws.as("__w"): _*).where(size(col("__w")) >= j)
      .select(keep :+ explode(arrays_zip(
        (1 to j).map(i =>
          slice(col("__w"), lit(i), size(col("__w")) - (j - 1)).as(s"g$i")): _*)).as("__g"): _*)
      .select(keep ++ (1 to j).map(i => col(s"__g.g$i").as(names(i - 1))): _*)
  }

  /** The interpolated per-position log-likelihood over joined count
    * columns; counts/contexts absent after a LEFT join (the
    * score-against face) coalesce to 0 — the unseen-context backoff
    * (0+α)/(0+Vα) the self-scoring face never needs. */
  private def ngramLp(order: Int, alpha: Double, l: Seq[Double]): Column =
    log((order to 1 by -1).zip(l).map { case (j, w) =>
      val c = coalesce(col(s"__c$j"), lit(0L))
      val cx = if (j >= 2) coalesce(col(s"__cx$j"), lit(0L)) else col("__n")
      lit(w) * (c + lit(alpha)) / (cx + col("__vv") * lit(alpha))
    }.reduce(_ + _))

  /** Order-n interpolated LM quality score — [[trigramLmScore]]
    * parameterized to the 5-gram shape real CCNet pipelines score with
    * (Wenzek et al. 2020 use 5-gram KenLM; the smoothing here is
    * Jelinek-Mercer over add-alpha estimates rather than KenLM's
    * modified Kneser-Ney — the counts-based exact family an independent
    * engine can reproduce bit-for-bit, documented deviation): P(t | ctx)
    * = Σ_j λ_j · P̂_j(t | last j−1 tokens), each P̂_j add-alpha-smoothed
    * with V = the distinct-unigram vocabulary; a document scores the
    * average ln P over its order-n positions (< order tokens → NULL
    * score, n_grams 0).
    *
    * Scale shape: the model is `order` partial-aggregated count tables,
    * each corpus-token-bounded, shuffled by its own keys and checkpointed
    * once; scoring joins the exploded positions against the 2·order−1
    * count frames (suffix-aligned equi joins, planner broadcasts the
    * small ones) plus the one-row (N, V) stats frame, then folds per
    * document — the trigram face's posture at order n. Hot tokens
    * concentrate probe rows but the probe STREAMS (hash join, no per-key
    * sort). */
  def ngramLmScore(docs: org.apache.spark.sql.DataFrame, idCol: String,
                   textCol: String, order: Int, alpha: Double = 0.5,
                   lambdas: Seq[Double] = Nil): org.apache.spark.sql.DataFrame = {
    require(order >= 2 && order <= 8,
      s"ngramLmScore order must be in [2, 8], got $order (order 1 is a " +
        "unigram table, not an LM; past 8 the count tables stop being " +
        "model-sized on real corpora)")
    require(alpha > 0, s"alpha must be positive, got $alpha")
    require(!docs.isStreaming,
      "ngramLmScore trains on its own input — batch only (score a stream " +
        "against a static reference with ngramLmScoreAgainst)")
    val l = lambdasFor(order, lambdas)
    val id = col(idCol)
    val (counts, ctxs) = ngramModel(docs, textCol, order)
    val nv = counts(1).agg(sum(col("__c1")).cast("double").as("__n"),
      count(lit(1)).cast("double").as("__vv"))
    // spread the SCORING stage at order >= 3 (guide §2.5/§2.6): with the
    // count tables broadcast, explode + 2·order−1 joins + partial agg
    // fuse into ONE whole-stage span over the scan, and a single-row-
    // group input serializes it on one core (measured 1.6 s of
    // q_lm5_score's 4.2 s — interleaved A/B: 3.90 → 3.09 s). Order 2's
    // fold is too lean to pay the exchange (q_lm_score A/B: ~+0.17 s) —
    // identity there, as at scale. NOT the r17-rejected count-stage
    // spread: the count builds keep their narrow maps.
    val posIn = if (order >= 3) spreadForCompute(docs) else docs
    val pos = gramsOf(posIn, textCol, order, gramCols(order, order), Seq(id))
    val joined = (order to 2 by -1).foldLeft(pos) { (d, j) =>
      d.join(counts(j), gramCols(order, j))
        .join(ctxs(j), gramCols(order, j).dropRight(1))
    }.join(counts(1), gramCols(order, 1))
      .crossJoin(broadcast(nv))
    val scored = joined.withColumn("__lp", ngramLp(order, alpha, l))
      .groupBy(id)
      .agg(count(lit(1)).as("n_grams"), round(avg(col("__lp")), 3).as("avg_logprob"))
    docs.select(id).join(scored, Seq(idCol), "left")
      .select(id, coalesce(col("n_grams"), lit(0L)).as("n_grams"), col("avg_logprob"))
  }

  /** Dual-mode order-n LM scoring AGAINST a pretrained reference corpus —
    * the full CCNet ingest shape (Wenzek et al. 2020: score crawl text
    * with a 5-gram LM trained on Wikipedia; [[ngramLmScore]] is the
    * self-scoring variant): the `order` add-alpha count tables train on
    * `refDocs` in one pass (pinned — THE model artifact; N and V collect
    * as scalars and fold as literals), then documents — batch frame or
    * arriving stream — score by average interpolated per-position
    * log-likelihood. Positions with contexts/continuations UNSEEN in the
    * reference back off through left joins (count 0 → the smoothed floor
    * (0+α)/(0+Vα)), the piece self-scoring never needs. Documents under
    * `order` tokens emit (n 0, avg_logprob NULL) in both modes.
    * Streaming is 2·order−1 stream-static broadcast joins + the
    * stateless per-batch combine — zero state-store rows. */
  def ngramLmScoreAgainst(stream: graft.api.MStream,
                          refDocs: org.apache.spark.sql.DataFrame,
                          idCol: String, textCol: String, refTextCol: String,
                          order: Int, alpha: Double = 0.5,
                          lambdas: Seq[Double] = Nil,
                          /** Output count-column name — "n_tris" on the
                            * [[lm3ScoreAgainst]] face so order-3 outputs
                            * are drop-in for [[trigramLmScore]]'s. */
                          nCol: String = "n_grams",
                          /** Prune reference counts < minCount at orders
                            * >= 2 (KenLM's --prune): pruned grams score
                            * as unseen (the left-join floor). THE scale
                            * lever — it is what keeps a high-order model
                            * a broadcastable artifact when the reference
                            * corpus is large. */
                          minCount: Long = 1L,
                          /** The broadcast lever, now AUTO by default:
                            * None = decide PER PINNED TABLE from its
                            * measured size vs the session broadcast
                            * threshold (the tables are checkpointed
                            * before scoring, so their statistics are
                            * known); Some(true)/Some(false) force the
                            * round-14 explicit behavior. Streaming
                            * requires every table to broadcast —
                            * Some(false) or an oversized auto decision
                            * is a named error there. */
                          broadcastModel: Option[Boolean] = None): graft.api.MStream = {
    import org.apache.spark.sql.{Encoder, Row}
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    import org.apache.spark.sql.types._
    require(order >= 2 && order <= 8,
      s"ngramLmScoreAgainst order must be in [2, 8], got $order")
    require(alpha > 0, s"alpha must be positive, got $alpha")
    require(!refDocs.isStreaming,
      "ngramLmScoreAgainst: the reference corpus must be a batch frame " +
        "(the model pins once; a streaming reference has no stable artifact)")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val l = lambdasFor(order, lambdas)
    val df = stream.df
    val (counts, ctxs) = ngramModel(refDocs, refTextCol, order, minCount)
    // one decision per pinned count table; the derived context aggregate
    // of order j is bounded by counts(j) and inherits its decision
    val bc = (1 to order).map(j => j -> decideBroadcast(broadcastModel, counts(j))).toMap
    checkLevers("ngramLmScoreAgainst", order, minCount, df.isStreaming,
      (1 to order).forall(bc))
    val nvRow = counts(1).agg(sum(col("__c1")).cast("double"),
      count(lit(1)).cast("double")).head()
    require(!nvRow.isNullAt(0) && nvRow.getDouble(1) > 0,
      "ngramLmScoreAgainst: the reference corpus yields an empty model")
    val (n, vv) = (nvRow.getDouble(0), nvRow.getDouble(1))
    val id = col(idCol)
    def withJoins(pos: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      def side(m: org.apache.spark.sql.DataFrame, j: Int) =
        if (bc(j)) broadcast(m) else m
      (order to 2 by -1).foldLeft(pos) { (d, j) =>
        d.join(side(counts(j), j), gramCols(order, j), "left")
          .join(side(ctxs(j), j), gramCols(order, j).dropRight(1), "left")
      }.join(side(counts(1), 1), gramCols(order, 1), "left")
        .withColumn("__n", lit(n)).withColumn("__vv", lit(vv))
    }
    againstApply(stream, idCol, textCol, order, nCol, withJoins,
      ngramLp(order, alpha, l))
  }

  /** Trigram face of [[ngramLmScoreAgainst]] — completes the CCNet ingest
    * shape at order 3 ([[trigramLmScore]]'s doc points streams here):
    * same count-artifact + broadcast-join machinery as [[lmScoreAgainst]]
    * one order up, output drop-in for [[trigramLmScore]] (n_tris). */
  def lm3ScoreAgainst(stream: graft.api.MStream,
                      refDocs: org.apache.spark.sql.DataFrame,
                      idCol: String, textCol: String, refTextCol: String,
                      alpha: Double = 0.5,
                      lambdas: (Double, Double, Double) = (0.6, 0.3, 0.1),
                      minCount: Long = 1L,
                      broadcastModel: Option[Boolean] = None)
      : graft.api.MStream =
    ngramLmScoreAgainst(stream, refDocs, idCol, textCol, refTextCol, 3, alpha,
      Seq(lambdas._1, lambdas._2, lambdas._3), nCol = "n_tris",
      minCount = minCount, broadcastModel = broadcastModel)

  // ---------------------------------------------------------- Kneser-Ney LM

  /** The interpolated Kneser-Ney model tables for order n (Kneser & Ney
    * 1995; Chen & Goodman 1999's interpolated form — the fixed-discount
    * face [[knLmScore]] and the count-bucketed modified-KN face
    * [[mknLmScore]] both read these tables): raw counts at the
    * top order, CONTINUATION counts below it — ĉ_j(g) = the number of
    * distinct words PRECEDING g in the corpus = the row count of the
    * raw (j+1)-gram table grouped by its last j columns (the "how many
    * contexts has this word completed" estimate that keeps "Francisco"
    * rare outside "San") — and per-context aggregates carrying BOTH the
    * denominator total and N1+ (the discount mass) from ONE groupBy
    * each. Pinned: the top raw table and every continuation table (each
    * has two consumers — its context aggregate and the scoring join);
    * intermediate raw tables are single-consumer and stay lazy.
    * Returns (rawN, ctxN, cont(1..n-1), ctxc(2..n-1), one-row stats
    * (__t1 = total bigram types as double, __n1p1, __nb{1,2,3}1 count
    * buckets, __v = vocabulary)); every context aggregate also carries
    * its count buckets __nb{1,2,3}{j} for the modified-KN face. */
  /** Training-pass counter: how many times [[knModel]] has built its
    * count tables this JVM — ArpaSpec pins the by-language export to ONE
    * training pass (the count tables train once with the language as a
    * key; per-language files are slices, not re-trainings). */
  private[graft] val knModelBuilds = new java.util.concurrent.atomic.AtomicLong(0L)

  private[pipeline] def knModel(train: org.apache.spark.sql.DataFrame, textCol: String,
                      order: Int,
                      /** prune RAW counts < minCount at orders >= 2
                        * BEFORE continuation derivation (so ĉ counts
                        * surviving types — KenLM's pruned-model shape);
                        * the scale lever that keeps a high-order model
                        * broadcastable. */
                      minCount: Long = 1L,
                      /** Some(c) = PER-LANGUAGE models in one pass (the
                        * literal CCNet architecture): column c threads as
                        * key "__l" through every count/context/stats
                        * groupBy, so each language's model is an
                        * independent slice of the same tables; the stats
                        * frame becomes one row per language instead of a
                        * global one-row. None keeps today's shared-model
                        * shape byte-for-byte (an empty key prefix changes
                        * nothing). */
                      langCol: Option[String] = None,
                      /** Sentence-mode training ([[Sentences]]): drop the
                        * lower-order grams whose TARGET is `<s>` and keep
                        * `<s>` out of the vocabulary — it is padding, a
                        * context-only token that is never predicted. */
                      dropBosTargets: Boolean = false)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
         Map[Int, org.apache.spark.sql.DataFrame],
         Map[Int, org.apache.spark.sql.DataFrame],
         org.apache.spark.sql.DataFrame) = {
    knModelBuilds.incrementAndGet()
    val spark = train.sparkSession
    // materialize the key ONCE under its canonical name (gramsOf
    // re-evaluates its keep expressions on the intermediate frame, so an
    // aliased keep would not resolve on the second select)
    val train2 = langCol.map(c => train.withColumn("__l", col(c))).getOrElse(train)
    val keyNames: Seq[String] = langCol.map(_ => "__l").toSeq
    val keyKeep: Seq[Column] = keyNames.map(col)
    def keyed(names: Seq[String]): Seq[Column] = (keyNames ++ names).map(col)
    def raw(j: Int): org.apache.spark.sql.DataFrame = {
      val g0 = gramsOf(train2, textCol, j, gramCols(order, j), keyKeep)
      // sentence mode: a gram ending at the `<s>` padding is not an
      // event (only the top order is pad-free by construction)
      val g = if (dropBosTargets)
        g0.filter(col(gramCols(order, j).last) =!= lit("<s>")) else g0
      val c = g.groupBy(keyed(gramCols(order, j)): _*)
        .agg(count(lit(1)).as(s"__cr$j"))
      if (j >= 2 && minCount > 1L) c.filter(col(s"__cr$j") >= minCount) else c
    }
    // independent count builds pin CONCURRENTLY (the ngramModel pattern);
    // only cont(order-1) depends on the pinned top table and chains off
    // its future. Ids register on the CALLING thread (Pinned scopes are
    // thread-local).
    import scala.concurrent.Future
    import scala.concurrent.ExecutionContext.Implicits.global
    def contOf(src: org.apache.spark.sql.DataFrame, j: Int) =
      graft.api.Pinned.checkpointTracked(
        src.groupBy(keyed(gramCols(order, j)): _*)
          .agg(count(lit(1)).as(s"__cc$j")))
    val rawNF = Future { (order, graft.api.Pinned.checkpointTracked(raw(order))) }
    val contFs = (1 until order).map { j =>
      if (j + 1 == order) rawNF.map { case (_, (cp, _)) => (j, contOf(cp, j)) }
      else Future { (j, contOf(raw(j + 1), j)) }
    }
    val all = awaitPinned(spark, rawNF +: contFs.toSeq)(_._2._2)
    val rawN = all.find(_._1 == order).get._2._1
    val contDone = all.filter(_._1 != order)
    // per-context COUNT BUCKETS (types with count 1 / 2 / >= 3) ride the
    // same groupBy — the fixed-discount face ignores them, the
    // modified-KN face's per-context discount mass γ·tot = D1·N1 + D2·N2
    // + D3·N3+ reads them (Chen & Goodman 1999 §3, KenLM's smoothing)
    def buckets(cCol: String, suffix: String): Seq[Column] = Seq(
      count(when(col(cCol) === 1, true)).as(s"__nb1$suffix"),
      count(when(col(cCol) === 2, true)).as(s"__nb2$suffix"),
      count(when(col(cCol) >= 3, true)).as(s"__nb3$suffix"))
    val ctxN = rawN.groupBy(keyed(gramCols(order, order).dropRight(1)): _*)
      .agg(sum(col(s"__cr$order")).as(s"__tot$order"),
        (count(lit(1)).as(s"__n1p$order") +:
          buckets(s"__cr$order", order.toString)): _*)
    val cont = contDone.map { case (j, (cp, _)) => j -> cp }.toMap
    val ctxc = (2 until order).map { j =>
      j -> cont(j).groupBy(keyed(gramCols(order, j).dropRight(1)): _*)
        .agg(sum(col(s"__cc$j")).as(s"__ctot$j"),
          (count(lit(1)).as(s"__n1p$j") +: buckets(s"__cc$j", j.toString)): _*)
    }.toMap
    val statAggs = sum(col("__cc1")).cast("double").as("__t1") +:
      (count(lit(1)).as("__n1p1") +: buckets("__cc1", "1"))
    // sentence mode: `<s>` is padding, not a predictable token — it
    // stays out of the vocabulary (the `</s>` event IS predictable and
    // counts, KenLM's convention)
    def vocabTokens(d: org.apache.spark.sql.DataFrame, keep: Seq[Column]) = {
      val t = d.select(keep :+ explode(words(col(textCol))).as("__t"): _*)
      if (dropBosTargets) t.where(col("__t") =!= lit("<s>")) else t
    }
    val stats = langCol match {
      case None =>
        cont(1).agg(statAggs.head, statAggs.tail: _*)
          .crossJoin(vocabTokens(train, Nil)
            .agg(count_distinct(col("__t")).as("__v")))
      case Some(_) =>
        val t1s = cont(1).groupBy(col("__l")).agg(statAggs.head, statAggs.tail: _*)
        val vocabs = vocabTokens(train2, Seq(col("__l").as("__lv")))
          .groupBy(col("__lv")).agg(count_distinct(col("__t")).as("__v"))
        // null-safe: a null LANGUAGE is its own model, the engine-wide
        // null-group convention
        t1s.join(vocabs, col("__l") <=> col("__lv")).drop("__lv")
    }
    (rawN, ctxN, cont, ctxc, stats)
  }

  /** The interpolated-KN per-position log-likelihood over joined count
    * columns, folded from the continuation-unigram base up: P_1
    * interpolates with the uniform 1/(V+1) floor (one reserved unknown
    * slot) so tokens unseen in the model keep mass; each level j backs
    * off ENTIRELY to level j−1 when its context is unseen (the left-join
    * face — a seen context always takes max(c−D,0)/total + D·N1+/total
    * · P_{j−1}). On the self-scoring inner-join face every guard is
    * true by construction and the fold is the plain interpolated-KN
    * formula the oracle mirrors without the CASEs. */
  private def knLp(order: Int, discount: Double): Column = {
    val dd = lit(discount)
    var p: Column =
      greatest(coalesce(col("__cc1"), lit(0L)).cast("double") - dd, lit(0.0)) /
        col("__t1") +
        dd * col("__n1p1") / col("__t1") * (lit(1.0) / (col("__v") + lit(1.0)))
    for (j <- 2 until order) {
      val hi =
        greatest(coalesce(col(s"__cc$j"), lit(0L)).cast("double") - dd, lit(0.0)) /
          col(s"__ctot$j") +
          dd * col(s"__n1p$j") / col(s"__ctot$j") * p
      p = when(coalesce(col(s"__ctot$j"), lit(0L)) > 0, hi).otherwise(p)
    }
    val hiN =
      greatest(coalesce(col(s"__cr$order"), lit(0L)).cast("double") - dd, lit(0.0)) /
        col(s"__tot$order") +
        dd * col(s"__n1p$order") / col(s"__tot$order") * p
    log(when(coalesce(col(s"__tot$order"), lit(0L)) > 0, hiN).otherwise(p))
  }

  /** KenLM's default `--discount_fallback` discounts (D1, D2, D3+). */
  private[graft] val MknFallback: (Double, Double, Double) = (0.5, 1.0, 1.5)

  /** Modified-KN discounts for one order from its count-of-counts
    * (Chen & Goodman 1999 §3; KenLM `AdjustCounts`): Y = n1/(n1+2n2),
    * D_r = r − (r+1)·Y·n_{r+1}/n_r for r = 1, 2, 3. KenLM refuses to
    * train when any n_r (r ≤ 3) is zero or a discount leaves [0, r];
    * this engine takes KenLM's `--discount_fallback` route instead —
    * the estimate is all-or-none per order (one bad discount falls the
    * whole order back), so the decision is a deterministic scalar an
    * oracle reproduces. n4 = 0 is VALID (D3+ = 3 exactly: triples hold
    * no direct mass, everything flows through γ). */
  private[graft] def mknDerive(n1: Long, n2: Long, n3: Long, n4: Long,
                               fallback: (Double, Double, Double) = MknFallback)
      : (Double, Double, Double) = {
    if (n1 > 0 && n2 > 0 && n3 > 0) {
      val y = n1.toDouble / (n1 + 2.0 * n2)
      val d1 = 1.0 - 2.0 * y * n2 / n1
      val d2 = 2.0 - 3.0 * y * n3 / n2
      val d3 = 3.0 - 4.0 * y * n4 / n3
      if (d1 >= 0 && d1 <= 1 && d2 >= 0 && d2 <= 2 && d3 >= 0 && d3 <= 3)
        (d1, d2, d3)
      else fallback
    } else fallback
  }

  /** Validate an explicit per-level discount map (or an empty one =
    * derive) and the fallback triple for the modified-KN faces. */
  private[pipeline] def checkMknParams(order: Int,
                             discounts: Map[Int, (Double, Double, Double)],
                             fallback: (Double, Double, Double)): Unit = {
    def checkTriple(what: String, t: (Double, Double, Double)): Unit = {
      val (d1, d2, d3) = t
      require(d1 > 0 && d1 <= 1 && d2 > 0 && d2 <= 2 && d3 > 0 && d3 <= 3,
        s"$what discounts must satisfy 0 < D1 <= 1, 0 < D2 <= 2, " +
          s"0 < D3+ <= 3, got ($d1, $d2, $d3)")
    }
    checkTriple("fallback", fallback)
    if (discounts.nonEmpty) {
      require(discounts.keySet == (1 to order).toSet,
        s"explicit modified-KN discounts must cover every level 1..$order " +
          s"(highest = raw counts, lower = continuation counts), got " +
          s"levels ${discounts.keySet.toSeq.sorted.mkString(",")}")
      discounts.foreach { case (j, t) => checkTriple(s"level-$j", t) }
    }
  }

  /** Count-of-counts per level over the PINNED model tables (top level =
    * the raw order-n table, lower levels = the continuation tables —
    * exactly the tables each level draws probability mass from), folded
    * to discounts via [[mknDerive]]. The aggs are independent scalar
    * collects over checkpointed tables; submit them concurrently like
    * the table builds themselves. */
  private[pipeline] def mknDiscountsFor(order: Int, rawN: org.apache.spark.sql.DataFrame,
                              cont: Map[Int, org.apache.spark.sql.DataFrame],
                              fallback: (Double, Double, Double))
      : Map[Int, (Double, Double, Double)] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val futs = (1 to order).map { j =>
      Future {
        val (t, c) =
          if (j == order) (rawN, s"__cr$order") else (cont(j), s"__cc$j")
        val r = t.agg(
          count(when(col(c) === 1, true)).as("n1"),
          count(when(col(c) === 2, true)).as("n2"),
          count(when(col(c) === 3, true)).as("n3"),
          count(when(col(c) === 4, true)).as("n4")).head()
        j -> mknDerive(r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          fallback)
      }
    }
    Await.result(Future.sequence(futs), Duration.Inf).toMap
  }

  /** [[mknDerive]] as COLUMN arithmetic over per-language count-of-counts
    * (n1..n4 columns) — same expression shapes, same all-or-none validity
    * rule, so a per-language discount table is derivable in-plan and an
    * oracle reproduces every language's decision. Returns (d1, d2, d3)
    * columns named `__d1$sfx`/`__d2$sfx`/`__d3$sfx`. */
  private def mknDeriveCols(sfx: String, fallback: (Double, Double, Double))
      : Seq[Column] = {
    val (n1, n2, n3, n4) = (col("__n1"), col("__n2"), col("__n3"), col("__n4"))
    val y = n1.cast("double") / (n1 + lit(2.0) * n2)
    val dv1 = lit(1.0) - lit(2.0) * y * n2 / n1
    val dv2 = lit(2.0) - lit(3.0) * y * n3 / n2
    val dv3 = lit(3.0) - lit(4.0) * y * n4 / n3
    // NESTED CaseWhen: the divisions only evaluate once n1..n3 > 0 holds
    // (CaseWhen branches are lazy; ANSI double division by zero throws)
    val some = n1 > 0 && n2 > 0 && n3 > 0
    val bounds = dv1 >= 0 && dv1 <= 1 && dv2 >= 0 && dv2 <= 2 &&
      dv3 >= 0 && dv3 <= 3
    val (f1, f2, f3) = fallback
    def pick(dv: Column, f: Double): Column =
      when(some, when(bounds, dv).otherwise(lit(f))).otherwise(lit(f))
    Seq(pick(dv1, f1).as(s"__d1$sfx"), pick(dv2, f2).as(s"__d2$sfx"),
      pick(dv3, f3).as(s"__d3$sfx"))
  }

  /** Per-LANGUAGE modified-KN discounts, every level in ONE small frame
    * keyed __l: each level's count table groups by language into
    * count-of-counts, derives (D1, D2, D3+) via [[mknDeriveCols]], and
    * the levels left-join onto level 1's language set (a language with
    * any bigram has level-1 continuations; higher levels may be absent —
    * their discount columns stay NULL and are never read, because the
    * back-off guards skip a level whose context total is 0/NULL). */
  private[pipeline] def mknLangDiscounts(order: Int, rawN: org.apache.spark.sql.DataFrame,
                               cont: Map[Int, org.apache.spark.sql.DataFrame],
                               fallback: (Double, Double, Double))
      : org.apache.spark.sql.DataFrame = {
    def level(j: Int): org.apache.spark.sql.DataFrame = {
      val (t, c) = if (j == order) (rawN, s"__cr$order") else (cont(j), s"__cc$j")
      t.groupBy(col("__l")).agg(
          count(when(col(c) === 1, true)).as("__n1"),
          count(when(col(c) === 2, true)).as("__n2"),
          count(when(col(c) === 3, true)).as("__n3"),
          count(when(col(c) === 4, true)).as("__n4"))
        .select(col("__l") +: mknDeriveCols(s"_$j", fallback): _*)
    }
    (2 to order).foldLeft(level(1)) { (acc, j) =>
      acc.join(level(j), Seq("__l"), "left")
    }
  }

  /** [[mknLp]] with PER-LANGUAGE discount COLUMNS (`__d{1,2,3}_$j`,
    * joined by __l) instead of driver literals — the by-language face's
    * probability fold; NULL stats/discounts (unmodeled language)
    * propagate to a NULL score. */
  private def mknLpByLang(order: Int): Column = {
    def disc(j: Int, c: Column): Column =
      when(c === 1L, col(s"__d1_$j")).when(c === 2L, col(s"__d2_$j"))
        .otherwise(col(s"__d3_$j"))
    def gnum(j: Int): Column =
      col(s"__d1_$j") * col(s"__nb1$j") + col(s"__d2_$j") * col(s"__nb2$j") +
        col(s"__d3_$j") * col(s"__nb3$j")
    val c1 = coalesce(col("__cc1"), lit(0L))
    var p: Column =
      greatest(c1.cast("double") - disc(1, c1), lit(0.0)) / col("__t1") +
        gnum(1) / col("__t1") * (lit(1.0) / (col("__v") + lit(1.0)))
    for (j <- 2 until order) {
      val cj = coalesce(col(s"__cc$j"), lit(0L))
      val hi =
        greatest(cj.cast("double") - disc(j, cj), lit(0.0)) / col(s"__ctot$j") +
          gnum(j) / col(s"__ctot$j") * p
      p = when(coalesce(col(s"__ctot$j"), lit(0L)) > 0, hi).otherwise(p)
    }
    val cN = coalesce(col(s"__cr$order"), lit(0L))
    val hiN =
      greatest(cN.cast("double") - disc(order, cN), lit(0.0)) / col(s"__tot$order") +
        gnum(order) / col(s"__tot$order") * p
    log(when(coalesce(col(s"__tot$order"), lit(0L)) > 0, hiN).otherwise(p))
  }

  /** The modified-KN per-position log-likelihood: [[knLp]] with the
    * fixed D replaced by count-bucketed discounts — the discount of a
    * count is D1/D2/D3+ by its bucket, and the back-off mass of a
    * context is γ·tot = D1·N1 + D2·N2 + D3·N3+ over that context's
    * continuation-type buckets. Same guards as [[knLp]]: unseen contexts
    * skip their level entirely (against face); on the self face every
    * guard is true by construction. With equal discounts at every bucket
    * this reduces exactly to [[knLp]] (D·(N1+N2+N3+) = D·N1+), which
    * KnLmSpec pins. */
  private def mknLp(order: Int, ds: Map[Int, (Double, Double, Double)]): Column = {
    def disc(j: Int, c: Column): Column = {
      val (d1, d2, d3) = ds(j)
      when(c === 1L, lit(d1)).when(c === 2L, lit(d2)).otherwise(lit(d3))
    }
    def gnum(j: Int): Column = {
      val (d1, d2, d3) = ds(j)
      lit(d1) * col(s"__nb1$j") + lit(d2) * col(s"__nb2$j") +
        lit(d3) * col(s"__nb3$j")
    }
    val c1 = coalesce(col("__cc1"), lit(0L))
    var p: Column =
      greatest(c1.cast("double") - disc(1, c1), lit(0.0)) / col("__t1") +
        gnum(1) / col("__t1") * (lit(1.0) / (col("__v") + lit(1.0)))
    for (j <- 2 until order) {
      val cj = coalesce(col(s"__cc$j"), lit(0L))
      val hi =
        greatest(cj.cast("double") - disc(j, cj), lit(0.0)) / col(s"__ctot$j") +
          gnum(j) / col(s"__ctot$j") * p
      p = when(coalesce(col(s"__ctot$j"), lit(0L)) > 0, hi).otherwise(p)
    }
    val cN = coalesce(col(s"__cr$order"), lit(0L))
    val hiN =
      greatest(cN.cast("double") - disc(order, cN), lit(0.0)) / col(s"__tot$order") +
        gnum(order) / col(s"__tot$order") * p
    log(when(coalesce(col(s"__tot$order"), lit(0L)) > 0, hiN).otherwise(p))
  }

  /** Order-n interpolated Kneser-Ney LM quality score over the corpus
    * itself — the KenLM smoothing FAMILY at a fixed discount (real KenLM
    * is modified KN: three count-bucketed discounts per order; the fixed-D
    * interpolated form is the exact, oracle-able member — Chen & Goodman
    * 1999 §3). Counts-based and deterministic: an independent engine
    * reproduces scores bit-for-bit, which absolute-discounting keeps and
    * KenLM's float quantization would not. Documents under `order`
    * tokens score (n_grams 0, NULL).
    *
    * Scale shape: the model is the raw top-order table plus n−2
    * continuation tables (each a partial-aggregated groupBy over the
    * order above, corpus-token-bounded, pinned once); scoring joins the
    * exploded positions against count frames exactly like
    * [[ngramLmScore]] — same two-pass stat-then-score floor, same
    * streamed-probe posture under hot tokens. */
  def knLmScore(docs: org.apache.spark.sql.DataFrame, idCol: String,
                textCol: String, order: Int,
                discount: Double = 0.75): org.apache.spark.sql.DataFrame = {
    require(order >= 2 && order <= 8,
      s"knLmScore order must be in [2, 8], got $order")
    require(discount > 0 && discount < 1,
      s"discount must be in (0, 1), got $discount")
    require(!docs.isStreaming,
      "knLmScore trains on its own input — batch only (score a stream " +
        "against a static reference with knLmScoreAgainst)")
    knSelfScore(docs, idCol, textCol, order, (_, _) => knLp(order, discount))
  }

  /** The shared self-scoring stage of the KN family: build the model on
    * the input itself, inner-join the exploded positions against every
    * count frame (a position's own occurrence puts every suffix, context
    * and continuation in the model, so nothing is absent on the self
    * face) and fold per document. `lpOf(rawN, cont)` supplies the
    * per-position log-likelihood — a constant column for the fixed
    * discount, a derived-discount column for modified KN (the tables are
    * pinned before it runs, so scalar derivations are cheap). */
  private def knSelfScore(docs: org.apache.spark.sql.DataFrame, idCol: String,
                          textCol: String, order: Int,
                          lpOf: (org.apache.spark.sql.DataFrame,
                                 Map[Int, org.apache.spark.sql.DataFrame]) => Column)
      : org.apache.spark.sql.DataFrame = {
    val id = col(idCol)
    val (rawN, ctxN, cont, ctxc, stats) = knModel(docs, textCol, order)
    val lp = lpOf(rawN, cont)
    // NO scoring-stage spread here (unlike the against/by-lang faces):
    // the self-score face inner-joins and its plain-KN fold is lean —
    // interleaved A/B measured the added exchange as a LOSS on
    // q_kn3_score (1.6 → 1.9/2.0 s, two rounds) and flat on q_mkn3_score
    val pos = gramsOf(docs, textCol, order, gramCols(order, order), Seq(id))
    var joined = pos.join(rawN, gramCols(order, order))
      .join(ctxN, gramCols(order, order).dropRight(1))
    for (j <- order - 1 to 2 by -1)
      joined = joined.join(cont(j), gramCols(order, j))
        .join(ctxc(j), gramCols(order, j).dropRight(1))
    joined = joined.join(cont(1), gramCols(order, 1))
      .crossJoin(broadcast(stats))
    val scored = joined.withColumn("__lp", lp)
      .groupBy(id)
      .agg(count(lit(1)).as("n_grams"), round(avg(col("__lp")), 3).as("avg_logprob"))
    docs.select(id).join(scored, Seq(idCol), "left")
      .select(id, coalesce(col("n_grams"), lit(0L)).as("n_grams"), col("avg_logprob"))
  }

  /** Order-n MODIFIED Kneser-Ney LM quality score over the corpus itself
    * — KenLM parity, closing [[knLmScore]]'s documented deviation: three
    * count-bucketed discounts per level (D1, D2, D3+), each derived from
    * that level's count-of-counts by the Chen & Goodman 1999 §3 /
    * KenLM `AdjustCounts` estimator with KenLM's `--discount_fallback`
    * semantics when the estimate is degenerate ([[mknDerive]] — the
    * all-or-none per-order rule an independent engine reproduces
    * exactly). Pass `discounts` to override derivation per level
    * (level 1 = continuation unigrams, level `order` = raw counts).
    *
    * Scale shape: identical to [[knLmScore]] — the count tables ARE the
    * model; the only addition is one four-scalar agg per pinned table
    * (submitted concurrently) and three small longs per context row. */
  def mknLmScore(docs: org.apache.spark.sql.DataFrame, idCol: String,
                 textCol: String, order: Int,
                 discounts: Map[Int, (Double, Double, Double)] = Map.empty,
                 fallback: (Double, Double, Double) = MknFallback)
      : org.apache.spark.sql.DataFrame = {
    require(order >= 2 && order <= 8,
      s"mknLmScore order must be in [2, 8], got $order")
    require(!docs.isStreaming,
      "mknLmScore trains on its own input — batch only (score a stream " +
        "against a static reference with mknLmScoreAgainst)")
    checkMknParams(order, discounts, fallback)
    knSelfScore(docs, idCol, textCol, order, (rawN, cont) => mknLp(order,
      if (discounts.nonEmpty) discounts
      else mknDiscountsFor(order, rawN, cont, fallback)))
  }

  /** Dual-mode order-n Kneser-Ney scoring AGAINST a pretrained reference
    * corpus — the literal CCNet shape (Wenzek et al. 2020 score crawl
    * text with 5-gram KenLM trained on Wikipedia). Counts train on
    * `refDocs` ([[knModel]]); arriving documents score through LEFT
    * joins with full back-off: an unseen context skips its level
    * entirely (γ = 1 in the standard formulation), an unseen token
    * bottoms out at the uniform 1/(V+1) floor. Streaming is stream-static
    * broadcast joins + the stateless per-batch combine — zero state rows,
    * the [[ngramLmScoreAgainst]] posture. */
  def knLmScoreAgainst(stream: graft.api.MStream,
                       refDocs: org.apache.spark.sql.DataFrame,
                       idCol: String, textCol: String, refTextCol: String,
                       order: Int, discount: Double = 0.75,
                       /** Prune reference raw counts < minCount at orders
                         * >= 2 before continuation derivation (KenLM's
                         * --prune): pruned grams back off like unseen
                         * ones. The scale lever that keeps a high-order
                         * model a broadcastable artifact. */
                       minCount: Long = 1L,
                       /** None (default) = AUTO: per pinned table from
                         * its measured size vs the broadcast threshold;
                         * Some(false) = unhinted model joins (planner/
                         * AQE-sized) for a beyond-broadcast model, batch
                         * face only — streaming requires every table to
                         * broadcast. */
                       broadcastModel: Option[Boolean] = None,
                       /** Sentence-delimited `<s>`/`</s>` windowing on
                         * BOTH sides ([[Sentences]]) — each sentence
                         * scores its n words plus one `</s>` event under
                         * `<s>`-padded contexts; the opt-in that makes a
                         * sentence-trained artifact ([[Arpa]]'s
                         * `sentenceMode` export) numerically drop-in. */
                       sentenceMode: Boolean = false): graft.api.MStream = {
    require(discount > 0 && discount < 1,
      s"discount must be in (0, 1), got $discount")
    knAgainstScore(stream, refDocs, idCol, textCol, refTextCol, order,
      minCount, broadcastModel, "knLmScoreAgainst",
      (_, _) => knLp(order, discount), sentenceMode = sentenceMode)
  }

  /** PER-LANGUAGE Kneser-Ney scoring against a LABELED reference corpus —
    * the literal CCNet architecture (Wenzek et al. train one 5-gram
    * KenLM PER LANGUAGE on that language's Wikipedia; the shared-model
    * [[knLmScoreAgainst]] was the documented deviation): every
    * language's model trains in ONE pass (the language threads as a key
    * through every count/context/stats groupBy — no per-language driver
    * loop, no separate jobs per language), and each document scores
    * under ITS OWN language's model with full back-off. Documents whose
    * language has no reference model (or whose language's slice yields
    * no bigram) keep their position count and take a NULL score — the
    * deterministic no-model verdict, like [[bucketByThresholds]]'s
    * unknown-language bucket; a null language is its own model (the
    * engine-wide null-group convention, carried through the joins by
    * struct-wrapped keys — struct equality treats null fields as equal,
    * so plain hash-join keys stay null-safe). Dual-mode: streaming is
    * stream-static broadcast joins + the stateless per-batch combine.
    *
    * Scale shape: identical tables to [[knLmScoreAgainst]] with one more
    * key column — per-language models are SLICES of the same pinned
    * artifacts, so the count shuffles, the broadcast decisions (per
    * pinned table, AUTO lever) and the streamed-probe posture all carry
    * over; the per-language stats frame (languages × 7) always
    * broadcasts. */
  def knLmScoreAgainstByLang(stream: graft.api.MStream,
                             refDocs: org.apache.spark.sql.DataFrame,
                             idCol: String, textCol: String, langCol: String,
                             refTextCol: String, refLangCol: String,
                             order: Int, discount: Double = 0.75,
                             minCount: Long = 1L,
                             broadcastModel: Option[Boolean] = None)
      : graft.api.MStream = {
    require(discount > 0 && discount < 1,
      s"discount must be in (0, 1), got $discount")
    knByLangScore(stream, refDocs, idCol, textCol, langCol, refTextCol,
      refLangCol, order, minCount, broadcastModel, "knLmScoreAgainstByLang",
      (_, _) => (knLp(order, discount), None))
  }

  /** Per-language MODIFIED-KN scoring against a labeled reference — the
    * complete CCNet matrix cell (per-language models AND KenLM's real
    * smoothing): each language's three count-bucketed discounts derive
    * from ITS OWN slices' count-of-counts ([[mknDeriveCols]] — the same
    * all-or-none `--discount_fallback` rule as [[mknDerive]], per
    * language), joined onto the scoring rows as a languages-sized
    * discount frame. Unmodeled languages keep their position count with
    * a NULL score; dual-mode like [[knLmScoreAgainstByLang]]. */
  def mknLmScoreAgainstByLang(stream: graft.api.MStream,
                              refDocs: org.apache.spark.sql.DataFrame,
                              idCol: String, textCol: String, langCol: String,
                              refTextCol: String, refLangCol: String,
                              order: Int,
                              fallback: (Double, Double, Double) = MknFallback,
                              minCount: Long = 1L,
                              broadcastModel: Option[Boolean] = None)
      : graft.api.MStream = {
    checkMknParams(order, Map.empty, fallback)
    knByLangScore(stream, refDocs, idCol, textCol, langCol, refTextCol,
      refLangCol, order, minCount, broadcastModel, "mknLmScoreAgainstByLang",
      (rawN, cont) => (mknLpByLang(order),
        Some(mknLangDiscounts(order, rawN, cont, fallback))))
  }

  /** The shared per-language against engine: [[knAgainstScore]]'s shape
    * with the language key threaded through every table and join.
    * `lpOf(rawN, cont)` returns the per-position column plus an optional
    * languages-sized side frame (per-language discounts) joined by __l. */
  private def knByLangScore(stream: graft.api.MStream,
                            refDocs: org.apache.spark.sql.DataFrame,
                            idCol: String, textCol: String, langCol: String,
                            refTextCol: String, refLangCol: String,
                            order: Int, minCount: Long,
                            broadcastModel: Option[Boolean], label: String,
                            lpOf: (org.apache.spark.sql.DataFrame,
                                   Map[Int, org.apache.spark.sql.DataFrame]) =>
                              (Column, Option[org.apache.spark.sql.DataFrame]))
      : graft.api.MStream = {
    import org.apache.spark.sql.{Encoder, Row}
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    import org.apache.spark.sql.types._
    require(order >= 2 && order <= 8, s"$label order must be in [2, 8], got $order")
    require(!refDocs.isStreaming,
      s"$label: the reference corpus must be a batch frame " +
        "(the models pin once; a streaming reference has no stable artifact)")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val df = stream.df
    // struct-wrapped language key: null-safe under plain equi-join keys
    val refKeyed = refDocs.withColumn("__lraw", struct(col(refLangCol)))
    val (rawN, ctxN, cont, ctxc, stats) =
      knModel(refKeyed, refTextCol, order, minCount, langCol = Some("__lraw"))
    val bcRaw = decideBroadcast(broadcastModel, rawN)
    val bcC = (1 until order).map(j => j -> decideBroadcast(broadcastModel, cont(j))).toMap
    checkLevers(label, order, minCount, df.isStreaming,
      bcRaw && (1 until order).forall(bcC))
    require(!stats.isEmpty,
      s"$label: the reference corpus yields no per-language model " +
        "(no language slice has a bigram)")
    val id = col(idCol)
    val (lp, extra) = lpOf(rawN, cont)
    def withJoins(pos: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      def side(m: org.apache.spark.sql.DataFrame, bc: Boolean) =
        if (bc) broadcast(m) else m
      def keys(j: Int) = "__l" +: gramCols(order, j)
      var j0 = pos.join(side(rawN, bcRaw), keys(order), "left")
        .join(side(ctxN, bcRaw), "__l" +: gramCols(order, order).dropRight(1), "left")
      for (j <- order - 1 to 2 by -1)
        j0 = j0.join(side(cont(j), bcC(j)), keys(j), "left")
          .join(side(ctxc(j), bcC(j)), "__l" +: gramCols(order, j).dropRight(1), "left")
      // the per-language stats frame (languages × 7) always broadcasts,
      // as does the optional per-language discount frame; an unmodeled
      // language misses every join and scores NULL
      val j1 = j0.join(side(cont(1), bcC(1)), keys(1), "left")
        .join(broadcast(stats), Seq("__l"), "left")
      extra.map(e => j1.join(broadcast(e), Seq("__l"), "left")).getOrElse(j1)
    }

    byLangApply(stream, idCol, textCol, langCol, order, "n_grams", withJoins, lp)
  }

  /** The shared batch/streaming APPLY stage of every by-language against
    * face (KN, modified KN, Jelinek-Mercer): explode positions with the
    * struct-wrapped language key, run the face's `withJoins`, fold the
    * per-position `lp` per document. Positions of an unmodeled language
    * carry a NULL `lp` — counted, never summed — so a document whose
    * language has no reference model keeps its position count and takes
    * a NULL score in both modes. */
  private[pipeline] def byLangApply(stream: graft.api.MStream, idCol: String,
                          textCol: String, langCol: String, order: Int,
                          nCol: String,
                          withJoins: org.apache.spark.sql.DataFrame =>
                            org.apache.spark.sql.DataFrame,
                          lp: Column): graft.api.MStream = {
    import org.apache.spark.sql.{Encoder, Row}
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    import org.apache.spark.sql.types._
    val df = stream.df
    val id = col(idCol)
    if (!df.isStreaming) {
      // materialize the doc-side key once (gramsOf re-evaluates keeps);
      // spread the SCORING stage at order >= 3 (guide §2.5/§2.6 — the
      // fused explode + keyed left-join tower serializes on a narrow
      // input; interleaved A/B: q_mkn3_bylang 4.45 → 3.24 s,
      // q_ppl_bylang 4.4 → 3.8 s; order 2 keeps the narrow path, the
      // q_lm_score pattern). Identity at scale / post-shuffle / streaming.
      val dfK0 = df.withColumn("__l", struct(col(langCol)))
      val dfK = if (order >= 3) spreadForCompute(dfK0) else dfK0
      val pos = gramsOf(dfK, textCol, order, gramCols(order, order),
        Seq(id, col("__l")))
      val scored = withJoins(pos)
        .withColumn("__lp", lp)
        .groupBy(id)
        .agg(count(lit(1)).as(nCol), round(avg(col("__lp")), 3).as("avg_logprob"))
      val out = df.select(id).join(scored, Seq(idCol), "left")
        .select(id, coalesce(col(nCol), lit(0L)).as(nCol), col("avg_logprob"))
      return stream.lift(out)
    }

    val ws = words(col(textCol))
    val pStructs = arrays_zip((1 to order).map(i =>
      slice(col("__w"), lit(i), size(col("__w")) - (order - 1)).as(s"g$i")): _*)
    val sentinel = array(struct((1 to order).map(i =>
      lit(null).cast("string").as(s"g$i")): _*))
    val u0 = df.withColumn("__w", ws)
      .select(id.as("__id"), struct(col(langCol)).as("__l"),
        explode(when(size(col("__w")) >= order, pStructs).otherwise(sentinel)).as("__g"))
      .select(col("__id") +: col("__l") +:
        (1 to order).map(i => col(s"__g.g$i").as(s"__p$i")): _*)
    val u = withJoins(u0)
      .select(col("__id"), col("__p1"),
        when(col("__p1").isNotNull, lp).as("__lp"))
    val idType = df.schema(idCol).dataType
    val aggT = StructType(Seq(
      StructField("__id", idType),
      StructField(nCol, LongType, nullable = false),
      StructField("__sum", DoubleType)))
    val aggEnc: Encoder[Row] = RowEncoder.encoderFor(aggT)
    val pIdx = u.schema.fieldIndex("__p1")
    val lpIdx = u.schema.fieldIndex("__lp")
    val out = graft.streaming.PerBatchCombine(u, Seq("__id"), aggEnc) {
        (key: Row, it: Iterator[Row]) =>
          // unlike the shared-model face, __lp can be NULL on real
          // positions (unmodeled language) — count positions and sum
          // only scored ones; a doc's positions are uniformly modeled
          // (one language per doc), so sum/n equals the batch avg
          var nn = 0L; var s = 0.0; var ns = 0L
          it.foreach { r =>
            if (!r.isNullAt(pIdx)) {
              nn += 1
              if (!r.isNullAt(lpIdx)) { ns += 1; s += r.getDouble(lpIdx) }
            }
          }
          Iterator.single(Row(key.get(0), nn, if (ns > 0) s else null))
      }
      .select(col("__id").as(idCol), col(nCol),
        round(col("__sum") / col(nCol), 3).as("avg_logprob"))
    stream.lift(out)
  }

  /** PER-LANGUAGE order-n Jelinek-Mercer LM scoring against a LABELED
    * reference corpus — the JM cell of the smoothing × per-language
    * matrix ([[knLmScoreAgainstByLang]] / [[mknLmScoreAgainstByLang]]
    * are the Kneser-Ney cells): every language's add-alpha count tables
    * train in ONE pass (the language threads as key "__l" through every
    * count/context/stats groupBy — per-language models are SLICES of the
    * same pinned artifacts, no per-language driver loop), and each
    * document scores under ITS OWN language's model by average
    * interpolated per-position log-likelihood with the
    * [[ngramLmScoreAgainst]] back-off floors. Documents whose language
    * has no reference model keep their position count and take a NULL
    * score; a null language is its own model (struct-wrapped keys, the
    * engine-wide null-group convention). Dual-mode: streaming is
    * stream-static broadcast joins + the stateless per-batch combine.
    *
    * Scale shape: identical tables to [[ngramLmScoreAgainst]] with one
    * more key column, so the count shuffles, the AUTO broadcast lever
    * (per pinned table, measured size) and the streamed-probe posture
    * all carry over; the per-language (N, V) stats frame (languages × 2)
    * always broadcasts. */
  def ngramLmScoreAgainstByLang(stream: graft.api.MStream,
                                refDocs: org.apache.spark.sql.DataFrame,
                                idCol: String, textCol: String, langCol: String,
                                refTextCol: String, refLangCol: String,
                                order: Int, alpha: Double = 0.5,
                                lambdas: Seq[Double] = Nil,
                                nCol: String = "n_grams",
                                minCount: Long = 1L,
                                broadcastModel: Option[Boolean] = None)
      : graft.api.MStream = {
    require(order >= 2 && order <= 8,
      s"ngramLmScoreAgainstByLang order must be in [2, 8], got $order")
    require(alpha > 0, s"alpha must be positive, got $alpha")
    require(!refDocs.isStreaming,
      "ngramLmScoreAgainstByLang: the reference corpus must be a batch " +
        "frame (the models pin once; a streaming reference has no stable artifact)")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val l = lambdasFor(order, lambdas)
    val df = stream.df
    // struct-wrapped language key: null-safe under plain equi-join keys
    val refKeyed = refDocs.withColumn("__lraw", struct(col(refLangCol)))
    val (counts, ctxs) = ngramModel(refKeyed, refTextCol, order, minCount,
      langCol = Some("__lraw"))
    val bc = (1 to order).map(j => j -> decideBroadcast(broadcastModel, counts(j))).toMap
    checkLevers("ngramLmScoreAgainstByLang", order, minCount, df.isStreaming,
      (1 to order).forall(bc))
    // per-language (N, V) — one row per modeled language, always broadcast
    val stats = counts(1).groupBy(col("__l"))
      .agg(sum(col("__c1")).cast("double").as("__n"),
        count(lit(1)).cast("double").as("__vv"))
    require(!stats.isEmpty,
      "ngramLmScoreAgainstByLang: the reference corpus yields no " +
        "per-language model (no language slice has a token)")
    def withJoins(pos: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      def side(m: org.apache.spark.sql.DataFrame, j: Int) =
        if (bc(j)) broadcast(m) else m
      (order to 2 by -1).foldLeft(pos) { (d, j) =>
        d.join(side(counts(j), j), "__l" +: gramCols(order, j), "left")
          .join(side(ctxs(j), j), "__l" +: gramCols(order, j).dropRight(1), "left")
      }.join(side(counts(1), 1), "__l" +: gramCols(order, 1), "left")
        // an unmodeled language misses the stats join — every term of the
        // interpolation goes NULL, the no-model verdict
        .join(broadcast(stats), Seq("__l"), "left")
    }
    byLangApply(stream, idCol, textCol, langCol, order, nCol, withJoins,
      ngramLp(order, alpha, l))
  }

  /** Modified-KN scoring AGAINST a pretrained reference corpus — the
    * KenLM-parity sibling of [[knLmScoreAgainst]] ([[mknLmScore]]'s
    * dual-mode ingest face): count-bucketed discounts derive per level
    * from the REFERENCE model's count-of-counts with `--discount_fallback`
    * semantics ([[mknDerive]]); documents back off through the same left
    * joins. Streaming is stream-static broadcast joins + the stateless
    * per-batch combine — zero state rows. */
  def mknLmScoreAgainst(stream: graft.api.MStream,
                        refDocs: org.apache.spark.sql.DataFrame,
                        idCol: String, textCol: String, refTextCol: String,
                        order: Int,
                        discounts: Map[Int, (Double, Double, Double)] = Map.empty,
                        fallback: (Double, Double, Double) = MknFallback,
                        minCount: Long = 1L,
                        broadcastModel: Option[Boolean] = None,
                        sentenceMode: Boolean = false): graft.api.MStream = {
    checkMknParams(order, discounts, fallback)
    knAgainstScore(stream, refDocs, idCol, textCol, refTextCol, order,
      minCount, broadcastModel, "mknLmScoreAgainst", (rawN, cont) => mknLp(order,
        if (discounts.nonEmpty) discounts
        else mknDiscountsFor(order, rawN, cont, fallback)),
      sentenceMode = sentenceMode)
  }

  /** The shared against-face engine of the KN family: train the model
    * tables on `refDocs`, fold the one-row stats to literals, score the
    * batch frame or arriving stream through left joins with full
    * back-off. `lpOf(rawN, cont)` supplies the per-position column after
    * the model pins (so discount derivation sees checkpointed tables). */
  private def knAgainstScore(stream: graft.api.MStream,
                             refDocs: org.apache.spark.sql.DataFrame,
                             idCol: String, textCol: String, refTextCol: String,
                             order: Int, minCount: Long,
                             broadcastModel: Option[Boolean],
                             label: String,
                             lpOf: (org.apache.spark.sql.DataFrame,
                                    Map[Int, org.apache.spark.sql.DataFrame]) => Column,
                             sentenceMode: Boolean = false)
      : graft.api.MStream = {
    import org.apache.spark.sql.{Encoder, Row}
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    import org.apache.spark.sql.types._
    require(order >= 2 && order <= 8,
      s"$label order must be in [2, 8], got $order")
    require(!refDocs.isStreaming,
      s"$label: the reference corpus must be a batch frame " +
        "(the model pins once; a streaming reference has no stable artifact)")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val df = stream.df
    val train =
      if (sentenceMode) Sentences.explodeRef(refDocs, refTextCol, order)
      else refDocs
    val (rawN, ctxN, cont, ctxc, stats) = knModel(train, refTextCol, order,
      minCount, dropBosTargets = sentenceMode)
    // one decision per pinned table (raw top order + each continuation
    // level); the derived context aggregates inherit their parent's
    val bcRaw = decideBroadcast(broadcastModel, rawN)
    val bcC = (1 until order).map(j => j -> decideBroadcast(broadcastModel, cont(j))).toMap
    checkLevers(label, order, minCount, df.isStreaming,
      bcRaw && (1 until order).forall(bcC))
    val lp = lpOf(rawN, cont)
    val st = stats.head()
    require(!st.isNullAt(0) && st.getAs[Double]("__t1") > 0,
      s"$label: the reference corpus yields an empty model " +
        "(needs at least one bigram)")
    def withJoins(pos: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      def side(m: org.apache.spark.sql.DataFrame, bc: Boolean) =
        if (bc) broadcast(m) else m
      var j0 = pos.join(side(rawN, bcRaw), gramCols(order, order), "left")
        .join(side(ctxN, bcRaw), gramCols(order, order).dropRight(1), "left")
      for (j <- order - 1 to 2 by -1)
        j0 = j0.join(side(cont(j), bcC(j)), gramCols(order, j), "left")
          .join(side(ctxc(j), bcC(j)), gramCols(order, j).dropRight(1), "left")
      // the one-row stats fold to literals — every column, so both lp
      // families (fixed __n1p1, bucketed __nb*1) resolve
      Seq("__t1", "__n1p1", "__nb11", "__nb21", "__nb31", "__v")
        .foldLeft(j0.join(side(cont(1), bcC(1)), gramCols(order, 1), "left")) {
          (d, c) => d.withColumn(c, lit(st.getAs[Any](c)))
        }
    }
    againstApply(stream, idCol, textCol, order, "n_grams", withJoins, lp,
      sentenceMode = sentenceMode)
  }

  /** The shared batch/streaming APPLY stage of the shared-model against
    * faces (the KN family and the imported-ARPA face): explode the
    * order-n positions, run the face's `withJoins`, fold the
    * per-position `lp` per document. Batch scores through one groupBy;
    * streaming rides the stateless per-batch combine (position-less
    * documents take a sentinel row so they still emit (n 0, NULL)). */
  private[pipeline] def againstApply(stream: graft.api.MStream, idCol: String,
                                     textCol: String, order: Int, nCol: String,
                                     withJoins: org.apache.spark.sql.DataFrame =>
                                       org.apache.spark.sql.DataFrame,
                                     lp: Column,
                                     /** [[Sentences]] windowing: positions
                                       * are each sentence's n+1 padded
                                       * full-order windows instead of the
                                       * document's sliding windows. */
                                     sentenceMode: Boolean = false): graft.api.MStream = {
    import org.apache.spark.sql.{Encoder, Row}
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    import org.apache.spark.sql.types._
    val df = stream.df
    val id = col(idCol)
    if (!df.isStreaming) {
      // spread the SCORING stage at order >= 3 (guide §2.5/§2.6): the
      // all-broadcast left-join tower fuses with the explode into one
      // whole-stage span over the scan — one task on a single-row-group
      // input. Interleaved A/B wins: q_mkn3_against 2.8 → 2.1,
      // q_ppl_apply 5.5 → 4.6, q_arpa_score 4.35 → 4.10 (q_kn3_against
      // pays ~0.15 s — the lean plain-KN fold — outweighed across the
      // face's callers). Order 2's fold is too lean to pay the exchange
      // (the q_lm_score/q_lm_against pattern) — identity there, as at
      // scale or on an input already carrying a shuffle boundary.
      val dfS = if (order >= 3) spreadForCompute(df) else df
      val pos =
        if (sentenceMode)
          gramsOf(Sentences.explodeDocs(dfS, id, textCol, order), "__stext",
            order, gramCols(order, order), Seq(id))
        else gramsOf(dfS, textCol, order, gramCols(order, order), Seq(id))
      val scored = withJoins(pos)
        .withColumn("__lp", lp)
        .groupBy(id)
        .agg(count(lit(1)).as(nCol), round(avg(col("__lp")), 3).as("avg_logprob"))
      val out = df.select(id).join(scored, Seq(idCol), "left")
        .select(id, coalesce(col(nCol), lit(0L)).as(nCol), col("avg_logprob"))
      return stream.lift(out)
    }

    val sentinel = array(struct((1 to order).map(i =>
      lit(null).cast("string").as(s"g$i")): _*))
    val u0 = if (sentenceMode) {
      val wins = Sentences.windows(col(textCol), order)
      df.withColumn("__w", wins)
        .select(id.as("__id"),
          explode(when(size(col("__w")) > 0, col("__w")).otherwise(sentinel)).as("__g"))
        .select(col("__id") +: (1 to order).map(i => col(s"__g.g$i").as(s"__p$i")): _*)
    } else {
      val ws = words(col(textCol))
      val pStructs = arrays_zip((1 to order).map(i =>
        slice(col("__w"), lit(i), size(col("__w")) - (order - 1)).as(s"g$i")): _*)
      df.withColumn("__w", ws)
        .select(id.as("__id"),
          explode(when(size(col("__w")) >= order, pStructs).otherwise(sentinel)).as("__g"))
        .select(col("__id") +: (1 to order).map(i => col(s"__g.g$i").as(s"__p$i")): _*)
    }
    val u = withJoins(u0)
      .select(col("__id"), col("__p1"),
        when(col("__p1").isNotNull, lp).as("__lp"))
    val idType = df.schema(idCol).dataType
    val aggT = StructType(Seq(
      StructField("__id", idType),
      StructField(nCol, LongType, nullable = false),
      StructField("__sum", DoubleType)))
    val aggEnc: Encoder[Row] = RowEncoder.encoderFor(aggT)
    val pIdx = u.schema.fieldIndex("__p1")
    val lpIdx = u.schema.fieldIndex("__lp")
    val out = graft.streaming.PerBatchCombine(u, Seq("__id"), aggEnc) {
        (key: Row, it: Iterator[Row]) =>
          var nn = 0L; var s = 0.0
          it.foreach { r =>
            if (!r.isNullAt(pIdx)) { nn += 1; s += r.getDouble(lpIdx) }
          }
          Iterator.single(Row(key.get(0), nn, if (nn > 0) s else null))
      }
      .select(col("__id").as(idCol), col(nCol),
        round(col("__sum") / col(nCol), 3).as("avg_logprob"))
    stream.lift(out)
  }

  /** Closed-form NTile(k) of 1-based rank `__r` in a population `__n`:
    * the first n % k tiles hold floor(n/k)+1 rows — exactly Spark's and
    * DuckDB's NTile ("div" throughout — ANSI-safe: the big-tile region
    * covers ALL rows when floor(n/k) = 0, so the small-tile branch and
    * its division never evaluate there; CaseWhen branches are lazy).
    * Package-private so PerplexityBucketsSpec pins THIS production
    * expression (not a copy) against the definitional tiling over random
    * large-n shapes; ExpressionProps separately pins the arithmetic
    * against the definition in plain Scala. */
  private[graft] def closedFormNtile(buckets: Int): Column = expr(
    s"""CASE WHEN __r <= (__n % $buckets) * ((__n div $buckets) + 1)
          THEN (__r - 1) div ((__n div $buckets) + 1) + 1
          ELSE (__n % $buckets)
               + ((__r - 1 - (__n % $buckets) * ((__n div $buckets) + 1))
                  div (__n div $buckets)) + 1
        END""").cast("int")

  /** CCNet head/middle/tail perplexity bucketing (Wenzek et al. 2020
    * §4.3: per-language perplexity terciles decide which slice of the
    * crawl is kept for LM training — "head" is the best-scoring third):
    * documents score under the [[bigramLmScore]] self-corpus LM, then
    * each LANGUAGE partition splits into `buckets` equal-depth ranks by
    * (avg_logprob DESC, id) — higher log-likelihood = lower perplexity =
    * bucket 1 = "head". The tiebreak on id makes the assignment a total
    * order, so bucket membership is deterministic on any engine and
    * partitioning. Documents with no score (< 2 tokens) take a NULL
    * bucket instead of polluting a tercile.
    *
    * Scale shape: scoring is the two-pass LM operator; bucketing is a
    * DISTRIBUTED exact rank — a dominant language is the NORM in a crawl
    * (English holds ~half of Common Crawl), so a
    * `ntile().over(partitionBy(lang))` window would sort half the corpus
    * in ONE task. Instead the buildVocab range+offset pattern: range
    * partition on the total order (lang, score desc, id) — unique key,
    * so the partitioner balances regardless of language skew — then
    * per-(range, language) counts (a width x languages frame, never
    * corpus-sized) yield each range's within-language offset via a tiny
    * window over that counts frame; global rank = offset + local
    * row_number inside the range. The tile is then the CLOSED-FORM
    * ntile of (rank, language population): first n%k tiles take
    * ceil(n/k) rows, the rest floor(n/k) — exactly Spark's and DuckDB's
    * NTile, so the output (and the oracle) is bit-identical to the
    * window form while every task stays bounded by the range width. */
  def perplexityBuckets(docs: org.apache.spark.sql.DataFrame, idCol: String,
                        textCol: String, langCol: String, buckets: Int = 3,
                        alpha: Double = 0.5): org.apache.spark.sql.DataFrame = {
    require(buckets >= 2, s"perplexityBuckets needs >= 2 buckets, got $buckets")
    import org.apache.spark.sql.expressions.Window
    val scored = bigramLmScore(docs, idCol, textCol, alpha)
      .join(docs.select(col(idCol), col(langCol)), Seq(idCol))
    bucketByScore(scored, idCol, langCol, buckets, "n_pairs")
  }

  /** GENERIC per-group equal-depth rank tiling — the public face of the
    * stage every bucketing operator shares (CCNet terciles are
    * `bucketByRank(scored, lang, avg_logprob, id, 3)`): within each
    * `groupCol` value, rows rank by (`scoreCol` DESC, `tieCol` ASC) — the
    * tiebreak makes the assignment a total order, so bucket membership
    * is deterministic on any engine and partitioning — and the rank
    * tiles into `buckets` equal-depth buckets by the closed-form NTile
    * (first n%k tiles take ceil(n/k) rows: exactly Spark's and DuckDB's
    * `ntile`). Adds `bucket` (int) to the input columns; NULL scores
    * never occupy tile slots and take a NULL bucket; a NULL group is its
    * own tile group. Composable with ANY scorer — q_mkn_buckets tiles
    * the modified-KN against-face scores, the literal KenLM-smoothed
    * Wenzek shape.
    *
    * Scale shape: a DISTRIBUTED exact rank (RangedPrefix — a dominant
    * group is the norm in crawl curation; an `ntile().over(partitionBy)`
    * window would sort half the corpus in one task). Requires
    * (`groupCol`, `scoreCol`, `tieCol`) unique per row (the idCol-unique
    * contract); `pinInput` checkpoints the input before the boundary
    * sampler — keep it on when the input is an expensive scoring
    * pipeline (the sampler is a full extra pass). Batch-only (corpus-
    * wide ranking); for the stateless streaming face freeze cuts with
    * [[perplexityBucketThresholds]]-style artifacts and apply
    * [[bucketByThresholds]]. */
  def bucketByRank(docs: org.apache.spark.sql.DataFrame, groupCol: String,
                   scoreCol: String, tieCol: String, buckets: Int,
                   pinInput: Boolean = true): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(buckets >= 2, s"bucketByRank needs >= 2 buckets, got $buckets")
    require(!docs.isStreaming,
      "bucketByRank is batch-only (corpus-wide ranking) — freeze cuts and " +
        "apply bucketByThresholds on a stream")
    require(!docs.columns.contains("bucket"),
      "bucketByRank input already carries a 'bucket' column")
    val score = col(scoreCol)
    val cols = docs.columns.toIndexedSeq.map(col)
    val (parted, offs) = RangedPrefix(docs,
      groupCols = Seq(groupCol),
      orderCols = Seq(score.desc, col(tieCol)),
      valueExpr = when(score.isNotNull, lit(1L)).otherwise(lit(0L)),
      pinInput = pinInput)
    val nn = parted.filter(score.isNotNull)
    val ranked = RangedPrefix.joinOffsets(nn, offs, Seq(groupCol))
      .withColumnRenamed("__grptot", "__n")
      .withColumn("__r", col("__off") + row_number().over(
        Window.partitionBy(col("__p"), col(groupCol))
          .orderBy(score.desc, col(tieCol))))
    ranked.select(cols :+ closedFormNtile(buckets).as("bucket"): _*)
      .unionByName(parted.filter(score.isNull)
        .select(cols :+ lit(null).cast("int").as("bucket"): _*))
  }

  /** The per-language tile stage of the perplexity-bucketing faces —
    * [[bucketByRank]] over the scored frame's four columns (kept as a
    * projection wrapper so the faces' output column order is stable). */
  private def bucketByScore(scored: org.apache.spark.sql.DataFrame, idCol: String,
                            langCol: String, buckets: Int,
                            nCol: String): org.apache.spark.sql.DataFrame =
    bucketByRank(
      scored.select(col(idCol), col(langCol), col(nCol), col("avg_logprob")),
      langCol, "avg_logprob", idCol, buckets)

  /** CCNet bucketing against a PRETRAINED model — the LITERAL Wenzek et
    * al. 2020 §4.3 shape: score every document under a Kneser-Ney LM
    * trained on the REFERENCE corpus (their 5-gram KenLM on Wikipedia;
    * here [[knLmScoreAgainst]] at `order`), then split each language
    * into `buckets` equal-depth tiles by (score desc, id) — bucket 1 =
    * "head", the slice kept for LM training. [[perplexityBuckets]] is
    * the self-trained variant. One shared model scores all languages
    * (CCNet trains per-language models; with per-language references,
    * call this per slice — documented deviation). Batch-only: the tile
    * assignment is a corpus-wide ranking (score a stream with
    * [[knLmScoreAgainst]] and bucket per micro-batch via foreachBatch).
    * Output (idCol, langCol, n_grams, avg_logprob, bucket); documents
    * under `order` tokens take a NULL bucket. */
  def perplexityBucketsAgainst(docs: org.apache.spark.sql.DataFrame,
                               refDocs: org.apache.spark.sql.DataFrame,
                               idCol: String, textCol: String, langCol: String,
                               refTextCol: String, buckets: Int = 3,
                               order: Int = 3, discount: Double = 0.75,
                               /** [[knLmScoreAgainst]]'s scale levers,
                                 * passed through — this is the large-
                                 * reference face that needs them most. */
                               minCount: Long = 1L,
                               broadcastModel: Option[Boolean] = None): org.apache.spark.sql.DataFrame = {
    require(buckets >= 2, s"perplexityBucketsAgainst needs >= 2 buckets, got $buckets")
    require(!docs.isStreaming,
      "perplexityBucketsAgainst is batch-only (the tile assignment is a " +
        "corpus-wide ranking) — score a stream with knLmScoreAgainst and " +
        "bucket per micro-batch via foreachBatch")
    val scored = knLmScoreAgainst(graft.api.MStream(docs), refDocs,
        idCol, textCol, refTextCol, order, discount, minCount, broadcastModel).df
      .join(docs.select(col(idCol), col(langCol)), Seq(idCol))
    bucketByScore(scored, idCol, langCol, buckets, "n_grams")
  }

  /** FROZEN per-language bucket thresholds from a reference crawl — the
    * artifact that makes CCNet bucketing STREAMABLE (production CCNet
    * does exactly this: derive per-language perplexity cut points from a
    * reference run once, then apply them statelessly to every later
    * crawl): `docs` scores and tiles under [[perplexityBucketsAgainst]]
    * (KN model trained on `refDocs`), and each tile boundary freezes as
    * cut_b = the MINIMUM avg_logprob assigned to bucket b, for
    * b = 1..buckets−1. Output (langCol, bucket, cut) — a languages ×
    * (buckets−1) artifact, shippable as a program-document input.
    * Applying the cuts back to the reference population reproduces its
    * tiling except where one score value straddles a tile boundary (ties
    * all land in the best bucket the value reached); a language with
    * fewer scored documents than buckets freezes only the cuts its
    * occupied tiles define. Batch-only (the derivation IS the
    * corpus-wide ranking); [[bucketByThresholds]] is the stateless
    * dual-mode apply. */
  def perplexityBucketThresholds(docs: org.apache.spark.sql.DataFrame,
                                 refDocs: org.apache.spark.sql.DataFrame,
                                 idCol: String, textCol: String, langCol: String,
                                 refTextCol: String, buckets: Int = 3,
                                 order: Int = 3, discount: Double = 0.75,
                                 minCount: Long = 1L,
                                 broadcastModel: Option[Boolean] = None)
      : org.apache.spark.sql.DataFrame =
    perplexityBucketsAgainst(docs, refDocs, idCol, textCol, langCol,
        refTextCol, buckets, order, discount, minCount, broadcastModel)
      .where(col("bucket").isNotNull && col("bucket") < buckets)
      .groupBy(col(langCol), col("bucket"))
      .agg(min(col("avg_logprob")).as("cut"))

  /** STATELESS bucket assignment from a frozen thresholds artifact
    * ([[perplexityBucketThresholds]]'s output, or any (langCol, bucket,
    * cut) frame): a row's bucket is 1 + the number of cuts its score
    * falls strictly below — bucket 1 ("head") for scores at or above
    * cut_1, the last bucket for everything under the final cut. NULL
    * scores, and languages absent from the artifact, take a NULL bucket
    * (CCNet has no model for an unseen language). A null LANGUAGE is its
    * own group on both sides (null-safe join), mirroring the tiling
    * faces. Dual-mode: batch or streaming from one call — the artifact
    * folds to a languages × (buckets−1) cuts table broadcast onto the
    * scored rows (pinned once on the streaming face so micro-batches
    * re-read the folded artifact, not its derivation), then one
    * projection; zero state rows. Adds `bucket` (int) to the input
    * columns. */
  def bucketByThresholds(stream: graft.api.MStream,
                         thresholds: org.apache.spark.sql.DataFrame,
                         langCol: String, scoreCol: String): graft.api.MStream = {
    require(!thresholds.isStreaming,
      "bucketByThresholds: the thresholds artifact must be a batch frame")
    Seq(langCol, "bucket", "cut").foreach(c =>
      require(thresholds.columns.contains(c),
        s"thresholds artifact needs column '$c' (have: " +
          s"${thresholds.columns.mkString(", ")})"))
    val df = stream.df
    require(!df.columns.contains("bucket"),
      "bucketByThresholds input already carries a 'bucket' column")
    val thrPlan = thresholds.groupBy(col(langCol).as("__thr_lang"))
      .agg(transform(array_sort(collect_list(struct(col("bucket"), col("cut")))),
        x => x.getField("cut")).as("__cuts"))
    val thr =
      if (!df.isStreaming) thrPlan
      else {
        val (cp, ids) = graft.api.Pinned.checkpointTracked(thrPlan)
        graft.api.Pinned.register(df.sparkSession, ids)
        cp
      }
    val score = col(scoreCol)
    val out = df.join(broadcast(thr), col(langCol) <=> col("__thr_lang"), "left")
      .withColumn("bucket",
        when(score.isNotNull && col("__cuts").isNotNull,
          (lit(1) + size(filter(col("__cuts"), c => score < c))).cast("int")))
      .drop("__thr_lang", "__cuts")
    stream.lift(out)
  }

  /** Multinomial Naive Bayes classification against a LABELED reference
    * corpus (the counts-based classic — McCallum & Nigam 1998; the
    * deterministic stand-in for the fastText classifiers CCNet-style
    * pipelines use for language/domain ID, and the right shape for an
    * oracle: every model parameter is a count, so an independent engine
    * reproduces each score): train-side one pass yields per-class doc
    * and token totals plus (class, word) counts; a document's class
    * score is `ln(n_c/N) + Σ_t ln((c(t,c)+α)/(T_c+α·V))`, the argmax
    * (on the ROUNDED score, ties to the lexicographically smallest
    * class — a total order both engines share) is the prediction.
    *
    * Scale shape: the (class, word) count table is the pinned model
    * artifact (model-sized, never corpus-sized); the class list with its
    * totals folds into the PLAN as a literal array (≤ 1024 classes), so
    * scoring explodes each token across classes with NO cross join and
    * one broadcast left join against the model — unseen (class, word)
    * pairs back off to the smoothed floor via the join miss. Dual-mode:
    * batch carries the oracle (q_nb_langid); streaming is the stateless
    * per-batch combine — zero state-store rows. Wordless documents emit
    * (NULL, NULL) in both modes. */
  /** Output schema of [[nbClassifyAgainst]] for a given id column — the
    * single source `Program.validate` resolves against (the build-time
    * eager model must not train during validation). */
  def nbOutputSchema(idCol: String,
      idType: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(StructField(idCol, idType),
      StructField("pred", StringType), StructField("score", DoubleType)))
  }

  def nbClassifyAgainst(stream: graft.api.MStream,
                        refDocs: org.apache.spark.sql.DataFrame,
                        idCol: String, textCol: String, refTextCol: String,
                        refLabelCol: String,
                        alpha: Double = 1.0): graft.api.MStream = {
    import org.apache.spark.sql.{Encoder, Row}
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    import org.apache.spark.sql.types._
    require(alpha > 0.0, s"add-alpha smoothing needs alpha > 0, got $alpha")
    // The class table is collected and its labels re-emitted as string
    // literals: a non-string label column would ClassCastException deep in
    // the build, and a NULL label would train a phantom null class that
    // can surface as `pred` — reject the former by name, drop the latter
    // (an unlabeled reference row carries no class evidence).
    val refLabelType = refDocs.schema(refLabelCol).dataType
    require(refLabelType == StringType,
      s"nbClassifyAgainst: reference label column '$refLabelCol' must be " +
        s"string, got ${refLabelType.simpleString} — cast it first")
    val df = stream.df
    val spark = df.sparkSession
    val labeled = refDocs.where(col(refLabelCol).isNotNull)

    // trained model: class totals (collected — class-count-sized) and the
    // pinned (class, word) count table
    val cls = labeled
      .select(col(refLabelCol).as("__c"), size(words(col(refTextCol))).as("__n"))
      .groupBy(col("__c"))
      .agg(count(lit(1)).as("__nc"), sum(greatest(col("__n"), lit(0))).as("__tc"))
    val clsRows = cls.collect()
    require(clsRows.nonEmpty,
      "nbClassifyAgainst: the reference corpus has no labeled rows")
    require(clsRows.length <= 1024,
      s"nbClassifyAgainst folds the class list into the plan; got " +
        s"${clsRows.length} classes (cap 1024)")
    val (wc, wcIds) = graft.api.Pinned.checkpointTracked(
      labeled.select(col(refLabelCol).as("__c"),
          explode(words(col(refTextCol))).as("__w"))
        .groupBy(col("__c"), col("__w")).agg(count(lit(1)).as("__cwc")))
    graft.api.Pinned.register(spark, wcIds)
    val nDocs = clsRows.map(_.getAs[Long]("__nc")).sum
    val vocab = wc.agg(count_distinct(col("__w"))).head().getLong(0)
    require(vocab > 0, "nbClassifyAgainst: the reference corpus yields no tokens")
    // the class table as ONE typed literal (cast renames the tuple fields;
    // both fold to a single array literal) — an array(struct(lit…)…) of
    // 1024 classes would be ~3k expression NODES in the plan, the same
    // ceiling class as the IVF literal codebook
    val clsT = "array<struct<__c:string,__nc:bigint,__tc:bigint>>"
    val clsArr = typedLit(clsRows.map(r => (r.getAs[String]("__c"),
      r.getAs[Long]("__nc"), r.getAs[Long]("__tc")))).cast(clsT)
    val id = col(idCol)

    def scoreCol(n: Column, sumLog: Column, nc: Column, tc: Column): Column =
      round(log(nc.cast("double") / nDocs) + sumLog
        - n * log(tc + lit(vocab) * alpha), 3)

    if (!df.isStreaming) {
      import org.apache.spark.sql.expressions.Window
      val toks = df.select(id.as("__id"), explode(words(col(textCol))).as("__w"))
      val perCls = toks
        .select(col("__id"), col("__w"), explode(clsArr).as("__k"))
        .select(col("__id"), col("__w"), col("__k.__c").as("__c"),
          col("__k.__nc").as("__nc"), col("__k.__tc").as("__tc"))
        .join(broadcast(wc), Seq("__c", "__w"), "left")
        .groupBy(col("__id"), col("__c"), col("__nc"), col("__tc"))
        .agg(count(lit(1)).as("__n"),
          sum(log(coalesce(col("__cwc"), lit(0L)) + alpha)).as("__s"))
        .withColumn("__score",
          scoreCol(col("__n"), col("__s"), col("__nc"), col("__tc")))
      val w = Window.partitionBy(col("__id"))
        .orderBy(col("__score").desc, col("__c"))
      val pred = perCls.withColumn("__rn", row_number().over(w))
        .where(col("__rn") === 1)
        .select(col("__id").as(idCol), col("__c").as("pred"),
          col("__score").as("score"))
      return stream.lift(df.select(id).join(pred, Seq(idCol), "left"))
    }

    // streaming: wordless docs ride a null-word sentinel whose class
    // column stays null (no class explode, no model match)
    val ws = words(col(textCol))
    val u = df
      .select(id.as("__id"),
        explode(when(size(ws) >= 1, ws)
          .otherwise(array(lit(null).cast("string")))).as("__w"))
      .select(col("__id"), col("__w"),
        explode_outer(when(col("__w").isNotNull, clsArr)
          .otherwise(lit(null).cast(clsT))).as("__k"))
      .select(col("__id"), col("__w"), col("__k.__c").as("__c"),
        col("__k.__nc").as("__nc"), col("__k.__tc").as("__tc"))
      .join(broadcast(wc), Seq("__c", "__w"), "left")
    val idType = df.schema(idCol).dataType
    val aggT = StructType(Seq(StructField("__id", idType),
      StructField("pred", StringType), StructField("score", DoubleType)))
    val aggEnc: Encoder[Row] = RowEncoder.encoderFor(aggT)
    val cIdx = u.schema.fieldIndex("__c")
    val ncIdx = u.schema.fieldIndex("__nc")
    val tcIdx = u.schema.fieldIndex("__tc")
    val cwcIdx = u.schema.fieldIndex("__cwc")
    val nD = nDocs
    val v = vocab
    val a = alpha
    val out = graft.streaming.PerBatchCombine(u, Seq("__id"), aggEnc) {
        (key: Row, it: Iterator[Row]) =>
          val acc = scala.collection.mutable.Map.empty[String, (Long, Double, Long, Long)]
          it.foreach { r =>
            if (!r.isNullAt(cIdx)) {
              val c = r.getString(cIdx)
              val cwc = if (r.isNullAt(cwcIdx)) 0L else r.getLong(cwcIdx)
              val (n, s, _, _) = acc.getOrElse(c, (0L, 0.0, 0L, 0L))
              acc(c) = (n + 1, s + math.log(cwc + a), r.getLong(ncIdx), r.getLong(tcIdx))
            }
          }
          if (acc.isEmpty) Iterator.single(Row(key.get(0), null, null))
          else {
            val scored = acc.toSeq.map { case (c, (n, s, nc, tc)) =>
              val raw = math.log(nc.toDouble / nD) + s - n * math.log(tc + v * a)
              (c, BigDecimal(raw).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble)
            }
            val best = scored.minBy { case (c, sc) => (-sc, c) }
            Iterator.single(Row(key.get(0), best._1, best._2))
          }
      }
      .withColumnRenamed("__id", idCol)
    stream.lift(out)
  }

  /** RE2-safe PII patterns (portable between Java regex and DuckDB's RE2 —
    * no lookaround, no possessive quantifiers). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^ \\t\\n]+"
  val IpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** PII/URL scrubbing: redact emails, URLs, and dotted-quad IPs with
    * placeholder tokens, plus per-category match counts. Pure codegen'd
    * regexp columns — order (emails, then URLs, then IPs) is fixed so the
    * output is deterministic across engines. */
  def scrubPii(text: Column): Seq[(String, Column)] = Seq(
    "n_emails" -> regexp_count(text, lit(EmailRe)),
    "n_urls" -> regexp_count(text, lit(UrlRe)),
    "n_ips" -> regexp_count(text, lit(IpRe)),
    "scrubbed" -> regexp_replace(
      regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), UrlRe, "<URL>"),
      IpRe, "<IP>"))

  /** Quality features: word count, mean word length, stopword ratio,
    * punctuation ratio. Mean word length sums the words themselves
    * (whitespace-robust) rather than assuming single-space separators.
    * Zero-word documents get NULL ratios (guarded — ANSI division by the
    * zero count would throw; the oracle mirrors via `nullif`). */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val nw = tokenCountWhitespace(text)
    val wordChars = aggregate(words(text), lit(0), (a, w) => a + length(w))
    Seq(
      "n_words" -> nw,
      "avg_word_len" -> when(nw > 0, round(wordChars.cast("double") / nw, 4)),
      "stopword_ratio" -> when(nw > 0,
        round(markerHits(text, Stopwords).cast("double") / nw, 4)),
      "punct_count" -> regexp_count(text, lit("[^A-Za-z0-9_\\s]")))
  }

  /** Gopher quality-rule gate (Rae et al., "Scaling Language Models:
    * ... Gopher", 2021 §A1.1): the published heuristic filter set as
    * per-document boolean flags plus the conjunction `keep` —
    * word count in [minWords, maxWords]; mean word length in [3, 10];
    * hash-symbol and ellipsis symbol-to-word ratios each ≤ 0.1; ≤ 90% of
    * lines bullet-started; ≤ 30% of lines ellipsis-ended; ≥ 80% of words
    * containing an alphabetic character; ≥ 2 of the paper's 8 stopwords
    * present. Every ratio test is INTEGER cross-multiplication
    * (`10·hashes ≤ nw`, never a float division), so the flags are exact
    * and engine-portable with no rounding contract. Word-dependent flags
    * are false for wordless (or null-text) documents.
    *
    * Pure zero-shuffle projection — one tokenization pass per document
    * behind the usual Generate barrier (the struct of counts is
    * materialized once; without the barrier CollapseProject would inline
    * the tokenizer into every flag) — so it is dual-mode by construction:
    * the same code path plans over a batch frame or a streaming one with
    * zero state. */
  def gopherRules(docs: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
                  minWords: Int = 50, maxWords: Int = 100000): org.apache.spark.sql.DataFrame = {
    require(minWords >= 1 && maxWords >= minWords,
      s"need 1 <= minWords <= maxWords, got [$minWords, $maxWords]")
    val docsP = spreadForCompute(docs) // heavy HOF battery per row
    val t = col(textCol)
    val ws = words(t)
    val wsl = transform(ws, w => lower(w))
    val ls = split(t, "\n", -1)
    val bulletMarks = Seq("•", "‣", "▪", "-", "*")
    // the paper's stopword set (An et al. trace it to the C4/MassiveWeb
    // rule): {the, be, to, of, and, that, have, with}
    val gopherStops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val stats = struct(
      size(ws).as("nw"),
      aggregate(ws, lit(0L), (a, w) => a + length(w)).as("chars"),
      (length(t) - length(replace(t, lit("#"), lit("")))).as("hashes"),
      (((length(t) - length(replace(t, lit("..."), lit("")))) / lit(3)).cast("long")
        + (length(t) - length(replace(t, lit("…"), lit(""))))).as("ellipses"),
      size(ls).as("nl"),
      size(filter(ls, l => substring(ltrim(l), 1, 1).isInCollection(bulletMarks)))
        .as("bullet_lines"),
      size(filter(ls, l => endswith(rtrim(l), lit("...")) || endswith(rtrim(l), lit("…"))))
        .as("ell_lines"),
      size(filter(ws, w => w.rlike("[A-Za-z]"))).as("alpha_words"),
      gopherStops.map(sw => array_contains(wsl, sw).cast("int")).reduce(_ + _).as("stops"))
    val s = col("__g")
    def ok(c: Column) = coalesce(c, lit(false))
    docsP.select(col(idCol), explode(array(stats)).as("__g"))
      .select(col(idCol),
        coalesce(s("nw").cast("long"), lit(0L)).as("n_words"),
        ok(s("nw") >= minWords && s("nw") <= maxWords).as("ok_words"),
        ok(s("nw") > 0 && s("chars") >= lit(3L) * s("nw") && s("chars") <= lit(10L) * s("nw"))
          .as("ok_word_len"),
        ok(s("nw") > 0 && lit(10) * s("hashes") <= s("nw")
          && lit(10) * s("ellipses") <= s("nw")).as("ok_symbols"),
        ok(lit(10) * s("bullet_lines") <= lit(9) * s("nl")).as("ok_bullets"),
        ok(lit(10) * s("ell_lines") <= lit(3) * s("nl")).as("ok_ellipses"),
        ok(s("nw") > 0 && lit(5) * s("alpha_words") >= lit(4) * s("nw")).as("ok_alpha"),
        ok(s("stops") >= 2).as("ok_stopwords"))
      .withColumn("keep", col("ok_words") && col("ok_word_len") && col("ok_symbols") &&
        col("ok_bullets") && col("ok_ellipses") && col("ok_alpha") && col("ok_stopwords"))
  }

  /** [[gopherRules]] over an MStream — the ingest-face wrapper the
    * program grammar's `gopherGate` node lowers to (identical plan; the
    * projection is already dual-mode). */
  def gopherGate(stream: graft.api.MStream, idCol: String, textCol: String,
                 minWords: Int = 50, maxWords: Int = 100000): graft.api.MStream =
    stream.lift(gopherRules(stream.df, idCol, textCol, minWords, maxWords))

  /** Dual-mode bigram-LM scoring AGAINST a reference corpus — the full
    * CCNet shape (Wenzek et al. 2020 score crawl text with an LM trained
    * on Wikipedia; [[bigramLmScore]] is the self-scoring variant): the
    * add-alpha bigram model trains on `refDocs` in one pass (tables
    * localCheckpoint'ed and registered with `Pinned`; the vocabulary size
    * is a scalar collected once and folded as a literal), then documents
    * — batch frame or arriving stream — score by average per-pair
    * log-likelihood ln((c(u,v)+a)/(c(u)+a·V)). Pairs UNSEEN in the
    * reference back off to the smoothed floor via left joins (c=0), the
    * piece self-scoring never needs. Documents under 2 tokens emit
    * (n_pairs=0, avg_logprob NULL) in both modes. Streaming is two
    * stream-static broadcast joins + the stateless per-batch combine —
    * zero state-store rows; the model frames are model-sized, never
    * corpus-sized. */
  /** Output schema of [[lmScoreAgainst]] (names + types) for a given id
    * column — the single source `Program.validate` resolves against, so
    * the two cannot drift (IngestProgramSpec pins this equal to the real
    * operator's schema). */
  def lmScoreOutputSchema(idCol: String,
      idType: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(StructField(idCol, idType),
      StructField("n_pairs", LongType, nullable = false),
      StructField("avg_logprob", DoubleType)))
  }

  /** Output schema of [[trigramLmScore]] — the build-time fact
    * `Program.validate` resolves the Lm3Score node against. */
  def lm3ScoreOutputSchema(idCol: String,
      idType: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(StructField(idCol, idType),
      StructField("n_tris", LongType, nullable = false),
      StructField("avg_logprob", DoubleType)))
  }

  /** Output schema of [[ngramLmScore]] / [[ngramLmScoreAgainst]] (generic
    * n_grams face) — the build-time fact `Program.validate` resolves the
    * LmNScore/LmNAgainst nodes against. */
  def ngramOutputSchema(idCol: String,
      idType: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(StructField(idCol, idType),
      StructField("n_grams", LongType, nullable = false),
      StructField("avg_logprob", DoubleType)))
  }

  /** Output schema of [[bm25Retrieve]] — the fact `Program.validate`
    * resolves the Bm25Retrieve node against. */
  def bm25RetrieveOutputSchema(qIdCol: String,
      qIdType: org.apache.spark.sql.types.DataType, idCol: String,
      idType: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(StructField(qIdCol, qIdType), StructField(idCol, idType),
      StructField("bm25", DoubleType), StructField("rank", LongType, nullable = false)))
  }

  /** Output schema of [[hybridRrfRetrieve]] — the fact `Program.validate`
    * resolves the HybridRrf node against. The doc id is LongType by the
    * bounded-heap contract (the heap carries (long id, score) pairs). */
  def hybridRrfOutputSchema(qIdCol: String,
      qIdType: org.apache.spark.sql.types.DataType,
      idCol: String): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(StructField(qIdCol, qIdType),
      StructField(idCol, LongType), StructField("rrf", DoubleType),
      StructField("rank", LongType, nullable = false)))
  }

  /** Output schema of [[winnowOverlapPairs]] — the fact `Program.validate`
    * resolves the WinnowPairs node against. */
  def winnowPairsOutputSchema(
      idType: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(StructField("id_a", idType), StructField("id_b", idType),
      StructField("n_shared", LongType, nullable = false)))
  }

  def lmScoreAgainst(stream: graft.api.MStream, refDocs: org.apache.spark.sql.DataFrame,
                     idCol: String, textCol: String, refTextCol: String,
                     alpha: Double = 0.5): graft.api.MStream = {
    import org.apache.spark.sql.{Encoder, Encoders, Row}
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.types._
    require(alpha > 0.0, s"add-alpha smoothing needs alpha > 0, got $alpha")
    val df = stream.df
    val spark = df.sparkSession
    def pairsOf(d: org.apache.spark.sql.DataFrame, text: String,
                keep: Seq[Column]): org.apache.spark.sql.DataFrame = d
      .select(keep :+ words(col(text)).as("__w"): _*).where(size(col("__w")) >= 2)
      .select(keep :+ explode(arrays_zip(
        slice(col("__w"), lit(1), size(col("__w")) - 1).as("u"),
        slice(col("__w"), lit(2), size(col("__w")) - 1).as("v"))).as("__p"): _*)
      .select(keep :+ col("__p.u").as("__u") :+ col("__p.v").as("__v"): _*)
    // reference model: one corpus pass; bc is THE trained artifact
    val (bc, bcIds) = graft.api.Pinned.checkpointTracked(
      pairsOf(refDocs, refTextCol, Nil)
        .groupBy(col("__u"), col("__v")).agg(count(lit(1)).as("__c")))
    val (cc, ccIds) = graft.api.Pinned.checkpointTracked(
      bc.groupBy(col("__u")).agg(sum(col("__c")).as("__cu")))
    graft.api.Pinned.register(spark, bcIds ++ ccIds)
    val nv = bc.agg(count_distinct(col("__v"))).head().getLong(0)
    require(nv > 0, "lmScoreAgainst: the reference corpus yields an empty bigram model")
    val lp = log((coalesce(col("__c"), lit(0L)) + alpha) /
      (coalesce(col("__cu"), lit(0L)) + lit(nv) * alpha))
    val id = col(idCol)

    if (!df.isStreaming) {
      val scored = pairsOf(df, textCol, Seq(id))
        .join(broadcast(bc), Seq("__u", "__v"), "left")
        .join(broadcast(cc), Seq("__u"), "left")
        .withColumn("__lp", lp)
        .groupBy(id)
        .agg(count(lit(1)).as("n_pairs"), round(avg(col("__lp")), 3).as("avg_logprob"))
      val out = df.select(id).join(scored, Seq(idCol), "left")
        .select(id, coalesce(col("n_pairs"), lit(0L)).as("n_pairs"), col("avg_logprob"))
      return stream.lift(out)
    }

    // streaming: pair-less docs ride a sentinel row (null u/v never joins)
    // so they still emit; per-doc fold is the stateless per-batch combine
    val pairStructs = arrays_zip(
      slice(col("__w"), lit(1), size(col("__w")) - 1).as("u"),
      slice(col("__w"), lit(2), size(col("__w")) - 1).as("v"))
    val sentinel = array(struct(lit(null).cast("string").as("u"),
      lit(null).cast("string").as("v")))
    val u = df
      .withColumn("__w", words(col(textCol)))
      .select(id.as("__id"),
        explode(when(size(col("__w")) >= 2, pairStructs).otherwise(sentinel)).as("__p"))
      .select(col("__id"), col("__p.u").as("__u"), col("__p.v").as("__v"))
      .join(broadcast(bc), Seq("__u", "__v"), "left")
      .join(broadcast(cc), Seq("__u"), "left")
      .select(col("__id"), col("__u"), when(col("__u").isNotNull, lp).as("__lp"))
    val idType = df.schema(idCol).dataType
    val aggT = StructType(Seq(
      StructField("__id", idType),
      StructField("n_pairs", LongType, nullable = false),
      StructField("__sum", DoubleType)))
    val aggEnc: Encoder[Row] = RowEncoder.encoderFor(aggT)
    val uIdx = u.schema.fieldIndex("__u")
    val lpIdx = u.schema.fieldIndex("__lp")
    val out = graft.streaming.PerBatchCombine(u, Seq("__id"), aggEnc) {
        (key: Row, it: Iterator[Row]) =>
          var n = 0L; var s = 0.0
          it.foreach { r =>
            if (!r.isNullAt(uIdx)) { n += 1; s += r.getDouble(lpIdx) }
          }
          Iterator.single(Row(key.get(0), n, if (n > 0) s else null))
      }
      // the division + round happen in SQL so both faces share Spark's
      // exact avg/round semantics
      .select(col("__id").as(idCol), col("n_pairs"),
        round(col("__sum") / col("n_pairs"), 3).as("avg_logprob"))
    stream.lift(out)
  }

  /** Dual-mode [[encodeTokens]] — apply a FIXED vocabulary at ingest.
    * Batch delegates to `encodeTokens` (the q_encode oracle face);
    * streaming explodes each arriving doc's tokens, stream-static
    * broadcast-joins the pinned vocabulary (driver-sized by `buildVocab`
    * contract, localCheckpoint'ed once so micro-batches never re-plan the
    * vocab build), and re-assembles per-doc id arrays in the stateless
    * per-batch combine (every token row derives from its own input row —
    * one micro-batch; unique-id precondition per batch, as
    * `scrubKnownSpans`). Token-less documents produce no output in EITHER
    * mode (the batch groupBy sees no rows for them). Zero state-store
    * rows: encode throughput is join-bound at ingest. */
  def encodeTokensIngest(stream: graft.api.MStream, vocab: org.apache.spark.sql.DataFrame,
                         idCol: String, textCol: String,
                         oovId: Long = -1L): graft.api.MStream = {
    import org.apache.spark.sql.{Encoder, Encoders, Row}
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.types._
    val df = stream.df
    if (!df.isStreaming)
      return stream.lift(encodeTokens(df, idCol, textCol, vocab, oovId))
    val (vcp, vIds) = graft.api.Pinned.checkpointTracked(
      vocab.select(col("word").as("__w"), col("id")))
    graft.api.Pinned.register(df.sparkSession, vIds)
    val u = df
      .select(col(idCol).as("__id"), posexplode(words(col(textCol))).as(Seq("__pos", "__w")))
      .join(broadcast(vcp), Seq("__w"), "left")
      .select(col("__id"), col("__pos"), col("id").as("__vid"))
    val idType = df.schema(idCol).dataType
    val outT = StructType(Seq(
      StructField("__id", idType),
      StructField("ids", ArrayType(LongType, containsNull = false)),
      StructField("n_oov", LongType, nullable = false)))
    val outEnc: Encoder[Row] = RowEncoder.encoderFor(outT)
    val posIdx = u.schema.fieldIndex("__pos")
    val vidIdx = u.schema.fieldIndex("__vid")
    val oov = oovId
    val out = graft.streaming.PerBatchCombine(u, Seq("__id"), outEnc) {
        (key: Row, it: Iterator[Row]) =>
          val rows = it.toList.sortBy(_.getInt(posIdx))
          val ids = rows.map(r => if (r.isNullAt(vidIdx)) oov else r.getLong(vidIdx))
          Iterator.single(Row(key.get(0), ids, rows.count(_.isNullAt(vidIdx)).toLong))
      }
      .withColumnRenamed("__id", idCol)
    stream.lift(out)
  }

  /** Dual-mode [[decontaminate]] — benchmark-overlap hygiene at ingest.
    * Batch delegates to `decontaminate` (the q_decontaminate oracle
    * face); streaming explodes each arriving doc's distinct n-gram hashes
    * (`posexplode_outer`, so sub-n-word docs still flow through and score
    * 0), stream-static broadcast-joins the pinned benchmark gram set
    * (small by nature; localCheckpoint'ed once), and counts hits in the
    * stateless per-batch combine. Zero state-store rows. */
  def decontaminateIngest(stream: graft.api.MStream, bench: org.apache.spark.sql.DataFrame,
                          idCol: String, textCol: String, benchTextCol: String,
                          n: Int = 8, minOverlap: Int = 1): graft.api.MStream = {
    import org.apache.spark.sql.{Encoder, Encoders, Row}
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import org.apache.spark.sql.types._
    val df = stream.df
    if (!df.isStreaming)
      return stream.lift(
        decontaminate(df, idCol, textCol, bench, benchTextCol, n, minOverlap))
    val (bcp, bIds) = graft.api.Pinned.checkpointTracked(
      bench.select(explode(array_distinct(
          graft.functions.VectorFunctions.wordShingleHashes(col(benchTextCol), n))).as("__g"))
        .distinct().withColumn("__hit", lit(1)))
    graft.api.Pinned.register(df.sparkSession, bIds)
    val grams = graft.functions.VectorFunctions.wordShingleHashes(col(textCol), n)
    val u = df
      .select(col(idCol).as("__id"),
        posexplode_outer(array_distinct(grams)).as(Seq("__p", "__g")))
      .join(broadcast(bcp), Seq("__g"), "left")
      .select(col("__id"), col("__hit"))
    val idType = df.schema(idCol).dataType
    val outT = StructType(Seq(
      StructField("__id", idType),
      StructField("n_overlap", LongType, nullable = false),
      StructField("contaminated", IntegerType, nullable = false)))
    val outEnc: Encoder[Row] = RowEncoder.encoderFor(outT)
    val hitIdx = u.schema.fieldIndex("__hit")
    val mo = minOverlap
    val out = graft.streaming.PerBatchCombine(u, Seq("__id"), outEnc) {
        (key: Row, it: Iterator[Row]) =>
          val hits = it.count(r => !r.isNullAt(hitIdx)).toLong
          Iterator.single(Row(key.get(0), hits, if (hits >= mo) 1 else 0))
      }
      .withColumnRenamed("__id", idCol)
    stream.lift(out)
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): documents are scored by
    * how target-like they look under hashed word-bigram bucket models —
    * `weight(doc) = Σ over bigram occurrences of
    * log p_target(bucket) − log p_raw(bucket)` with add-`alpha` smoothing
    * over `buckets` hash buckets. `selected` = rounded weight > 0 (the doc
    * is more target-like than raw-like); resample by ranking on `weight`.
    *
    * Dual-mode like [[lmScoreAgainst]] (the trained artifact here is the
    * pair of bucket-count tables): both reference corpora are counted in
    * ONE pass each, checkpointed as pinned model artifacts (≤ `buckets`
    * rows — broadcast by construction), and arrivals are scored by two
    * broadcast left joins + a per-doc fold. Batch groups by doc id;
    * streaming uses the stateless per-batch combine (every bigram row
    * derives from its own input row — one micro-batch), zero state-store
    * rows. Documents with < 2 words emit (0, NULL, false) in both modes.
    * Bucket totals are scalar model constants (`.head()` on the count
    * tables — model-sized by construction, like [[lmScoreAgainst]]'s V).
    *
    * Scale posture: the bucket space is fixed (`buckets`), so the model
    * is O(buckets) regardless of corpus size; scoring is a zero-shuffle
    * projection + broadcast joins per arrival batch. The reference's
    * capability ceiling doesn't apply — no per-key state anywhere. */
  def dsirOutputSchema(idCol: String,
      idType: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(StructField(idCol, idType),
      StructField("n_feats", LongType, nullable = false),
      StructField("dsir_weight", DoubleType),
      StructField("selected", BooleanType, nullable = false)))
  }

  def dsirScore(stream: graft.api.MStream, targetDocs: org.apache.spark.sql.DataFrame,
                rawDocs: org.apache.spark.sql.DataFrame,
                idCol: String, textCol: String, refTextCol: String,
                buckets: Int = 4096, alpha: Double = 1.0): graft.api.MStream = {
    import org.apache.spark.sql.{Encoder, Row}
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    import org.apache.spark.sql.types._
    require(buckets > 0, s"dsirScore needs a positive bucket count, got $buckets")
    require(alpha > 0.0, s"add-alpha smoothing needs alpha > 0, got $alpha")
    val df = stream.df
    val spark = df.sparkSession
    def bucketRows(d: org.apache.spark.sql.DataFrame, text: String,
                   keep: Seq[Column]): org.apache.spark.sql.DataFrame = d
      .select(keep :+ explode(
        graft.functions.VectorFunctions.wordShingleHashes(col(text), 2)).as("__h"): _*)
      .select(keep :+ (col("__h") % buckets).as("__b"): _*)
    // the two reference sketches are independent actions — pin and total
    // them concurrently (the ngramModel pattern), register on the caller
    import scala.concurrent.Future
    import scala.concurrent.ExecutionContext.Implicits.global
    def sketch(d: org.apache.spark.sql.DataFrame, as: String) = Future {
      val (cp, ids) = graft.api.Pinned.checkpointTracked(
        bucketRows(d, refTextCol, Nil).groupBy(col("__b")).agg(count(lit(1)).as(as)))
      (cp, ids, cp.agg(coalesce(sum(col(as)), lit(0L))).head().getLong(0))
    }
    val Seq((tgt, _, totT), (raw, _, totR)) = awaitPinned(spark,
      Seq(sketch(targetDocs, "__t"), sketch(rawDocs, "__r")))(_._2)
    require(totT > 0, "dsirScore: the target corpus yields no word bigrams")
    require(totR > 0, "dsirScore: the raw corpus yields no word bigrams")
    // per-occurrence log-ratio; unseen buckets fall to the smoothed floor
    // uniformly (counts coalesce to 0 inside the formula, in-engine)
    val lam =
      log((coalesce(col("__t"), lit(0L)) + alpha) / (lit(totT) + alpha * buckets)) -
      log((coalesce(col("__r"), lit(0L)) + alpha) / (lit(totR) + alpha * buckets))
    val id = col(idCol)
    def finish(n: Column, s: Column): Seq[Column] = Seq(
      coalesce(n, lit(0L)).as("n_feats"),
      round(s, 3).as("dsir_weight"),
      coalesce(round(s, 3) > 0d, lit(false)).as("selected"))

    if (!df.isStreaming) {
      val scored = bucketRows(df, textCol, Seq(id))
        .join(broadcast(tgt), Seq("__b"), "left")
        .join(broadcast(raw), Seq("__b"), "left")
        .groupBy(id)
        .agg(count(lit(1)).as("__n"), sum(lam).as("__s"))
      val out = df.select(id).join(scored, Seq(idCol), "left")
        .select(id +: finish(col("__n"), col("__s")): _*)
      return stream.lift(out)
    }

    // streaming: bigram-less docs ride a sentinel (null bucket) row so
    // they still emit; the fold skips sentinels, sum/round stay in SQL so
    // both faces share Spark's exact semantics
    val grams = graft.functions.VectorFunctions.wordShingleHashes(col(textCol), 2)
    val u = df
      .select(id.as("__id"),
        explode(when(size(grams) >= 1, grams)
          .otherwise(array(lit(null).cast("long")))).as("__h"))
      .withColumn("__b", col("__h") % buckets)
      .join(broadcast(tgt), Seq("__b"), "left")
      .join(broadcast(raw), Seq("__b"), "left")
      .select(col("__id"), when(col("__h").isNotNull, lam).as("__lam"))
    val idType = df.schema(idCol).dataType
    val aggT = StructType(Seq(
      StructField("__id", idType),
      StructField("__n", LongType, nullable = false),
      StructField("__s", DoubleType)))
    val aggEnc: Encoder[Row] = RowEncoder.encoderFor(aggT)
    val lamIdx = u.schema.fieldIndex("__lam")
    val out = graft.streaming.PerBatchCombine(u, Seq("__id"), aggEnc) {
        (key: Row, it: Iterator[Row]) =>
          var n = 0L; var s = 0.0
          it.foreach { r => if (!r.isNullAt(lamIdx)) { n += 1; s += r.getDouble(lamIdx) } }
          Iterator.single(Row(key.get(0), n, if (n > 0) s else null))
      }
      .select(col("__id").as(idCol) +:
        finish(col("__n"), when(col("__n") > 0, col("__s"))): _*)
    stream.lift(out)
  }

  /** Symbol-bracket markers (U+0002 / U+0003) for the BPE working
    * representation: each symbol is stored bracketed (written `⟨symbol⟩`
    * below), so a merge rule (a, b)
    * applies as ONE literal string replace of `⟨a⟩⟨b⟩` with `⟨ab⟩` —
    * left-to-right non-overlapping, exactly BPE's greedy application
    * order, with the brackets anchoring whole symbols (no false matches
    * inside longer symbols). Codegen'd `replace`, no regex, no UDF; an
    * independent engine (the DuckDB oracle) reproduces it with its own
    * literal `replace`. */
  private[pipeline] val BpeS = "\u0002"
  private[pipeline] val BpeE = "\u0003"

  private def bpeWrap(word: Column): Column =
    array_join(transform(chars(word), c => concat(lit(BpeS), c, lit(BpeE))), "")

  private def bpeApply(s: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(s) { case (c, (a, b)) =>
      org.apache.spark.sql.functions.replace(c,
        lit(BpeS + a + BpeE + BpeS + b + BpeE), lit(BpeS + a + b + BpeE))
    }

  private def bpeSymbols(s: Column): Column =
    filter(split(s, s"[$BpeS$BpeE]"), x => x =!= "")

  /** Distributed BPE merge training (Sennrich, Haddow & Birch 2016,
    * "Neural Machine Translation of Rare Words with Subword Units"):
    * learn `numMerges` merge rules from the corpus. BPE's working set is
    * the word-frequency VOCABULARY, not the corpus — ONE corpus pass
    * builds (word, count), then every round (a) counts adjacent symbol
    * pairs weighted by word count (overlapping occurrences count, the
    * reference algorithm's statistic), (b) picks the most frequent pair
    * (ties to the lexicographically smaller), and (c) rewrites symbols
    * by applying the merge greedily left-to-right. The vocabulary is
    * pinned once; each round scans it with the PENDING merge chain
    * applied as chained literal replaces, and every
    * `graft.bpe.rematEvery` rounds (default 64) the vocabulary is
    * RE-MATERIALIZED with the chain applied and the chain reset — so
    * per-round expression depth and cost are O(rematEvery), constant in
    * the total merge count, which is what lets a real-tokenizer-sized
    * run (8k–32k merges) complete. Each re-materialization also prunes
    * words already collapsed to one symbol (exact: merges never split a
    * symbol, so a one-symbol word can never contribute a pair again),
    * shrinking the working set as training progresses. The corpus itself
    * is touched exactly once, and the only driver data is the merge
    * table (`numMerges` rows, the trained artifact). No end-of-word
    * marker (documented deviation from the paper; the oracle mirrors the
    * same choice).
    *
    * Precondition: text must not contain U+0002/U+0003 (the symbol
    * brackets) — control characters are not word characters in any real
    * corpus; strip them upstream (e.g. with the PII/quality scrubbers).
    *
    * Output: (merge_rank, lhs, rhs) — apply with [[bpeTokenize]]. */
  def trainBpeMerges(docs: org.apache.spark.sql.DataFrame, textCol: String,
                     numMerges: Int): org.apache.spark.sql.DataFrame = {
    require(numMerges >= 1 && numMerges <= 65536,
      s"numMerges=$numMerges: each merge is one driver-coordinated round " +
        "and the merge table is a driver artifact; keep <= 65536")
    val spark = docs.sparkSession
    // The ONE corpus-scale pass (the word count) runs in the CALLER's
    // session at its full shuffle width — narrowing applies to the tiny
    // per-round jobs over the distinct-word table, never to the corpus
    // scan — and is materialized (lineage-truncated) before the loop.
    val (vocab0, vocab0Ids) = graft.api.Pinned.checkpointTracked(docs
      .select(explode(words(col(textCol))).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__c"))
      .select(bpeWrap(col("__w")).as("__s"), col("__c")))
    bpeTrainCore(spark, vocab0, vocab0Ids, numMerges)
  }

  /** The merge-round loop shared by [[trainBpeMerges]] (whitespace
    * words, raw chars) and [[trainByteBpeMerges]] (GPT-2 pre-tokens,
    * byte-mapped alphabet): takes the pinned bracketed (symbol-string,
    * count) working set, returns the (merge_rank, lhs, rhs) table.
    * Raw-pair-count scoring, lexicographic ties, greedy left-to-right
    * rewrite, vocabulary re-materialization with collapsed-unit pruning
    * every `graft.bpe.rematEvery` rounds. */
  private def bpeTrainCore(spark: org.apache.spark.sql.SparkSession,
                           vocab0: org.apache.spark.sql.DataFrame,
                           vocab0Ids: Set[Int],
                           numMerges: Int): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    // one conf-parsing contract for the whole pipeline family
    // ([[Dedup.longConf]]), narrowed to Int with a named range error
    def intConf(key: String, default: Int): Int = {
      val v = Dedup.longConf(spark, key, default)
      require(v <= Int.MaxValue, s"$key must fit an Int, got $v")
      v.toInt
    }
    val rematEvery = intConf("graft.bpe.rematEvery", 64)
    // The training loop runs thousands of TINY driver-coordinated jobs
    // over the (word, count) vocabulary — a table of distinct WORDS, which
    // is small even when the corpus is not (a 100 TB crawl has millions of
    // distinct words, not billions of rows). Wide partitioning makes every
    // round pay 32+ task launches for kilobytes of work, and that task
    // overhead — not data — dominates the trainer. Keep the working set on
    // a few partitions (graft.bpe.vocabPartitions, default 8) and narrow
    // the per-round shuffle to match (in the cloned loop session below).
    val vocabParts = intConf("graft.bpe.vocabPartitions", 8)
    // The thousands of tiny driver-coordinated rounds run in a CLONED
    // session (shared SparkContext, PRIVATE SQLConf): the narrow shuffle
    // width and AQE-off (whose per-stage re-planning round trip dominates
    // fixed-shape micro-jobs) apply only to the loop — concurrent queries
    // on the caller's session keep their plans, and there is no global
    // conf mutation to restore or race on.
    val loop = spark.newSession()
    loop.conf.set("spark.sql.shuffle.partitions", vocabParts.toString)
    loop.conf.set("spark.sql.adaptive.enabled", "false")
    var vocab = loop.createDataFrame(vocab0.rdd, vocab0.schema)
      .coalesce(vocabParts)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var vocabCpIds = Set.empty[Int]
    def releaseIds(ids: Set[Int]): Unit = graft.api.Pinned.unpersist(spark, ids)
    try {
      val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      // merges learned since the last vocabulary re-materialization — the
      // only chain each round's scan replays
      val pending = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var r = 0
      var exhausted = false
      while (r < numMerges && !exhausted) {
        val syms = bpeSymbols(bpeApply(col("__s"), pending.toSeq))
        val best = vocab
          .select(syms.as("__y"), col("__c")).where(size(col("__y")) >= 2)
          .select(explode(arrays_zip(
            slice(col("__y"), lit(1), size(col("__y")) - 1).as("a"),
            slice(col("__y"), lit(2), size(col("__y")) - 1).as("b"))).as("__p"),
            col("__c"))
          .groupBy(col("__p.a").as("a"), col("__p.b").as("b"))
          .agg(sum(col("__c")).as("__n"))
          .orderBy(col("__n").desc, col("a"), col("b"))
          .limit(1).collect()
        if (best.isEmpty) exhausted = true // every word is one symbol
        else {
          val m = (best(0).getString(0), best(0).getString(1))
          merges += m
          pending += m
          r += 1
          if (pending.size >= rematEvery && r < numMerges && !exhausted) {
            // fold the pending chain into the data and TRUNCATE LINEAGE
            // (tracked localCheckpoint, eager): without truncation the
            // logical plan stacks one projection per generation and
            // analyzer cost grows linearly with the merge count — the
            // very thing the re-materialization exists to bound. Same
            // posture as Spark ML's iterative trainers. Checkpoint RDD
            // ids are tracked so each superseded generation is ACTUALLY
            // released (Dataset.unpersist is a CacheManager call — a
            // no-op for localCheckpoint's RDD-level persist).
            val (next, nIds) = graft.api.Pinned.checkpointTracked(vocab
              .select(bpeApply(col("__s"), pending.toSeq).as("__s"), col("__c"))
              .where(size(bpeSymbols(col("__s"))) >= 2))
            vocab.unpersist(blocking = false)
            releaseIds(vocabCpIds); vocabCpIds = nIds
            vocab = next
            pending.clear()
          }
        }
      }
      merges.toSeq.zipWithIndex
        .map { case ((a, b), i) => (i + 1, a, b) }.toDF("merge_rank", "lhs", "rhs")
    } finally {
      vocab.unpersist(blocking = false)
      releaseIds(vocabCpIds)
      releaseIds(vocab0Ids)
    }
  }

  /** Apply learned BPE merges to every document: per-doc subword token
    * count and a portable hash of the token sequence (word order
    * preserved, tokens space-joined). The merge table is a driver-sized
    * artifact ([[trainBpeMerges]]'s contract); application is a pure
    * zero-shuffle projection — chained codegen'd replaces — plus one
    * per-doc aggregation. */
  def bpeTokenize(docs: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String,
                  merges: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val ms = merges.select(col("merge_rank"), col("lhs"), col("rhs"))
      .collect().sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    val id = col(idCol)
    val toks = spreadForCompute(docs)
      .select(id, posexplode(words(col(textCol))).as(Seq("__pos", "__w")))
      .select(id, col("__pos"),
        bpeSymbols(bpeApply(bpeWrap(col("__w")), ms)).as("__y"))
    val agg = toks.groupBy(id).agg(
      sum(size(col("__y"))).as("__n"),
      polyHash(array_join(transform(
        sort_array(collect_list(struct(col("__pos"), col("__y")))),
        x => array_join(x.getField("__y"), " ")), " ")).as("__h"))
    docs.select(id).join(agg, Seq(idCol), "left")
      .select(id, coalesce(col("__n"), lit(0L)).as("n_bpe_tokens"),
        coalesce(col("__h"), lit(0L)).as("tok_hash"))
  }

  def bpeOutputSchema(idCol: String,
      idType: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(StructField(idCol, idType),
      StructField("n_bpe_tokens", LongType, nullable = false),
      StructField("tok_hash", LongType, nullable = false)))
  }

  /** Dual-mode [[bpeTokenize]] — apply a FROZEN merge table at ingest
    * (the production tokenizer case: train once, tokenize every arriving
    * document with the shipped artifact). Batch delegates to
    * `bpeTokenize` (the q_bpe_encode oracle face); streaming runs the
    * same chained-replace projection per arriving word and re-assembles
    * per-doc counts + the sequence hash in the stateless per-batch
    * combine — zero state-store rows, no join (the merge table is
    * driver-sized and rides the plan as literals). Word-less documents
    * emit (0, 0) in both modes. */
  def bpeTokenizeIngest(stream: graft.api.MStream,
                        merges: org.apache.spark.sql.DataFrame,
                        idCol: String, textCol: String): graft.api.MStream = {
    import org.apache.spark.sql.{Encoder, Row}
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    import org.apache.spark.sql.types._
    val df = stream.df
    if (!df.isStreaming)
      return stream.lift(bpeTokenize(df, idCol, textCol, merges))
    val ms = merges.select(col("merge_rank"), col("lhs"), col("rhs"))
      .collect().sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    val id = col(idCol)
    // word-less docs ride a sentinel (null word) row so they still emit
    val ws = words(col(textCol))
    val u = df
      .select(id.as("__id"), posexplode(
        when(size(ws) >= 1, ws).otherwise(array(lit(null).cast("string"))))
        .as(Seq("__pos", "__w")))
      .select(col("__id"), col("__pos"),
        when(col("__w").isNotNull,
          array_join(bpeSymbols(bpeApply(bpeWrap(col("__w")), ms)), " ")).as("__t"))
    val idType = df.schema(idCol).dataType
    val aggT = StructType(Seq(
      StructField("__id", idType),
      StructField("n_bpe_tokens", LongType, nullable = false),
      StructField("tok_hash", LongType, nullable = false)))
    val aggEnc: Encoder[Row] = RowEncoder.encoderFor(aggT)
    val posIdx = u.schema.fieldIndex("__pos")
    val tIdx = u.schema.fieldIndex("__t")
    val out = graft.streaming.PerBatchCombine(u, Seq("__id"), aggEnc) {
        (key: Row, it: Iterator[Row]) =>
          val rows = it.filter(r => !r.isNullAt(tIdx)).toArray.sortBy(_.getInt(posIdx))
          var n = 0L
          val joined = rows.map { r =>
            val t = r.getString(tIdx)
            n += t.count(_ == ' ') + 1
            t
          }.mkString(" ")
          val h = joined.foldLeft(0L)((a, c) => (a * 31 + c) % P)
          Iterator.single(Row(key.get(0), if (rows.isEmpty) 0L else n,
            if (rows.isEmpty) 0L else h))
      }
      .withColumnRenamed("__id", idCol)
    stream.lift(out)
  }

  /** UTF-8 byte order on strings — Spark's and DuckDB's binary string
    * collation, which Java's UTF-16 `String` order diverges from for
    * [U+E000, U+FFFF] vs supplementary-plane code points. Every
    * driver-side tie-break that an oracle mirrors must use THIS order. */
  private[graft] val Utf8Ordering: Ordering[String] = new Ordering[String] {
    def compare(a: String, b: String): Int = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      var i = 0
      val n = math.min(x.length, y.length)
      var c = 0
      while (i < n && c == 0) {
        c = (x(i) & 0xff) - (y(i) & 0xff)
        i += 1
      }
      if (c != 0) c else x.length - y.length
    }
  }

  /** BPE tokenization straight to vocabulary IDS — the BPE cell of the
    * tokenizer × output matrix ([[graft.pipeline.Unigram.encodeIds]] is
    * the unigram cell): the id space derives from the MERGE TABLE alone
    * (the shipped artifact — no corpus pass), in the HuggingFace-BPE
    * layout: the in-merge alphabet first (symbols appearing as a merge
    * side but produced by no merge, UTF-8 byte order), then each merge's
    * output in rank order (a string two merges both produce takes its
    * FIRST rank's id once). Pieces outside that vocabulary — characters
    * no merge ever touched — take `oovId`. Adds `as` (array<bigint>); a
    * zero-shuffle stateless projection (chained codegen'd replaces + the
    * [[graft.functions.StrataLookup]] hash table), dual-mode by
    * construction. */
  def bpeEncodeIds(stream: graft.api.MStream,
                   merges: org.apache.spark.sql.DataFrame,
                   textCol: String, oovId: Long = -1L,
                   as: String = "ids"): graft.api.MStream = {
    val df = stream.df
    require(!df.columns.contains(as),
      s"bpeEncodeIds input already carries a '$as' column")
    require(!merges.isStreaming,
      "bpeEncodeIds: the merge table is a batch artifact")
    val ms = merges.select(col("merge_rank"), col("lhs"), col("rhs"))
      .collect().sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    require(ms.nonEmpty && ms.length <= 65536,
      s"bpeEncodeIds: the merge table must be a 1..65536-rule artifact, got ${ms.length}")
    val outFirstRank = ms.zipWithIndex
      .groupBy { case ((a, b), _) => a + b }
      .map { case (p, xs) => p -> xs.map(_._2).min }
    val atoms = ms.flatMap { case (a, b) => Seq(a, b) }.distinct
      .filterNot(outFirstRank.contains).sorted(Utf8Ordering)
    val idOf: Map[String, Long] =
      (atoms.zipWithIndex.map { case (p, i) => p -> i.toLong } ++
        outFirstRank.toSeq.sortBy(_._2).zipWithIndex
          .map { case ((p, _), i) => p -> (atoms.length + i).toLong }).toMap
    val pieces = flatten(transform(words(col(textCol)),
      w => bpeSymbols(bpeApply(bpeWrap(w), ms))))
    val ids = transform(pieces,
      p => graft.functions.VectorFunctions.strataLookup(p, idOf, oovId))
    stream.lift(spreadForCompute(df).withColumn(as, ids))
  }

  // -------------------------- merges.txt interop (the GPT-2/HF-BPE artifact format)

  /** Export a trained merge table as a HuggingFace-BPE `merges.txt`:
    * the `#version: 0.2` header line, then `lhs rhs` (single space) per
    * line in MERGE RANK order — the file every GPT-2-family checkpoint
    * ships next to its vocab (the BPE analog of [[Arpa]]'s ARPA export
    * and [[Unigram.exportVocab]]'s SentencePiece `.vocab`). Symbols
    * containing whitespace cannot ride the space-separated format and
    * fail by name ([[trainBpeMerges]] never produces them — words are
    * whitespace-split). Paths resolve through Hadoop FS (object stores
    * on a cluster). */
  def bpeExportMerges(merges: org.apache.spark.sql.DataFrame, path: String): Unit = {
    val ms = merges.select(col("merge_rank"), col("lhs"), col("rhs"))
      .collect().sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    require(ms.nonEmpty && ms.length <= 65536,
      s"bpeExportMerges: the merge table must be a 1..65536-rule artifact, got ${ms.length}")
    ms.foreach { case (a, b) =>
      require(a.nonEmpty && b.nonEmpty && !(a + b).exists(_.isWhitespace),
        s"bpeExportMerges: rule '$a' + '$b' cannot ride the space-separated format") }
    val spark = merges.sparkSession
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val w = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      fs.create(p, true), java.nio.charset.StandardCharsets.UTF_8))
    try {
      w.write("#version: 0.2\n")
      ms.foreach { case (a, b) => w.write(a); w.write(" "); w.write(b); w.write("\n") }
    } finally w.close()
  }

  /** Parse a HuggingFace-BPE `merges.txt` (optional `#version` header,
    * `lhs rhs` per line in rank order — the file next to every
    * GPT-2-family checkpoint, including files this engine never
    * trained) into the (merge_rank, lhs, rhs) frame [[bpeTokenize]] /
    * [[bpeEncodeIds]] accept. Driver-side streaming parse capped at
    * 65536 rules (the merge-table-artifact contract). */
  def bpeImportMerges(spark: org.apache.spark.sql.SparkSession,
                      path: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"bpeImportMerges: no merges file at $path")
    val src = scala.io.Source.fromInputStream(fs.open(p))(scala.io.Codec.UTF8)
    val rules = try {
      src.getLines().map(_.stripSuffix("\r")).zipWithIndex
        .filterNot { case (line, i) =>
          (i == 0 && line.startsWith("#version")) || line.isEmpty }
        .map { case (line, i) =>
          val cut = line.indexOf(' ')
          require(cut > 0 && cut < line.length - 1 &&
            line.indexOf(' ', cut + 1) < 0,
            s"bpeImportMerges: malformed line ${i + 1} '$line' (want 'lhs rhs')")
          (line.substring(0, cut), line.substring(cut + 1))
        }.toVector
    } finally src.close()
    require(rules.nonEmpty && rules.length <= 65536,
      s"bpeImportMerges: a merge table is a 1..65536-rule artifact, got ${rules.length}")
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(
      StructField("merge_rank", IntegerType, nullable = false),
      StructField("lhs", StringType, nullable = false),
      StructField("rhs", StringType, nullable = false)))
    val data = rules.zipWithIndex.map { case ((a, b), i) => Row(i + 1, a, b) }
    spark.createDataFrame(new java.util.ArrayList[Row](data.asJava), schema)
  }

  // -------------------------- per-language BPE (one-pass multi-tokenizer training)

  /** Train EVERY language's BPE merge table in ONE pass — the tokenizer
    * analog of the per-language LM matrix (`byLangApply`): the corpus is
    * word-counted ONCE with the language as a key, and each training
    * round runs ONE job that argmaxes the pair statistic PER LANGUAGE
    * (a partial-aggregated (lang, a, b) count + a per-language top-1),
    * so 100 languages cost one round-trip per round, not 100 trainer
    * runs. Each language's merge sequence is IDENTICAL to training
    * [[trainBpeMerges]] on its slice alone (spec-pinned): languages
    * never interact — the key only shares the scan. A language whose
    * words have all collapsed to one symbol stops receiving merges
    * (exhaustion is permanent, so a language's merge in global round r
    * is its rank-r rule in both engines). Modeled-language set capped
    * at 1024 before collecting (the per-language-artifact contract,
    * [[Arpa.arpaExportKnByLang]]'s posture). NULL languages train like
    * any other key and are addressable in [[bpeTokenizeByLang]].
    *
    * Output: (lang, merge_rank, lhs, rhs). */
  def trainBpeMergesByLang(docs: org.apache.spark.sql.DataFrame,
                           langCol: String, textCol: String,
                           numMerges: Int): org.apache.spark.sql.DataFrame = {
    require(numMerges >= 1 && numMerges <= 65536,
      s"numMerges=$numMerges: each merge is one driver-coordinated round " +
        "and the merge tables are driver artifacts; keep <= 65536")
    val spark = docs.sparkSession
    import spark.implicits._
    def intConf(key: String, default: Int): Int = {
      val v = Dedup.longConf(spark, key, default)
      require(v <= Int.MaxValue, s"$key must fit an Int, got $v")
      v.toInt
    }
    val rematEvery = intConf("graft.bpe.rematEvery", 64)
    val vocabParts = intConf("graft.bpe.vocabPartitions", 8)
    val (vocab0, vocab0Ids) = graft.api.Pinned.checkpointTracked(docs
      .select(col(langCol).as("__l"), explode(words(col(textCol))).as("__w"))
      .groupBy("__l", "__w").agg(count(lit(1)).as("__c"))
      .select(col("__l"), bpeWrap(col("__w")).as("__s"), col("__c")))
    val nLangs = vocab0.select(col("__l")).distinct().limit(1025).count()
    require(nLangs <= 1024,
      s"trainBpeMergesByLang: modeled-language set exceeds the 1024-language " +
        "artifact cap — filter or bucket the language column first")
    val loop = spark.newSession()
    loop.conf.set("spark.sql.shuffle.partitions", vocabParts.toString)
    loop.conf.set("spark.sql.adaptive.enabled", "false")
    var vocab = loop.createDataFrame(vocab0.rdd, vocab0.schema)
      .coalesce(vocabParts)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var vocabCpIds = Set.empty[Int]
    def releaseIds(ids: Set[Int]): Unit = graft.api.Pinned.unpersist(spark, ids)
    // pending merge chains per language (null language rides the map
    // under its own key)
    val pending = scala.collection.mutable.LinkedHashMap
      .empty[Option[String], scala.collection.mutable.ArrayBuffer[(String, String)]]
    def chainFor(l: Option[String]): Seq[(String, String)] =
      pending.get(l).map(_.toSeq).getOrElse(Nil)
    /** The per-row conditional apply: each language's pending chain as
      * one CASE branch (languages are bounded by the 1024 cap; the
      * re-materialization below bounds chain length, so expression size
      * stays O(langs x rematEvery)). */
    def applyByLang(sCol: Column): Column =
      pending.foldLeft(sCol) { case (acc, (l, ms)) =>
        val cond = l.map(v => col("__l") === lit(v)).getOrElse(col("__l").isNull)
        when(cond, bpeApply(sCol, ms.toSeq)).otherwise(acc)
      }
    try {
      val merges = scala.collection.mutable.ArrayBuffer.empty[(Option[String], Int, String, String)]
      var r = 0
      var exhausted = false
      var sincePin = 0
      while (r < numMerges && !exhausted) {
        val syms = bpeSymbols(applyByLang(col("__s")))
        val best = vocab
          .select(col("__l"), syms.as("__y"), col("__c"))
          .where(size(col("__y")) >= 2)
          .select(col("__l"), explode(arrays_zip(
            slice(col("__y"), lit(1), size(col("__y")) - 1).as("a"),
            slice(col("__y"), lit(2), size(col("__y")) - 1).as("b"))).as("__p"),
            col("__c"))
          .groupBy(col("__l"), col("__p.a").as("a"), col("__p.b").as("b"))
          .agg(sum(col("__c")).as("__n"))
          .withColumn("__rn", org.apache.spark.sql.functions.row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy(col("__l"))
              .orderBy(col("__n").desc, col("a"), col("b"))))
          .where(col("__rn") === 1)
          .select(col("__l"), col("a"), col("b")).collect()
        if (best.isEmpty) exhausted = true // every language fully collapsed
        else {
          r += 1
          sincePin += 1
          best.foreach { row =>
            val l = Option(row.getString(0))
            val m = (row.getString(1), row.getString(2))
            merges += ((l, r, m._1, m._2))
            pending.getOrElseUpdate(l,
              scala.collection.mutable.ArrayBuffer.empty[(String, String)]) += m
          }
          if (sincePin >= rematEvery && r < numMerges) {
            val (next, nIds) = graft.api.Pinned.checkpointTracked(vocab
              .select(col("__l"), applyByLang(col("__s")).as("__s"), col("__c")))
            vocab.unpersist(blocking = false)
            releaseIds(vocabCpIds); vocabCpIds = nIds
            vocab = next
            pending.clear()
            sincePin = 0
          }
        }
      }
      merges.toSeq
        .map { case (l, mr, a, b) => (l.orNull, mr, a, b) }
        .toDF("lang", "merge_rank", "lhs", "rhs")
    } finally {
      vocab.unpersist(blocking = false)
      releaseIds(vocabCpIds)
      releaseIds(vocab0Ids)
    }
  }

  /** Apply each document's OWN language's merge table: per-doc subword
    * count + sequence hash, exactly [[bpeTokenize]] under that
    * language's rules; documents in a language the table does not model
    * emit NULL count and hash (the by-language NULL-verdict convention,
    * [[Arpa.arpaScoreAgainstByLang]]'s posture). Zero-shuffle stateless
    * projection (the bounded language set rides the plan as CASE
    * branches of chained literal replaces), dual-mode by
    * construction. */
  def bpeTokenizeByLang(stream: graft.api.MStream,
                        mergesByLang: org.apache.spark.sql.DataFrame,
                        idCol: String, langCol: String,
                        textCol: String): graft.api.MStream = {
    val df = stream.df
    require(!mergesByLang.isStreaming,
      "bpeTokenizeByLang: the merge tables are a batch artifact")
    Seq("lang", "merge_rank", "lhs", "rhs").foreach(c =>
      require(mergesByLang.columns.contains(c),
        s"bpeTokenizeByLang: merge frame needs a '$c' column, has " +
          mergesByLang.columns.mkString("[", ", ", "]")))
    val rows = mergesByLang
      .select(col("lang"), col("merge_rank"), col("lhs"), col("rhs"))
      .collect().map(r => (Option(r.getString(0)), r.getInt(1),
        r.getString(2), r.getString(3))).toSeq
    require(rows.nonEmpty && rows.length <= 65536,
      s"bpeTokenizeByLang: the merge tables are a 1..65536-rule artifact, got ${rows.length}")
    val byLang: Seq[(Option[String], Seq[(String, String)])] = rows
      .groupBy(_._1).toSeq
      .map { case (l, xs) => l -> xs.sortBy(_._2).map(x => (x._3, x._4)) }
      .sortBy(_._1.map("\u0001" + _).getOrElse("")) // deterministic branch order
    require(byLang.size <= 1024,
      s"bpeTokenizeByLang: ${byLang.size} languages exceed the 1024-language cap")
    def piecesFor(ms: Seq[(String, String)]): Column =
      flatten(transform(words(col(textCol)),
        w => bpeSymbols(bpeApply(bpeWrap(w), ms))))
    val lang = col(langCol)
    val nullCnt = lit(null).cast("long")
    val (nExpr, hExpr) = byLang.foldLeft((nullCnt, nullCnt)) {
      case ((nAcc, hAcc), (l, ms)) =>
        val cond = l.map(v => lang === lit(v)).getOrElse(lang.isNull)
        val ps = piecesFor(ms)
        (when(cond, size(ps).cast("long")).otherwise(nAcc),
          when(cond, polyHash(array_join(ps, " "))).otherwise(hAcc))
    }
    stream.lift(spreadForCompute(df).select(col(idCol),
      nExpr.as("n_bpe_tokens"), hExpr.as("tok_hash")))
  }

  // -------------------------- byte-level BPE (the GPT-2 tokenizer proper)

  /** The GPT-2-style pre-tokenization pattern (Radford et al. 2019),
    * expressed WITHOUT the original's trailing-whitespace lookahead so
    * one pattern means the same thing in Java regex (Spark) and RE2
    * (the DuckDB oracle; RE2 has no lookahead): contraction suffixes,
    * optionally space-prefixed letter / digit / other runs, whitespace
    * runs. Documented deviation: in a MULTI-whitespace run the original
    * splits the last space onto the following word (` `+` word`); this
    * pattern keeps the run whole (`  `+`word`). Single spaces — all of
    * natural text — pre-tokenize identically. The whitespace class is
    * spelled explicitly because Java's `\s` includes U+000B and RE2's
    * does not. */
  val Gpt2PreTokenPattern: String =
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^ \t\n\f\r\x0b\p{L}\p{N}]+|[ \t\n\f\r\x0b]+"""

  /** Pre-tokens of `text` under [[Gpt2PreTokenPattern]], in order; the
    * alternatives cover every character, so concatenating the pre-tokens
    * rebuilds the text exactly. */
  def gpt2PreTokens(text: Column): Column =
    regexp_extract_all(text, lit(Gpt2PreTokenPattern), lit(0))

  /** [[graft.functions.Gpt2Bytes]] as a column: every UTF-8 byte maps
    * to one printable char of the fixed 256-char GPT-2 alphabet
    * (space → Ġ, newline → Ċ). */
  def gpt2Bytes(s: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.Gpt2Bytes(ColumnBridge.expr(s)))
  }

  /** Byte-level BPE merge training — the GPT-2 tokenizer proper (the
    * [[trainBpeMerges]] algorithm over GPT-2's working units): the
    * corpus pre-tokenizes under [[Gpt2PreTokenPattern]] (pre-tokens keep
    * their leading space; merges never cross pre-token boundaries),
    * every pre-token maps through the byte-level alphabet
    * ([[gpt2Bytes]] — so the symbol space is CLOSED at 256 chars and
    * whitespace-free, which is what lets GPT-2 artifacts ride the
    * space-separated `merges.txt` format), and the shared merge-round
    * loop learns `numMerges` rules by raw pair count. Output:
    * (merge_rank, lhs, rhs) in the MAPPED alphabet — exactly the rows a
    * GPT-2 `merges.txt` carries; export with [[bpeExportMerges]].
    *
    * Same scale shape as [[trainBpeMerges]]: one corpus pass builds the
    * distinct-pre-token frequency table, every round is a tiny
    * driver-coordinated job over it. */
  def trainByteBpeMerges(docs: org.apache.spark.sql.DataFrame, textCol: String,
                         numMerges: Int): org.apache.spark.sql.DataFrame = {
    require(numMerges >= 1 && numMerges <= 65536,
      s"numMerges=$numMerges: each merge is one driver-coordinated round " +
        "and the merge table is a driver artifact; keep <= 65536")
    val spark = docs.sparkSession
    val (vocab0, vocab0Ids) = graft.api.Pinned.checkpointTracked(
      spreadForCompute(docs)
      .select(explode(gpt2PreTokens(col(textCol))).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__c"))
      .select(bpeWrap(gpt2Bytes(col("__w"))).as("__s"), col("__c")))
    bpeTrainCore(spark, vocab0, vocab0Ids, numMerges)
  }

  def byteBpeOutputSchema(idCol: String,
      idType: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(StructField(idCol, idType),
      StructField("n_bbpe_tokens", LongType, nullable = false),
      StructField("tok_hash", LongType, nullable = false)))
  }

  /** Apply learned byte-level merges to every document: per-doc token
    * count + portable hash of the space-joined token sequence (tokens
    * are whitespace-free by the byte mapping, so the space join is
    * unambiguous). ZERO-SHUFFLE — no explode, no groupBy: the pre-token
    * array, byte mapping and chained merge replaces all run inside one
    * projection per row — so the face is dual-mode by construction
    * (unlike the word-BPE face, which needed a separate streaming
    * combine). Token-less documents (empty text) emit (0, 0). */
  def byteBpeTokenize(stream: graft.api.MStream,
                      merges: org.apache.spark.sql.DataFrame,
                      idCol: String, textCol: String): graft.api.MStream = {
    val df = stream.df
    val ms = collectMerges(merges, "byteBpeTokenize")
    val pieces = flatten(transform(gpt2PreTokens(col(textCol)),
      t => bpeSymbols(bpeApply(bpeWrap(gpt2Bytes(t)), ms))))
    stream.lift(spreadForCompute(df).select(col(idCol),
      size(pieces).cast("long").as("n_bbpe_tokens"),
      polyHash(array_join(pieces, " ")).as("tok_hash")))
  }

  /** Byte-level BPE tokenization straight to vocabulary IDS — the
    * GPT-2 cell of the tokenizer × output matrix: the id space derives
    * from the merge table alone in the HuggingFace layout
    * ([[bpeEncodeIds]]'s convention: in-merge alphabet in UTF-8 byte
    * order, then merge outputs by first rank); pieces outside it —
    * bytes no merge ever touched — take `oovId`. Adds `as`
    * (array<bigint>); zero-shuffle stateless projection, dual-mode by
    * construction. */
  def byteBpeEncodeIds(stream: graft.api.MStream,
                       merges: org.apache.spark.sql.DataFrame,
                       textCol: String, oovId: Long = -1L,
                       as: String = "ids"): graft.api.MStream = {
    val df = stream.df
    require(!df.columns.contains(as),
      s"byteBpeEncodeIds input already carries a '$as' column")
    val ms = collectMerges(merges, "byteBpeEncodeIds")
    val outFirstRank = ms.zipWithIndex
      .groupBy { case ((a, b), _) => a + b }
      .map { case (p, xs) => p -> xs.map(_._2).min }
    val atoms = ms.flatMap { case (a, b) => Seq(a, b) }.distinct
      .filterNot(outFirstRank.contains).sorted(Utf8Ordering)
    val idOf: Map[String, Long] =
      (atoms.zipWithIndex.map { case (p, i) => p -> i.toLong } ++
        outFirstRank.toSeq.sortBy(_._2).zipWithIndex
          .map { case ((p, _), i) => p -> (atoms.length + i).toLong }).toMap
    val pieces = flatten(transform(gpt2PreTokens(col(textCol)),
      t => bpeSymbols(bpeApply(bpeWrap(gpt2Bytes(t)), ms))))
    val ids = transform(pieces,
      p => graft.functions.VectorFunctions.strataLookup(p, idOf, oovId))
    stream.lift(spreadForCompute(df).withColumn(as, ids))
  }

  /** The canonical GPT-2 vocab layout derived from a merge table: the
    * full 256-character byte alphabet sorted by code point (ids 0..255
    * — exactly the published GPT-2 `vocab.json` head), then each
    * merge's output in rank order (a string two merges both produce
    * keeps its first rank). Outputs have >= 2 chars so they never
    * collide with the alphabet; ids stay dense. */
  private def byteBpeVocabLayout(ms: Seq[(String, String)]): Seq[String] = {
    val alphabet = graft.functions.Gpt2Bytes.ByteToChar
      .map(_.toString).toSeq.sorted(Utf8Ordering)
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    alphabet.foreach(seen += _)
    ms.foreach { case (a, b) => seen += (a + b) }
    seen.toSeq
  }

  /** Export the GPT-2 `vocab.json` half of the artifact pair (the
    * other half is [[bpeExportMerges]]'s `merges.txt`): a JSON object
    * mapping token -> id in the canonical layout — the 256-char byte
    * alphabet by code point, then merge outputs by rank — rendered in
    * id order so re-export is byte-identical. Paths resolve through
    * Hadoop FS (object stores on a cluster). */
  def byteBpeExportVocabJson(merges: org.apache.spark.sql.DataFrame,
                             path: String): Unit = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    import org.json4s.{JObject, JInt}
    val ms = collectMerges(merges, "byteBpeExportVocabJson")
    val fields = byteBpeVocabLayout(ms).zipWithIndex
      .map { case (piece, i) => piece -> org.json4s.JInt(i) }
    val json = JsonMethods.compact(JsonMethods.render(JObject(fields: _*)))
    val spark = merges.sparkSession
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val w = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      fs.create(p, true), java.nio.charset.StandardCharsets.UTF_8))
    try w.write(json) finally w.close()
  }

  /** Parse a GPT-2-style `vocab.json` (a JSON object token -> integer
    * id — the file next to every GPT-2-family checkpoint, including
    * files this engine never trained) into a (piece, gpt_id) frame for
    * [[byteBpeEncodeIdsImported]]. Driver-side parse capped at 65536
    * entries; duplicate ids fail by name (two tokens cannot share an
    * id). */
  def byteBpeImportVocabJson(spark: org.apache.spark.sql.SparkSession,
                             path: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    import org.json4s.jackson.JsonMethods
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"byteBpeImportVocabJson: no vocab file at $path")
    val src = scala.io.Source.fromInputStream(fs.open(p))(scala.io.Codec.UTF8)
    val text = try src.mkString finally src.close()
    val obj = JsonMethods.parse(text) match {
      case o: org.json4s.JObject => o.obj
      case other => throw new IllegalArgumentException(
        s"byteBpeImportVocabJson: $path is not a JSON object (token -> id)")
    }
    val rows = obj.map {
      case (piece, org.json4s.JInt(i)) => (piece, i.toLong)
      case (piece, other) => throw new IllegalArgumentException(
        s"byteBpeImportVocabJson: token '$piece' has a non-integer id $other")
    }
    require(rows.nonEmpty && rows.length <= 65536,
      s"byteBpeImportVocabJson: a vocabulary is a 1..65536-entry artifact, got ${rows.length}")
    val dupP = rows.groupBy(_._1).collectFirst { case (x, xs) if xs.size > 1 => x }
    require(dupP.isEmpty, s"byteBpeImportVocabJson: token '${dupP.get}' appears twice")
    val dupI = rows.groupBy(_._2).collectFirst { case (x, xs) if xs.size > 1 => x }
    require(dupI.isEmpty, s"byteBpeImportVocabJson: id ${dupI.get} assigned twice")
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(StructField("piece", StringType, nullable = false),
      StructField("gpt_id", LongType, nullable = false)))
    val data = rows.map { case (piece, i) => Row(piece, i) }
    spark.createDataFrame(new java.util.ArrayList[Row](data.asJava), schema)
  }

  /** Byte-level BPE tokenization to a FOREIGN vocab.json's OWN ids:
    * apply the merge table ([[byteBpeEncodeIds]]'s chain), then map
    * each piece through the imported (piece, gpt_id) frame — the id a
    * GPT-2-checkpoint-targeting pipeline must feed the model; pieces
    * outside the file take `oovId`. Zero-shuffle stateless projection,
    * dual-mode by construction. */
  def byteBpeEncodeIdsImported(stream: graft.api.MStream,
                               merges: org.apache.spark.sql.DataFrame,
                               vocab: org.apache.spark.sql.DataFrame,
                               textCol: String, oovId: Long = -1L,
                               as: String = "ids"): graft.api.MStream = {
    val df = stream.df
    require(!df.columns.contains(as),
      s"byteBpeEncodeIdsImported input already carries a '$as' column")
    require(!vocab.isStreaming,
      "byteBpeEncodeIdsImported: the vocabulary is a batch artifact")
    val ms = collectMerges(merges, "byteBpeEncodeIdsImported")
    Seq("piece", "gpt_id").foreach(c => require(vocab.columns.contains(c),
      s"byteBpeEncodeIdsImported: vocabulary frame needs a '$c' column, has " +
        vocab.columns.mkString("[", ", ", "]")))
    val rows = vocab.select(col("piece"), col("gpt_id").cast("long"))
      .limit(65537).collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    require(rows.nonEmpty && rows.length <= 65536,
      s"byteBpeEncodeIdsImported: a vocabulary is a 1..65536-entry artifact, got ${rows.length}")
    val idOf = rows.toMap
    require(idOf.size == rows.length,
      "byteBpeEncodeIdsImported: duplicate pieces in the vocabulary frame")
    val pieces = flatten(transform(gpt2PreTokens(col(textCol)),
      t => bpeSymbols(bpeApply(bpeWrap(gpt2Bytes(t)), ms))))
    val ids = transform(pieces,
      p => graft.functions.VectorFunctions.strataLookup(p, idOf, oovId))
    stream.lift(spreadForCompute(df).withColumn(as, ids))
  }

  /** Collect + validate a (merge_rank, lhs, rhs) merge table — the
    * shared BPE-artifact contract (trained or imported). */
  private def collectMerges(merges: org.apache.spark.sql.DataFrame,
                            label: String): Seq[(String, String)] = {
    require(!merges.isStreaming, s"$label: the merge table is a batch artifact")
    val ms = merges.select(col("merge_rank"), col("lhs"), col("rhs"))
      .collect().sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    require(ms.nonEmpty && ms.length <= 65536,
      s"$label: the merge table must be a 1..65536-rule artifact, got ${ms.length}")
    ms
  }

  /** Token-frequency annotation against a REFERENCE corpus sketch: one
    * pass over the reference folds every token into a count–min sketch
    * ([[graft.functions.CountMinAgg]]); the collected d×w table — the
    * model artifact, 8·d·w bytes — embeds into the scoring expressions
    * as a LITERAL, so annotating a document is a pure zero-shuffle
    * projection: per token, `est` = the sketch's upper-bound count in
    * the reference; per document, the rarest token's estimate and how
    * many tokens fall at or under `rareMax` (a hapax/garbage signal —
    * docs full of reference-unseen tokens are OOD for the corpus the
    * reference models). All outputs are integers — no float rounding in
    * the oracle contract.
    *
    * Dual-mode: batch groups per doc (q_token_freq carries the oracle);
    * streaming folds in the stateless per-batch combine — zero
    * state-store rows, no broadcast join either (the model rides the
    * plan as a literal). Token-less documents emit (0, NULL, 0) in both
    * modes. */
  def tokenFreqOutputSchema(idCol: String,
      idType: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(StructField(idCol, idType),
      StructField("n_tokens", LongType, nullable = false),
      StructField("min_est", LongType),
      StructField("n_rare", LongType, nullable = false)))
  }

  def tokenFrequencyStats(stream: graft.api.MStream,
                          refDocs: org.apache.spark.sql.DataFrame,
                          idCol: String, textCol: String, refTextCol: String,
                          depth: Int = 4, width: Int = 2048,
                          rareMax: Long = 2L): graft.api.MStream = {
    import org.apache.spark.sql.{Encoder, Row}
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    import org.apache.spark.sql.types._
    require(rareMax >= 0, s"rareMax must be non-negative, got $rareMax")
    // the model embeds in the PLAN as a literal array — size it for a
    // plan, not an executor heap; a bigger sketch should broadcast-join
    // a (bucket, count) table instead (the dsirScore shape)
    require(depth.toLong * width <= (1 << 16),
      s"tokenFrequencyStats keeps the $depth x $width sketch as a plan literal; " +
        "beyond 64K cells route the model through a broadcast join instead")
    val df = stream.df
    val vf = graft.functions.VectorFunctions
    val skRow = refDocs
      .select(explode(words(col(refTextCol))).as("__w"))
      .select(vf.polyHashNative(col("__w")).as("__h"))
      .agg(vf.countMin(col("__h"), depth, width).as("sk"), count(lit(1)).as("n"))
      .head()
    require(skRow.getLong(1) > 0,
      "tokenFrequencyStats: the reference corpus yields no tokens")
    val skLit = typedLit(skRow.getSeq[Long](0))
    val id = col(idCol)
    val est = vf.countMinEstimate(skLit, col("__h"), depth, width)
    def outCols(n: Column, mn: Column, rare: Column): Seq[Column] = Seq(
      coalesce(n, lit(0L)).as("n_tokens"), mn.as("min_est"),
      coalesce(rare, lit(0L)).as("n_rare"))

    if (!df.isStreaming) {
      val toks = df
        .select(id, explode(words(col(textCol))).as("__w"))
        .select(id, vf.polyHashNative(col("__w")).as("__h"))
        .select(id, est.as("__e"))
      val agg = toks.groupBy(id).agg(count(lit(1)).as("__n"),
        min(col("__e")).as("__mn"),
        sum(when(col("__e") <= rareMax, 1L).otherwise(0L)).as("__r"))
      val out = df.select(id).join(agg, Seq(idCol), "left")
        .select(id +: outCols(col("__n"), col("__mn"), col("__r")): _*)
      return stream.lift(out)
    }

    // streaming: token-less docs ride a sentinel (null-hash) row; the
    // fold skips sentinels. No join, no state — literal-model projection.
    val ws = words(col(textCol))
    val u = df
      .select(id.as("__id"),
        explode(when(size(ws) >= 1, transform(ws, w => vf.polyHashNative(w)))
          .otherwise(array(lit(null).cast("long")))).as("__h"))
      .select(col("__id"), when(col("__h").isNotNull, est).as("__e"))
    val idType = df.schema(idCol).dataType
    val aggT = StructType(Seq(
      StructField("__id", idType),
      StructField("n_tokens", LongType, nullable = false),
      StructField("min_est", LongType),
      StructField("n_rare", LongType, nullable = false)))
    val aggEnc: Encoder[Row] = RowEncoder.encoderFor(aggT)
    val eIdx = u.schema.fieldIndex("__e")
    val rm = rareMax
    val out = graft.streaming.PerBatchCombine(u, Seq("__id"), aggEnc) {
        (key: Row, it: Iterator[Row]) =>
          var n = 0L; var mn = Long.MaxValue; var rare = 0L
          it.foreach { r =>
            if (!r.isNullAt(eIdx)) {
              val e = r.getLong(eIdx)
              n += 1; if (e < mn) mn = e; if (e <= rm) rare += 1
            }
          }
          Iterator.single(Row(key.get(0), n, if (n > 0) mn else null, rare))
      }
      .select(col("__id").as(idCol) +:
        outCols(col("n_tokens"), col("min_est"), col("n_rare")): _*)
    stream.lift(out)
  }

  /** Heavy hitters via a count–min sketch (Cormode & Muthukrishnan 2005):
    * tokens whose estimated frequency is at least `1/minFracInv` of the
    * corpus token count. Two passes, both cluster-shaped: (1) fold every
    * token into ONE fixed d×w sketch ([[graft.functions.CountMinAgg]] —
    * map-side partials, the shuffle carries one table per partition);
    * (2) score candidate tokens against the broadcast sketch and keep
    * `estimate * minFracInv >= N` (integer arithmetic — no float
    * threshold to disagree across engines). Estimates are CMS upper
    * bounds: a token within εN of the line can surface though its exact
    * count is below it — that is the sketch's contract, deterministic
    * and mirrored cell-for-cell by the oracle.
    *
    * Candidates here are the distinct vocabulary (one extra shuffle,
    * bounded by vocabulary size, NOT corpus size). At 100 TB the sketch
    * is the artifact: build once, broadcast, point-query arriving items
    * with [[graft.functions.VectorFunctions.countMinEstimate]] — no
    * vocabulary pass needed for the query side. */
  def heavyHitters(docs: org.apache.spark.sql.DataFrame, textCol: String,
                   depth: Int = 4, width: Int = 2048,
                   minFracInv: Long = 1000): org.apache.spark.sql.DataFrame = {
    require(minFracInv >= 1, s"heavyHitters needs minFracInv >= 1, got $minFracInv")
    val vf = graft.functions.VectorFunctions
    val toks = docs
      .select(explode(words(col(textCol))).as("word"))
      .select(col("word"), vf.polyHashNative(col("word")).as("__h"))
    val sk = toks.agg(vf.countMin(col("__h"), depth, width).as("__sk"),
      count(lit(1)).as("__n"))
    toks.distinct()
      .crossJoin(broadcast(sk))
      .withColumn("est", vf.countMinEstimate(col("__sk"), col("__h"), depth, width))
      .where(col("est") * minFracInv >= col("__n"))
      .select(col("word"), col("est"))
  }
}
