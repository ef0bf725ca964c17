package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Unigram-LM tokenizer (SentencePiece's model family — Kudo 2018,
 * "Subword Regularization") — the EM-trained counterpart to
 * [[TextOps.trainBpeMerges]]; a training-data pipeline targeting
 * Llama-style tokenizers needs this family, not just BPE.
 *
 * This is the deterministic hard-EM (Viterbi) variant, chosen so an
 * independent engine reproduces every decision bit-for-bit (the oracle
 * stance; soft-EM forward-backward sums are fp-order-sensitive):
 *
 *  - SEED: candidate pieces = every substring of corpus words up to
 *    `maxPieceLen` chars, counted per occurrence weighted by word
 *    frequency; the vocabulary starts as the top `seedSize` candidates
 *    (count desc, piece asc) plus ALL single characters.
 *  - E-STEP: each DISTINCT word segments by Viterbi over the current
 *    piece probabilities — dp[i] = max over piece lengths l of
 *    dp[i−l] · p(word[i−l+1..i]), ties to the LONGER piece — and each
 *    chosen piece collects the word's corpus frequency.
 *  - M-STEP + PRUNE: keep the top `vocabSize` pieces by (count desc,
 *    piece asc) plus the previous vocabulary's single characters
 *    (floored to count 1 so the fallback path keeps positive mass),
 *    renormalize p = count / Σ count. `emRounds` rounds.
 *
 * DETERMINISM ACROSS ENGINES: all Viterbi arithmetic is products of
 * p = count/total — correctly-rounded IEEE divisions of exact integers
 * and multiplications, bit-identical in any IEEE engine (no
 * transcendentals inside decisions; `logprob` is display-only). Unknown
 * single characters take exactly 1e-100 (a literal both engines parse
 * identically), so segmentation is total on any input.
 *
 * Scale shape: training segments the DISTINCT-WORD table (the classic
 * dedup — corpus-frequency-weighted), so each E-step is one narrow
 * projection over a vocabulary-of-words-sized frame plus one
 * partial-aggregated count; the piece vocabulary is the driver-sized
 * artifact (capped), collected once per round like the BPE trainer.
 * [[tokenize]] is a ZERO-SHUFFLE stateless projection (the Viterbi runs
 * inline per word occurrence against the broadcast-literal vocabulary),
 * so it is dual-mode by construction.
 */
object Unigram {

  /** The vocabulary total order (count desc, piece asc) with the piece
    * tie-break in UTF-8 BYTE order — Spark's and DuckDB's binary string
    * collation (Java's UTF-16 order diverges for [U+E000, U+FFFF] vs
    * supplementary-plane pieces, so a plain tuple sort would let astral
    * text drift from the oracle). */
  private val VocabOrder: Ordering[(String, Long)] =
    Ordering.by[(String, Long), Long] { case (_, c) => -c }
      .orElse(TextOps.Utf8Ordering.on[(String, Long)](_._1))

  /** One CODE POINT (an astral char is a 2-unit Java string but one
    * position in Spark/DuckDB length arithmetic). */
  private def isSingleChar(p: String): Boolean =
    p.codePointCount(0, p.length) == 1

  /** Probability map of a vocabulary (piece → count/total): exact
    * IEEE divisions of exact integers, bit-identical in any engine. */
  private def probsOf(vocab: Seq[(String, Long)]): Map[String, Double] = {
    val total = vocab.map(_._2).sum.toDouble
    vocab.map { case (piece, c) => piece -> (c.toDouble / total) }.toMap
  }

  /** Viterbi segmentation of a text column into pieces (array<string>)
    * under the probability map: dp over code-point positions in
    * PROBABILITY space (products of exact-division doubles — engine-
    * reproducible), ties to the longer piece (ascending-l fold with >=),
    * unknown single chars at the exact literal 1e-100. Lowered onto the
    * native [[graft.functions.UnigramSegment]] expression (compiled DP
    * inside whole-stage codegen — the interpreted-HOF formulation cost
    * ~27 µs per word occurrence); single-word inputs segment as one
    * word, whole documents word-scan inline. */
  private[graft] def segmentExpr(w: Column, probs: Map[String, Double],
                                 maxPieceLen: Int): Column = {
    // deterministic key order (Map iteration order is not)
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val ks = probs.keys.toSeq.sorted
    ColumnBridge.column(graft.functions.UnigramSegment(
      ColumnBridge.expr(w), ks, ks.map(probs), maxPieceLen))
  }

  private def checkParams(vocabSize: Int, maxPieceLen: Int, emRounds: Int,
                          seedSize: Int): Unit = {
    require(vocabSize >= 1 && vocabSize <= 65536,
      s"vocabSize=$vocabSize: the piece vocabulary is a driver artifact; keep 1..65536")
    require(maxPieceLen >= 1 && maxPieceLen <= 16,
      s"maxPieceLen=$maxPieceLen: keep 1..16 (the Viterbi fan-out per position)")
    require(emRounds >= 1 && emRounds <= 16,
      s"emRounds=$emRounds: each round is one driver-coordinated pass; keep 1..16")
    require(seedSize >= 1 && seedSize <= 65536,
      s"seedSize=$seedSize: the seed vocabulary is a driver artifact; keep 1..65536")
  }

  /** Train a unigram-LM piece vocabulary. Output (piece, cnt, logprob):
    * `cnt` is the final E-step count (single chars floored to 1 — the
    * exact values [[tokenize]] renormalizes from), `logprob` =
    * round(ln(cnt/total), 6), display-only. */
  def trainVocab(docs: DataFrame, textCol: String, vocabSize: Int,
                 maxPieceLen: Int = 4, emRounds: Int = 2,
                 seedSize: Int = 2000): DataFrame = {
    checkParams(vocabSize, maxPieceLen, emRounds, seedSize)
    require(!docs.isStreaming,
      "trainVocab is batch-only (corpus-wide EM); tokenize streams")
    val spark = docs.sparkSession
    import spark.implicits._
    // the distinct-word table, corpus-frequency weighted — every round
    // segments THIS frame, so pin it once
    val (words0, wIds) = graft.api.Pinned.checkpointTracked(
      docs.select(explode(TextOps.words(col(textCol))).as("__w"))
        .groupBy(col("__w")).agg(count(lit(1)).as("__wc")))
    graft.api.Pinned.register(spark, wIds)
    val w = col("__w")
    // seed candidates: every substring up to maxPieceLen, per occurrence
    val subs = flatten(transform(sequence(lit(1), length(w)), i =>
      transform(sequence(lit(1), least(lit(maxPieceLen), length(w) - i + lit(1))),
        l => w.substr(i, l))))
    val cand = words0.select(col("__wc"), explode(subs).as("piece"))
      .groupBy(col("piece")).agg(sum(col("__wc")).as("cnt"))
    val topSeed = cand.orderBy(col("cnt").desc, col("piece")).limit(seedSize)
      .as[(String, Long)].collect()
    val chars = cand.where(length(col("piece")) === 1)
      .as[(String, Long)].collect()
    require(chars.nonEmpty, "trainVocab: the corpus has no words")
    var vocab: Seq[(String, Long)] =
      (topSeed ++ chars).distinct.sorted(VocabOrder)
    val charSet = chars.map(_._1).toSet

    for (_ <- 1 to emRounds) {
      val probs = probsOf(vocab)
      val counts = words0
        .select(col("__wc"), explode(segmentExpr(w, probs, maxPieceLen)).as("piece"))
        .groupBy(col("piece")).agg(sum(col("__wc")).as("cnt"))
        .as[(String, Long)].collect().toMap
      // prune: top vocabSize by (count desc, piece asc) + the previous
      // vocabulary's single chars floored to 1 (fallback mass)
      val top = counts.toSeq.sorted(VocabOrder).take(vocabSize)
      val keptChars = vocab.collect {
        case (p, _) if charSet(p) && isSingleChar(p) =>
          p -> math.max(counts.getOrElse(p, 0L), 1L)
      }
      vocab = (top ++ keptChars).groupBy(_._1).map { case (p, xs) =>
        // a floored char also in top carries the same value both ways
        p -> xs.map(_._2).max
      }.toSeq.sorted(VocabOrder)
    }
    val total = vocab.map(_._2).sum.toDouble
    vocab.map { case (p, c) =>
      (p, c, BigDecimal(math.log(c.toDouble / total))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toDF("piece", "cnt", "logprob")
  }

  /** Collect + validate a (piece, cnt) vocabulary frame — the shared
    * artifact contract of the apply faces. */
  private def collectVocab(vocab: DataFrame, label: String): Seq[(String, Long)] = {
    require(!vocab.isStreaming, s"$label: the vocabulary is a batch artifact")
    Seq("piece", "cnt").foreach(c => require(vocab.columns.contains(c),
      s"$label: vocabulary frame needs column '$c' (have: " +
        s"${vocab.columns.mkString(", ")})"))
    val spark = vocab.sparkSession
    import spark.implicits._
    val rows = vocab.select(col("piece"), col("cnt").cast("long"))
      .as[(String, Long)].collect()
    require(rows.nonEmpty && rows.length <= 65536,
      s"$label: vocabulary must be a 1..65536-piece artifact, got ${rows.length}")
    rows.toSeq
  }

  /** Tokenize `textCol` into unigram-LM pieces under a trained (or
    * loaded — [[graft.api.Artifacts]]) vocabulary frame carrying
    * (piece, cnt): adds `pieces` (array<string>). A zero-shuffle
    * stateless projection — dual-mode by construction (the Viterbi runs
    * inline per word against the literal vocabulary). */
  def tokenize(stream: graft.api.MStream, vocab: DataFrame,
               textCol: String, maxPieceLen: Int = 4,
               as: String = "pieces"): graft.api.MStream = {
    val df = stream.df
    require(!df.columns.contains(as),
      s"tokenize input already carries a '$as' column")
    val rows = collectVocab(vocab, "tokenize")
    val probs = probsOf(rows)
    // the native expression word-scans the whole text itself — one
    // compiled pass per row, no per-word lambda
    stream.lift(TextOps.spreadForCompute(df).withColumn(as,
      segmentExpr(col(textCol), probs, maxPieceLen)))
  }

  // -------------------------- SentencePiece .vocab interop (foreign vocabularies)

  /** Export a trained (piece, cnt) vocabulary as a SentencePiece text
    * vocab file: `piece<TAB>logprob` per line in ID ORDER (cnt desc,
    * piece asc in UTF-8 byte order — [[encodeIds]]' ranks, so the LINE
    * NUMBER is the piece id, SentencePiece's own convention); logprob =
    * round(ln(cnt/total), 6), exactly [[trainVocab]]'s display column —
    * the tokenizer analog of [[Arpa]]'s ARPA export. Paths resolve
    * through Hadoop FS (object stores on a cluster). */
  def exportVocab(vocab: DataFrame, path: String): Unit = {
    val rows = collectVocab(vocab, "exportVocab").sorted(VocabOrder)
    val total = rows.map(_._2).sum.toDouble
    val spark = vocab.sparkSession
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val w = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      fs.create(p, true), java.nio.charset.StandardCharsets.UTF_8))
    try rows.foreach { case (piece, c) =>
      val lp = BigDecimal(math.log(c.toDouble / total))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      w.write(s"$piece\t$lp\n")
    } finally w.close()
  }

  /** Parse a SentencePiece text vocab file (`piece<TAB>score` — the
    * `.vocab` our [[exportVocab]] writes AND the one `spm_train` emits
    * next to every model) into a (piece, logprob, sp_id) frame: `sp_id`
    * is the 0-based LINE NUMBER — the id a SentencePiece-targeting
    * pipeline expects. Driver-side streaming parse capped at 65536
    * pieces (the vocabulary-artifact contract); feed to
    * [[tokenizeImported]]/[[encodeIdsImported]]. */
  def importVocab(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"importVocab: no vocab file at $path")
    val src = scala.io.Source.fromInputStream(fs.open(p))(scala.io.Codec.UTF8)
    val rows = try {
      src.getLines().zipWithIndex.flatMap { case (line, i) =>
        if (line.isEmpty) None
        else {
          val cut = line.indexOf('\t')
          require(cut > 0,
            s"importVocab: malformed line ${i + 1} '$line' (want piece<TAB>score)")
          val piece = line.substring(0, cut)
          val lp = java.lang.Double.parseDouble(line.substring(cut + 1).trim)
          Some((piece, lp))
        }
      }.toVector
    } finally src.close()
    require(rows.nonEmpty && rows.length <= 65536,
      s"importVocab: a vocabulary is a 1..65536-piece artifact, got ${rows.length}")
    val dup = rows.groupBy(_._1).collectFirst { case (p0, xs) if xs.size > 1 => p0 }
    require(dup.isEmpty, s"importVocab: piece '${dup.get}' appears twice in $path")
    import scala.jdk.CollectionConverters._
    val schema = StructType(Seq(StructField("piece", StringType, nullable = false),
      StructField("logprob", DoubleType, nullable = false),
      StructField("sp_id", LongType, nullable = false)))
    val data = rows.zipWithIndex.map { case ((piece, lp), i) => Row(piece, lp, i.toLong) }
    spark.createDataFrame(new java.util.ArrayList[Row](data.asJava), schema)
  }

  /** Collect + validate a FOREIGN (piece, logprob [, sp_id]) vocabulary
    * frame — the imported-artifact contract. Returns rows in sp_id order
    * when present, frame order otherwise. */
  private def collectVocabLp(vocab: DataFrame, label: String): Seq[(String, Double, Long)] = {
    require(!vocab.isStreaming, s"$label: the vocabulary is a batch artifact")
    Seq("piece", "logprob").foreach(c => require(vocab.columns.contains(c),
      s"$label: imported vocabulary frame needs column '$c' (have: " +
        s"${vocab.columns.mkString(", ")}) — trained (piece, cnt) frames " +
        "bind to the non-imported faces"))
    val spark = vocab.sparkSession
    import spark.implicits._
    val withId =
      if (vocab.columns.contains("sp_id")) vocab
      else vocab.withColumn("sp_id", monotonically_increasing_id())
    val rows = withId
      .select(col("piece"), col("logprob").cast("double"), col("sp_id").cast("long"))
      .as[(String, Double, Long)].collect().sortBy(_._3)
    require(rows.nonEmpty && rows.length <= 65536,
      s"$label: vocabulary must be a 1..65536-piece artifact, got ${rows.length}")
    rows.foreach { case (_, lp, _) => require(!lp.isNaN && !lp.isInfinite,
      s"$label: non-finite logprob in the imported vocabulary") }
    rows.toSeq
  }

  /** The max piece length (CODE POINTS) an imported vocabulary needs the
    * Viterbi to probe — derived from the artifact itself (capped at the
    * DP's 16, a named error: a longer piece is not a subword). */
  private def maxLenOf(rows: Seq[(String, Double, Long)], label: String): Int = {
    val m = rows.iterator.map(r => r._1.codePointCount(0, r._1.length)).max
    require(m >= 1 && m <= 16,
      s"$label: imported pieces up to $m code points — the Viterbi probes " +
        "at most 16 (a longer piece is not a subword vocabulary)")
    m
  }

  /** [[tokenize]] against a FOREIGN log-prob vocabulary ([[importVocab]]
    * or any (piece, logprob) frame): the Viterbi runs in LOG space —
    * dp[i] = max of dp[i−l] + lp(piece), ties to the longer piece,
    * unknown single chars at exactly −1000.0 — so every decision
    * compares sums of identically-parsed doubles, engine-reproducible
    * like the product fold. Same zero-shuffle stateless projection,
    * dual-mode by construction. */
  def tokenizeImported(stream: graft.api.MStream, vocab: DataFrame,
                       textCol: String, as: String = "pieces"): graft.api.MStream = {
    val df = stream.df
    require(!df.columns.contains(as),
      s"tokenizeImported input already carries a '$as' column")
    val rows = collectVocabLp(vocab, "tokenizeImported")
    stream.lift(TextOps.spreadForCompute(df).withColumn(as,
      segmentLogExpr(col(textCol), rows, "tokenizeImported")))
  }

  /** [[encodeIds]] against a FOREIGN vocabulary: pieces map to their
    * `sp_id` (the vocab file's LINE NUMBER — the id space the foreign
    * tokenizer's consumers expect), OOV single chars to `oovId`. Adds
    * `as` (array<bigint>); zero-shuffle, dual-mode. */
  def encodeIdsImported(stream: graft.api.MStream, vocab: DataFrame,
                        textCol: String, oovId: Long = -1L,
                        as: String = "ids"): graft.api.MStream = {
    val df = stream.df
    require(!df.columns.contains(as),
      s"encodeIdsImported input already carries a '$as' column")
    val rows = collectVocabLp(vocab, "encodeIdsImported")
    val idOf = rows.map { case (p, _, i) => p -> i }.toMap
    val ids = transform(segmentLogExpr(col(textCol), rows, "encodeIdsImported"),
      p => graft.functions.VectorFunctions.strataLookup(p, idOf, oovId))
    stream.lift(TextOps.spreadForCompute(df).withColumn(as, ids))
  }

  private def segmentLogExpr(w: Column, rows: Seq[(String, Double, Long)],
                             label: String): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val lps = rows.map(r => r._1 -> r._2).toMap
    val ks = lps.keys.toSeq.sorted
    ColumnBridge.column(graft.functions.UnigramSegment(
      ColumnBridge.expr(w), ks, ks.map(lps), maxLenOf(rows, label),
      logSpace = true))
  }

  /** Tokenize straight to vocabulary IDS — what a training pipeline
    * feeds the model (SentencePiece emits ids, not strings): each piece
    * maps to its rank in the vocabulary by (cnt desc, piece asc),
    * 0-based — the deterministic id assignment an independent engine
    * reproduces; pieces outside the vocabulary (unknown single chars)
    * take `oovId`. Same zero-shuffle stateless projection as
    * [[tokenize]] (the id map rides the hash-table lookup expression
    * inside whole-stage codegen), dual-mode by construction. Adds `as`
    * (array<bigint>). */
  def encodeIds(stream: graft.api.MStream, vocab: DataFrame,
                textCol: String, maxPieceLen: Int = 4, oovId: Long = -1L,
                as: String = "ids"): graft.api.MStream = {
    val df = stream.df
    require(!df.columns.contains(as),
      s"encodeIds input already carries a '$as' column")
    val rows = collectVocab(vocab, "encodeIds")
    val probs = probsOf(rows)
    val idOf = rows.sorted(VocabOrder).zipWithIndex
      .map { case ((p, _), i) => p -> i.toLong }.toMap
    val ids = transform(segmentExpr(col(textCol), probs, maxPieceLen),
      p => graft.functions.VectorFunctions.strataLookup(p, idOf, oovId))
    stream.lift(TextOps.spreadForCompute(df).withColumn(as, ids))
  }
}
