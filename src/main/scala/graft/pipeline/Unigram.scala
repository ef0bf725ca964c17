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
      (topSeed ++ chars).distinct.sortBy { case (p, c) => (-c, p) }
    val charSet = chars.map(_._1).toSet

    for (_ <- 1 to emRounds) {
      val probs = probsOf(vocab)
      val counts = words0
        .select(col("__wc"), explode(segmentExpr(w, probs, maxPieceLen)).as("piece"))
        .groupBy(col("piece")).agg(sum(col("__wc")).as("cnt"))
        .as[(String, Long)].collect().toMap
      // prune: top vocabSize by (count desc, piece asc) + the previous
      // vocabulary's single chars floored to 1 (fallback mass)
      val top = counts.toSeq.sortBy { case (p, c) => (-c, p) }.take(vocabSize)
      val keptChars = vocab.collect {
        case (p, _) if charSet(p) && p.length == 1 =>
          p -> math.max(counts.getOrElse(p, 0L), 1L)
      }
      vocab = (top ++ keptChars).groupBy(_._1).map { case (p, xs) =>
        // a floored char also in top carries the same value both ways
        p -> xs.map(_._2).max
      }.toSeq.sortBy { case (p, c) => (-c, p) }
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
    stream.lift(df.withColumn(as,
      segmentExpr(col(textCol), probs, maxPieceLen)))
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
    val idOf = rows.sortBy { case (p, c) => (-c, p) }.zipWithIndex
      .map { case ((p, _), i) => p -> i.toLong }.toMap
    val ids = transform(segmentExpr(col(textCol), probs, maxPieceLen),
      p => graft.functions.VectorFunctions.strataLookup(p, idOf, oovId))
    stream.lift(df.withColumn(as, ids))
  }
}
