package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Sentence-delimited LM windowing — the opt-in `<s>`/`</s>` mode of the
 * KN/ARPA faces (KenLM's own semantics for sentence-trained models,
 * closing the engine's documented document-windowed deviation for
 * artifacts that carry boundary entries):
 *
 *  - text splits into sentences on terminal punctuation runs (`[.!?]+` —
 *    the terminators leave the token stream, mirrored exactly by the
 *    oracle's `string_split_regex`), empty sentences drop;
 *  - each sentence's token stream is `(order−1) × <s>` ++ words ++
 *    `</s>` (SRILM-style full padding, so every REAL event — each word
 *    and the `</s>` — sits under a full-order window; grams never cross
 *    sentences because each sentence is its own row);
 *  - `<s>` is never a predicted event: every full-order window of a
 *    padded sentence already ends at a real token, and training drops
 *    the lower-order grams whose TARGET is `<s>` (`dropBosTargets`) so
 *    `<s>` never enters a continuation table or the vocabulary — it
 *    contributes contexts and back-off weights only, like KenLM's
 *    prob-less `<s>` entry.
 *
 * A sentence scores n+1 events (its n words plus `</s>`), so a
 * document's n_grams is Σ (tokens+1) over its non-empty sentences.
 * Documents with no sentence (empty text, punctuation only) keep the
 * (0, NULL) verdict. Pathological text containing the literal tokens
 * `<s>`/`</s>` collides with the markers — KenLM has the same property.
 */
private[pipeline] object Sentences {

  /** Sentence terminator runs — mirrored by the oracle as
    * `string_split_regex(text, '[.!?]+')`. */
  val SplitPat: String = "[.!?]+"

  private def padArr(order: Int): Column =
    array((1 until order).map(_ => lit("<s>")): _*)

  /** Reference corpus → one row per non-empty sentence, the padded token
    * stream re-joined as text under the SAME column name (so
    * [[TextOps.knModel]] consumes it unchanged; train with
    * `dropBosTargets = true`). */
  def explodeRef(refDocs: DataFrame, textCol: String, order: Int): DataFrame =
    refDocs
      .select(explode(split(col(textCol), SplitPat)).as("__sent"))
      .select(TextOps.words(col("__sent")).as("__sw"))
      .where(size(col("__sw")) > 0)
      .select(concat_ws(" ",
        concat(padArr(order), col("__sw"), array(lit("</s>")))).as(textCol))

  /** Batch scoring positions: (id, padded sentence text) rows — feed to
    * [[TextOps.gramsOf]] at the model order (every padded sentence has
    * at least `order + 1` tokens, so every sentence contributes its full
    * n+1 windows). */
  def explodeDocs(df: DataFrame, id: Column, textCol: String,
                  order: Int): DataFrame =
    df.select(id, explode(split(col(textCol), SplitPat)).as("__sent"))
      .select(id, TextOps.words(col("__sent")).as("__sw"))
      .where(size(col("__sw")) > 0)
      .select(id, concat_ws(" ",
        concat(padArr(order), col("__sw"), array(lit("</s>")))).as("__stext"))

  /** Streaming scoring windows: one array<struct g1..gN> per document —
    * every sentence's n+1 full-order windows over its padded stream,
    * flattened (empty = the no-position document; the caller's sentinel
    * handles it). */
  def windows(textCol: Column, order: Int): Column = {
    val sents = filter(
      transform(split(textCol, SplitPat), s => TextOps.words(s)),
      a => size(a) > 0)
    flatten(transform(sents, a => {
      val pa = concat(padArr(order), a, array(lit("</s>")))
      transform(sequence(lit(1), size(a) + lit(1)), i =>
        struct((1 to order).map(k =>
          element_at(pa, i + lit(k - 1)).as(s"g$k")): _*))
    }))
  }
}
