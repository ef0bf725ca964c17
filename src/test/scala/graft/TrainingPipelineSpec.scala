package graft

import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, Sampling, TextOps}
import graft.sources.Tables

/** End-to-end training-data pipeline over the real test corpus: quality
  * filter → corpus dedup (exact + near, transitive) → deterministic split
  * → vocabulary + id encoding → sequence packing. One composed dataflow —
  * the way a user of this library would actually run it — with row/token
  * accounting pinned at every stage boundary. */
class TrainingPipelineSpec extends SparkSpec {

  test("quality filter -> dedup -> split -> encode -> pack composes with exact accounting") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir).df
    val total = docs.count()
    assert(total > 0)

    // 1. quality filter: keep documents with enough words and a sane
    //    average word length (Gopher-style gate)
    val quality = TextOps.qualityFeatures(col("text"))
      .foldLeft(docs) { case (d, (n, c)) => d.withColumn(n, c) }
    val kept = quality.filter(col("n_words") >= 5 && col("avg_word_len") <= 15.0)
      .select("doc_id", "text")
    val nKept = kept.count()
    assert(nKept > 0 && nKept <= total, "quality gate keeps a non-trivial subset")

    // 2. corpus dedup: one survivor per exact/near duplicate group
    val survivors = Dedup.deduplicateCorpus(kept, "doc_id", "text",
      k = 16, bands = 8, threshold = 0.8)
    val nSurv = survivors.count()
    assert(nSurv > 0 && nSurv <= nKept, "dedup only removes documents")
    val survivedDocs = kept.join(survivors, Seq("doc_id"), "left_semi")
    assert(survivedDocs.count() == nSurv, "every survivor id maps to a kept document")

    // 3. deterministic split: labels partition the survivors exactly
    val split = Sampling.assignSplit(survivedDocs, col("doc_id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val byLabel = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLabel.keySet.subsetOf(Set("train", "val", "test")))
    assert(byLabel.values.sum == nSurv, "split labels partition the survivors")

    // 4. vocabulary + encoding over the train slice only (no leakage)
    val train = split.filter(col("split") === "train").select("doc_id", "text")
    val nTrain = byLabel.getOrElse("train", 0L)
    assert(train.count() == nTrain)
    val vocab = TextOps.buildVocab(train, "text", minCount = 2, maxSize = 5000)
    val vocabRows = vocab.collect()
    assert(vocabRows.nonEmpty, "corpus yields a vocabulary")
    assert(vocabRows.map(_.getLong(2)).sorted.toSeq == (0L until vocabRows.length).toSeq,
      "vocabulary ids are contiguous from 0")
    val encoded = TextOps.encodeTokens(train, "doc_id", "text", vocab)
    assert(encoded.count() == nTrain, "every train document encodes")
    val tokenCheck = train
      .select(col("doc_id"), size(TextOps.words(col("text"))).as("__n"))
      .join(encoded.select(col("doc_id"), size(col("ids")).as("__e")), "doc_id")
      .filter(col("__n") =!= col("__e")).count()
    assert(tokenCheck == 0, "encoding preserves token counts (OOV included)")

    // 5. sequence packing: chunk budgets cover every train document once
    val packed = TextOps.packChunks(train.withColumn("part", lit(0)),
      "doc_id", "text", "part", budget = 2048L)
    assert(packed.count() == nTrain, "packing assigns every document a chunk")
    assert(packed.agg(min("chunk_id")).collect().head.getLong(0) == 0L)
  }
}
