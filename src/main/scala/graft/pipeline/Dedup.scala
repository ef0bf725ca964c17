package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for training-data pipelines. Every variant is a
 * pure DataFrame pipeline (shuffle count noted per operator) designed to
 * survive a 100 TB corpus: no driver collects, no all-pairs comparisons
 * outside LSH buckets, per-doc work bounded by document length.
 *
 * Algorithms are the classic public ones: MinHash resemblance sketching
 * (Broder, "On the resemblance and containment of documents", 1997) with
 * banded LSH (Leskovec/Rajaraman/Ullman, "Mining of Massive Datasets"
 * ch. 3), and SimHash (Charikar, "Similarity estimation techniques from
 * rounding algorithms", 2002).
 */
object Dedup {

  /** Exact dedup: one representative (min id) per identical text.
    * One shuffle (groupBy text). At 100 TB, group by `xxhash64(text)`
    * instead so the shuffle key is 8 bytes, not the document. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** MinHash signature: k portable minhashes over word-3-gram shingles,
    * computed in one pass per document (`MinHashSignature` expression) —
    * no explode, no shuffle; the signature never leaves the row. */
  def minhashSignature(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val hashes = graft.functions.VectorFunctions.wordShingleHashes(col(textCol), 3)
    val sig = graft.functions.VectorFunctions.minhashSignature(hashes, k)
    // explode(array(sig)) is a deliberate Generate barrier: without it,
    // CollapseProject inlines the signature into every element_at below
    // and the whole k-pass evaluates once PER REFERENCED ELEMENT.
    docs.select(col(idCol), explode(array(sig)).as("__mhs"))
      // docs with no shingles (under n words) have no signature — same as
      // the explode formulation, and it keeps them out of a shared bucket
      .filter(element_at(col("__mhs"), 1) =!= Long.MaxValue)
      .select(col(idCol) +: (0 until k).map(j => element_at(col("__mhs"), j + 1).as(s"mh$j")): _*)
      // one small shuffle of compact signatures: the LSH band self-join
      // then reuses this exchange on both sides (ReuseExchange), instead
      // of re-shingling and re-hashing every document per side
      .repartition(col(idCol))
  }

  /** LSH banding: k minhashes → `bands` band keys; docs sharing any band
    * key become candidate pairs. Shuffles on the band key only — the
    * classic scalable near-dup candidate generator (no all-pairs). */
  def lshCandidates(sig: DataFrame, idCol: String, k: Int, bands: Int): DataFrame = {
    val rows = k / bands
    val bandCols = (0 until bands).map { b =>
      val combined = (0 until rows).map(r => col(s"mh${b * rows + r}")).reduce((x, y) => x * 31L + y)
      struct(lit(b).as("band"), combined.as("bv"))
    }
    val e = sig.select(col(idCol), explode(array(bandCols: _*)).as("__bk"))
    e.as("a").join(e.as("b"),
        col("a.__bk") === col("b.__bk") && col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .distinct()
  }

  /** Full MinHash+LSH near-dup pipeline: candidates from LSH, then exact
    * shingle-Jaccard verification of candidates only. */
  def minhashNearDup(docs: DataFrame, idCol: String, textCol: String,
                     k: Int, bands: Int, threshold: Double): DataFrame = {
    val cands = lshCandidates(minhashSignature(docs, idCol, textCol, k), idCol, k, bands)
    // verification over hashed shingles: sorted-long sets + the codegen'd
    // two-pointer merge, no shingle strings anywhere in the pipeline
    val sets = docs.select(col(idCol), sort_array(array_distinct(
      graft.functions.VectorFunctions.wordShingleHashes(col(textCol), 3))).as("__sh"))
    cands
      .join(sets.select(col(idCol).as("id_a"), col("__sh").as("__sha")), "id_a")
      .join(sets.select(col(idCol).as("id_b"), col("__sh").as("__shb")), "id_b")
      .withColumn("jaccard",
        graft.functions.VectorFunctions.jaccardSorted(col("__sha"), col("__shb")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 3).as("jaccard"))
  }

  /** SimHash: 16-bit signature over word hashes; near-dups share signatures
    * within small Hamming distance. One shuffle (groupBy doc). */
  def simhash(docs: DataFrame, idCol: String, textCol: String, bits: Int = 16): DataFrame = {
    val exploded = docs
      .select(col(idCol), explode(TextOps.words(col(textCol))).as("__w"))
      .withColumn("__h", TextOps.polyHash(col("__w")))
    val bitSums = (0 until bits).map { i =>
      sum(when(shiftright(col("__h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"__b$i")
    }
    exploded.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
      .select(col(idCol),
        (0 until bits).map(i => when(col(s"__b$i") > 0, lit(1L << i)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** Character-n-gram Jaccard near-dup within a blocking key (e.g. source):
    * all-pairs only inside blocks — use when a natural partition bounds
    * block size; otherwise prefer MinHash+LSH. */
  def ngramJaccardWithinBlocks(docs: DataFrame, idCol: String, textCol: String,
                               blockCol: String, n: Int, threshold: Double): DataFrame = {
    // Hash each shingle to a long (one native pass over the text) and sort
    // ONCE per row — the O(pairs) stage is then a codegen'd two-pointer
    // merge over 8-byte longs (`JaccardSorted`) instead of per-pair
    // hash-set builds over strings.
    val hashed = sort_array(array_distinct(
      graft.functions.VectorFunctions.charShingleHashes(col(textCol), n)))
    val sets = docs.select(col(blockCol), col(idCol), hashed.as("__sh"))
    // A shuffle on the block key alone would have only #blocks distinct
    // keys (parallelism collapse + skew). Broadcast the build side and
    // round-robin the probe side so the quadratic pair work spreads over
    // every core regardless of how few input splits or blocks there are.
    val probe = sets.repartition(sets.sparkSession.sparkContext.defaultParallelism)
    probe.as("a").join(broadcast(sets.as("b")),
        col(s"a.$blockCol") === col(s"b.$blockCol") && col(s"a.$idCol") < col(s"b.$idCol"))
      .withColumn("jaccard",
        graft.functions.VectorFunctions.jaccardSorted(col("a.__sh"), col("b.__sh")))
      .filter(col("jaccard") >= threshold)
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        round(col("jaccard"), 3).as("jaccard"))
  }

  /** Embedding cosine near-dup, exact all-pairs baseline. Quadratic — the
    * correctness reference for the LSH-bucketed variant in `Similarity`;
    * at scale, bucket first (`Similarity.hyperplaneBuckets`). */
  def embeddingNearDupExact(embs: DataFrame, idCol: String, vecCol: String,
                            threshold: Double): DataFrame = {
    // Precompute each vector's norm once, per row — the O(pairs) stage then
    // does a single dot product per pair instead of dot + two norms (3×
    // less arithmetic where it's quadratic). Same fp expression shape as
    // dot/(norm*norm), so results match the cosine oracle.
    val e = embs.select(col(idCol), col(vecCol).cast("array<double>").as("__e"))
      .withColumn("__n", Similarity.norm(col("__e")))
    // spread the probe side over all cores — a small parquet input is one
    // split, which would serialize the whole O(n²) stage onto one task
    val probe = e.repartition(e.sparkSession.sparkContext.defaultParallelism)
    probe.as("a").join(broadcast(e.as("b")), col(s"a.$idCol") < col(s"b.$idCol"))
      .withColumn("cos", Similarity.dot(col("a.__e"), col("b.__e")) / (col("a.__n") * col("b.__n")))
      .filter(col("cos") >= threshold)
      .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
        round(col("cos"), 6).as("cos"))
  }
}
