package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Program-document (v6) coverage audit over the PUBLIC operator surface:
 * every public method on the user-facing API objects/classes must be
 * classified as either
 *
 *   - `node("<op>")` — lowered by that v6 program-document node (the op
 *     name is verified to exist in Program.scala's serializer), or
 *   - `excluded("<reason>")` — a documented exclusion (building block of
 *     a node's lowering, driver-side artifact/schema helper, constant,
 *     diagnostic output, or a Scala-lambda face that is by design not
 *     artifact-serializable).
 *
 * The surfaces are enumerated by reflection, so ADDING a public method
 * without classifying it here FAILS this spec — program-document coverage
 * cannot silently rot. Classifying is cheap; the point is that the choice
 * is recorded and reviewed, mirroring the reference's stance that every
 * stream operation serializes into the ApplicationInstance artifact
 * (milan-lang `ApplicationInstance`/`StreamGraph`).
 */
class ProgramNodeCoverageSpec extends AnyFunSuite {

  private sealed trait Status
  private final case class Node(op: String) extends Status
  private final case class Excluded(reason: String) extends Status
  private def node(op: String): Status = Node(op)
  private def excluded(reason: String): Status = Excluded(reason)

  // case-class / object boilerplate that is not operator surface
  private val boilerplate = Set(
    "copy", "productArity", "productPrefix", "productElement",
    "productIterator", "productElementName", "productElementNames",
    "canEqual", "equals", "hashCode", "toString", "apply", "unapply",
    "andThen", "compose", "curried", "tupled", "writeReplace")

  private def publicMethods(className: String): Set[String] = {
    val cls = Class.forName(className)
    cls.getDeclaredMethods.toSeq
      .filter(m => java.lang.reflect.Modifier.isPublic(m.getModifiers))
      .filterNot(m => m.isSynthetic || m.isBridge)
      .map(_.getName)
      .filterNot(_.contains("$"))
      .filterNot(boilerplate)
      .toSet
  }

  private lazy val programSource = {
    val src = java.nio.file.Paths.get("src/main/scala/graft/api/Program.scala")
    new String(java.nio.file.Files.readAllBytes(src), "UTF-8")
  }

  private def check(className: String, classified: Map[String, Status]): Unit = {
    val actual = publicMethods(className)
    val missing = actual -- classified.keySet
    assert(missing.isEmpty,
      s"$className: unclassified public methods ${missing.toSeq.sorted} — " +
        "map each to a v6 node or a documented exclusion in ProgramNodeCoverageSpec")
    val stale = classified.keySet -- actual
    assert(stale.isEmpty,
      s"$className: classified methods no longer on the surface ${stale.toSeq.sorted}")
    classified.collect { case (m, Node(op)) =>
      assert(programSource.contains(s""""op" -> "$op""""),
        s"$className.$m claims node '$op' but Program.scala serializes no such op")
    }
  }

  // ---- shared exclusion reasons -------------------------------------
  private val block = "building block of a node's lowering (not user-entry)"
  private val artifact = "driver-side trainer/artifact or schema helper — programs consume the artifact, they don't train it"
  private val const = "constant / regex / type definition, not an operation"
  private val diag = "pair-level or ranked diagnostic output (analysis table, not a stream-shaped transform)"
  private val lambda = "takes an arbitrary Scala lambda — program documents carry SQL expressions only (reference parity: Milan serializes expression TREES, not closures); the SQL-expressible face has its own node"
  private val accessor = "accessor / metadata, not an operation"

  test("MStream surface: node or documented exclusion") {
    check("graft.api.MStream", Map(
      "map" -> node("map"), "where" -> node("where"),
      "addFields" -> node("addFields"), "toField" -> node("toField"),
      "orderedBy" -> node("orderBy"), "union" -> node("union"),
      "distinct" -> node("distinct"), "uniqueBy" -> node("uniqueBy"),
      "dedupBy" -> node("dedupBy"), "withWatermark" -> node("watermark"),
      "groupBy" -> node("groupSelect"),
      "tumblingWindow" -> node("windowSelect"),
      "slidingWindow" -> node("windowSelect"),
      "tumblingWindowExact" -> node("windowSelect"),
      "slidingWindowExact" -> node("windowSelect"),
      "leftJoin" -> node("join"), "fullJoin" -> node("join"),
      "leftInnerJoin" -> node("join"), "asofJoin" -> node("asof"),
      "last" -> node("scan"), "sumBy" -> node("scan"),
      "meanBy" -> node("scan"), "productBy" -> node("scan"),
      "countBy" -> node("scan"), "maxBy" -> node("scan"),
      "minBy" -> node("scan"),
      "scanRows" -> excluded(lambda), "reduceRows" -> excluded(lambda),
      "mapTyped" -> excluded(lambda), "flatMapTyped" -> excluded(lambda),
      "leftJoinWindow" -> excluded("stream x record-window join — " +
        "documented exclusion: windowed-join programs are built from the " +
        "join + recordWindow nodes; the fused builder is a convenience face"),
      "except" -> excluded("auxiliary set op beyond the Milan surface; " +
        "program face is where + left-anti via join"),
      "intersect" -> excluded("auxiliary set op beyond the Milan surface"),
      "lift" -> excluded(accessor), "df" -> excluded(accessor),
      "name" -> excluded(accessor), "withName" -> excluded(accessor),
      "eventOrder" -> excluded(accessor), "contextKeys" -> excluded(accessor)))
  }

  test("GroupedMStream / window surfaces: node or documented exclusion") {
    check("graft.api.GroupedMStream", Map(
      "select" -> node("groupSelect"),
      "tumblingWindow" -> node("windowSelect"),
      "slidingWindowExact" -> node("windowSelect"),
      "tumblingWindowExact" -> node("windowSelect"),
      "sessionWindow" -> node("sessionSelect"),
      "recordWindow" -> node("recordWindow"),
      "last" -> node("scan"), "sumBy" -> node("scan"),
      "meanBy" -> node("scan"), "productBy" -> node("scan"),
      "countBy" -> node("scan"), "maxBy" -> node("scan"),
      "minBy" -> node("scan"),
      "scanRows" -> excluded(lambda), "reduceRows" -> excluded(lambda),
      "mapStreams" -> excluded(lambda), "flatMap" -> excluded(lambda),
      "keys" -> excluded(accessor), "stream" -> excluded(accessor)))
    check("graft.api.TimeWindowedMStream", Map(
      "select" -> node("windowSelect"),
      "applyRows" -> excluded(lambda),
      "stream" -> excluded(accessor)))
  }

  test("Dedup surface: node or documented exclusion") {
    check("graft.pipeline.Dedup$", Map(
      "exactDedupAgainstCorpus" -> node("exactDedup"),
      "dedupAgainstCorpus" -> node("corpusDedup"),
      "embeddingDedupAgainstCorpus" -> node("embedDedup"),
      "embeddingDedupAgainstCorpusIvf" -> node("embedDedup"),
      "deduplicateCorpus" -> node("dedupCorpus"),
      "deduplicateCorpusKeepBest" -> node("dedupCorpusBest"),
      "semanticDedup" -> node("semanticDedup"),
      "semanticDedupKeepBest" -> node("semanticDedupBest"),
      "scrubDuplicateLines" -> node("lineScrub"),
      "scrubDuplicateParagraphs" -> node("paraScrub"),
      "scrubRepeatedSpans" -> node("spanScrub"),
      "semanticDedupAuto" -> excluded("auto-sizing convenience over the " +
        "semanticDedup node (k = Ivf.cellsFor); programs pin k explicitly " +
        "for reproducibility"),
      "scrubKnownSpans" -> excluded("known-corpus variant of the spanScrub " +
        "node parameterized by a side table; documented exclusion — the " +
        "program face needs named side-table inputs beyond the v6 source list"),
      "exact" -> excluded("in-corpus exact dedup: program-expressible as " +
        "mapCols(hash) + uniqueBy; the dedicated node is the ingest face " +
        "(exactDedup)"),
      "ingestNearDup" -> excluded("streaming App-level banded ingest stage; " +
        "batch program face is the corpusDedup node"),
      "connectedComponents" -> excluded(block),
      "crossCorpusNearDup" -> excluded(block),
      "lshCandidates" -> excluded(block),
      "minhashSignature" -> excluded(block),
      "minhashNearDup" -> excluded(diag),
      "simhash" -> excluded(block), "simhashShingles" -> excluded(block),
      "simhashPairs" -> excluded(block), "simhashNearDup" -> excluded(diag),
      "ngramJaccardWithinBlocks" -> excluded(diag),
      "containmentNearDup" -> excluded(diag),
      "editDistanceNearDup" -> excluded(diag),
      "hyperplaneNearDup" -> excluded(diag),
      "embeddingNearDupExact" -> excluded(diag),
      "repeatedSpans" -> excluded(block),
      "maximalRepeats" -> node("exactSubstr"),
      "semanticPairs" -> excluded(block),
      "saltedSelfJoin" -> excluded(block),
      "saltedCrossJoin" -> excluded(block),
      "capConf" -> excluded("internal conf parser (hot-key cover caps; " +
        "0 = explicit plain-join escape)"),
      "longConf" -> excluded("internal conf parser shared with Similarity " +
        "(named-error contract for graft.* caps); not an operator"),
      "lastCcRounds" -> excluded("convergence metric accessor (diagnostics)"),
      "BandedStateVersion" -> excluded(const),
      "requireBandedStateVersion" -> excluded("state-format guard (diagnostics)")))
  }

  test("TextOps surface: node or documented exclusion") {
    check("graft.pipeline.TextOps$", Map(
      "spreadForCompute" -> excluded("package-private (public only at " +
        "bytecode level) compute-parallelism floor for per-row-heavy " +
        "stages — plan plumbing, not operator surface (OPTIMIZATION_r17)"),
      "normalizeText" -> node("normalize"),
      "qualityFeatures" -> node("quality"),
      "repetitionFeatures" -> node("repetition"),
      "gopherGate" -> node("gopherGate"),
      "langId" -> node("langId"),
      "stripMarkup" -> node("stripMarkup"),
      "scrubPii" -> node("piiScrub"),
      "chunkTokens" -> node("chunkTokens"),
      "packChunks" -> node("packChunks"),
      "winnowFingerprints" -> node("winnow"),
      "lmScoreAgainst" -> node("lmScore"),
      "trigramLmScore" -> node("lm3Score"),
      "dsirScore" -> node("dsirScore"),
      "nbClassifyAgainst" -> node("nbClassify"),
      "tokenFrequencyStats" -> node("tokenFreq"),
      "bpeTokenizeIngest" -> node("bpeEncode"),
      "encodeTokensIngest" -> node("encodeIngest"),
      "decontaminateIngest" -> node("decontaminateIngest"),
      "bpeTokenize" -> excluded("batch face of the bpeEncode node"),
      "encodeTokens" -> excluded("batch face of the encodeIngest node"),
      "decontaminate" -> excluded("batch face of the decontaminateIngest node"),
      "domainsOf" -> excluded(block),
      "canonicalUrl" -> excluded(block),
      "bigramLmScore" -> excluded(block),
      "gopherRules" -> excluded(block),
      "markerHits" -> excluded(block), "ngramCounts" -> excluded(block),
      "jaccard" -> excluded(block), "polyHash" -> excluded(block),
      "words" -> excluded(block), "wordShingles" -> excluded(block),
      "chars" -> excluded(block), "charShingles" -> excluded(block),
      "buildVocab" -> excluded(artifact),
      "trainBpeMerges" -> excluded(artifact),
      "trainByteBpeMerges" -> excluded(artifact),
      "trainBpeMergesByLang" -> excluded(artifact),
      "bpeTokenizeByLang" -> node("bpeLangEncode"),
      "byteBpeTokenize" -> node("byteBpeEncode"),
      "byteBpeEncodeIds" -> node("byteBpeIds"),
      "byteBpeEncodeIdsImported" -> node("byteBpeIdsVocab"),
      "byteBpeExportVocabJson" -> excluded(artifact),
      "byteBpeImportVocabJson" -> excluded(artifact),
      "byteBpeOutputSchema" -> excluded(artifact),
      "Gpt2PreTokenPattern" -> excluded(const),
      "gpt2PreTokens" -> excluded(block),
      "gpt2Bytes" -> excluded(block),
      "bpeExportMerges" -> excluded(artifact),
      "bpeImportMerges" -> excluded(artifact),
      "BpeS" -> excluded(const), "BpeE" -> excluded(const),
      "bpeOutputSchema" -> excluded(artifact),
      "dsirOutputSchema" -> excluded(artifact),
      "lmScoreOutputSchema" -> excluded(artifact),
      "lm3ScoreOutputSchema" -> excluded(artifact),
      "nbOutputSchema" -> excluded(artifact),
      "tokenFreqOutputSchema" -> excluded(artifact),
      "fingerprint" -> excluded("single-projection op (rolling-hash " +
        "fingerprint); program face is mapCols/applyFn"),
      "tokenCountRegex" -> excluded("single-projection op; program face is " +
        "mapCols/applyFn (quality node carries the token counts)"),
      "tokenCountWhitespace" -> excluded("single-projection op; program " +
        "face is mapCols/applyFn"),
      "perplexityBuckets" -> excluded("derived bucketing over the lmScore " +
        "node's output column (mapCols on lm_score)"),
      "perplexityBucketsAgainst" -> excluded("derived bucketing over the " +
        "knAgainst node's score column; the corpus-wide tile layout is " +
        "an analysis/selection output like perplexityBuckets"),
      "heavyHitters" -> excluded("sketch aggregate (CountMin) — " +
        "metrics/analysis output, not a stream transform"),
      "topNgrams" -> excluded(diag), "tfidfTopWord" -> excluded(diag),
      "bm25TopK" -> excluded(diag),
      "bm25Retrieve" -> node("bm25Retrieve"),
      "hybridRrfRetrieve" -> node("hybridRrf"),
      "winnowOverlapPairs" -> node("winnowPairs"),
      "ngramLmScore" -> node("lmnScore"),
      "ngramLmScoreAgainst" -> node("lmnAgainst"),
      "knModel" -> excluded(block), "gramCols" -> excluded(block),
      "gramsOf" -> excluded(block), "againstApply" -> excluded(block),
      "byLangApply" -> excluded(block),
      "mknDiscountsFor" -> excluded(block),
      "mknLangDiscounts" -> excluded(block),
      "knModelBuilds" -> excluded(diag),
      "Utf8Ordering" -> excluded(const),
      "bpeEncodeIds" -> node("bpeIds"),
      "checkMknParams" -> excluded(block),
      "ngramLmScoreAgainstByLang" -> node("lmAgainstLang"),
      "lm3ScoreAgainst" -> node("lm3Against"),
      "knLmScore" -> node("knScore"),
      "chunkSentences" -> node("chunkSentences"),
      "chunkSentencesIngest" -> node("chunkSentences"),
      "sentencesOf" -> excluded("single-projection op (sentence array); " +
        "program face is the chunkSentences node or mapCols"),
      "knLmScoreAgainst" -> node("knAgainst"),
      "knLmScoreAgainstByLang" -> node("knAgainstLang"),
      "mknLmScoreAgainstByLang" -> node("mknAgainstLang"),
      "mknLmScore" -> node("mknScore"),
      "mknLmScoreAgainst" -> node("mknAgainst"),
      "perplexityBucketThresholds" -> node("pplThresholds"),
      "bucketByThresholds" -> node("bucketApply"),
      "bucketByRank" -> node("rankBuckets"),
      "lambdasFor" -> excluded(block),
      "awaitPinned" -> excluded(block),
      "mknDerive" -> excluded(block),
      "MknFallback" -> excluded(const),
      "closedFormNtile" -> excluded(block),
      "ngramOutputSchema" -> excluded(artifact),
      "bm25RetrieveOutputSchema" -> excluded(artifact),
      "hybridRrfOutputSchema" -> excluded(artifact),
      "winnowPairsOutputSchema" -> excluded(artifact),
      "EmailRe" -> excluded(const), "IpRe" -> excluded(const),
      "UrlRe" -> excluded(const), "LangMarkers" -> excluded(const),
      "P" -> excluded(const), "Stopwords" -> excluded(const)))
  }

  test("Sampling / Similarity / ANN / layout surfaces: node or documented exclusion") {
    check("graft.pipeline.Sampling$", Map(
      "hashSample" -> node("hashSample"),
      "stratifiedHashSample" -> node("stratifiedSample"),
      "assignSplit" -> node("assignSplit"),
      "leakageSafeSplit" -> node("safeSplit"),
      "weightedMix" -> node("weightedMix"),
      "temperatureMix" -> node("temperatureMix"),
      "capPerKey" -> node("capPerKey"),
      "capTokensPerKey" -> node("capTokens"),
      "exactKSample" -> node("exactK"),
      "exactKPerKey" -> node("exactKStrata"),
      "strataLookup" -> excluded(block),
      "LiteralStrataEntries" -> excluded(const),
      "MaxStrata" -> excluded(const)))
    check("graft.pipeline.Similarity$", Map(
      "randomProject" -> node("jlProject"),
      "bruteForceTopK" -> excluded("exact ANN baseline — search/analysis " +
        "output; the ingest-shaped face is the ivfProbe node"),
      "bruteForceTopKPartial" -> excluded(block),
      "bucketedNearDup" -> excluded(block),
      "hyperplaneBuckets" -> excluded(block),
      "embeddingStats" -> excluded(diag),
      "cosine" -> excluded(block), "dot" -> excluded(block),
      "norm" -> excluded(block)))
    check("graft.pipeline.Ivf$", Map(
      "searchIngest" -> node("ivfProbe"),
      "search" -> excluded("batch face of the ivfProbe node"),
      "train" -> excluded(artifact), "cellsFor" -> excluded(artifact),
      "collectCodebook" -> excluded(artifact),
      "searchOutputSchema" -> excluded(artifact),
      "assign" -> excluded(block),
      "nearestCid" -> excluded(block), "nearestCidLiteral" -> excluded(block),
      "nearestCidLoop" -> excluded(block), "probeCids" -> excluded(block),
      "probeCidsLiteral" -> excluded(block),
      "LiteralCells" -> excluded(const)))
    check("graft.pipeline.Pq$", Map(
      "ivfAdcIngest" -> excluded("streaming App-level ANN ingest (PQ-ADC); " +
        "documented exclusion — programs use the ivfProbe node, PQ " +
        "compression is an index-build concern"),
      "adcTopK" -> excluded(diag), "adcTopKCoded" -> excluded(diag),
      "ivfAdcTopK" -> excluded(diag),
      "encode" -> excluded(block),
      "train" -> excluded(artifact), "collectBooks" -> excluded(artifact),
      "LiteralLutEntries" -> excluded(const)))
    check("graft.pipeline.Sq$", Map(
      "sq8Encode" -> node("sq8Encode"),
      "sq8Train" -> excluded(artifact), "collectStats" -> excluded(artifact),
      "sq8Decode" -> excluded(block),
      "MaxDims" -> excluded(const)))
    check("graft.pipeline.Multimodal$", Map(
      "withFakeMedia" -> excluded("test-data synthesizer"),
      "synthesizeImages" -> excluded("deterministic oracle-payload " +
        "synthesizer (q_decode_image); test-data generator, not a " +
        "pipeline operator"),
      "synthesizeAudio" -> excluded("deterministic oracle-payload " +
        "synthesizer (q_decode_audio); test-data generator, not a " +
        "pipeline operator"),
      "synthesizeVideos" -> excluded("deterministic oracle-payload " +
        "synthesizer (q_decode_video); test-data generator, not a " +
        "pipeline operator"),
      "byteFeatures" -> excluded("multimodal feature projection; program " +
        "face is mapCols over the binary column (documented exclusion: no " +
        "codec libraries ship in this environment)"),
      "decodeBatched" -> excluded("partition-batched codec slot (stub body " +
        "by environment); not artifact-serializable — the codec is a " +
        "deployment concern, like Milan's UDF escape"),
      "decodeImageBatched" -> excluded("partition-batched JDK image codec; " +
        "same deployment-concern exclusion as decodeBatched"),
      "decodeAudioBatched" -> excluded("partition-batched JDK audio codec; " +
        "same deployment-concern exclusion as decodeBatched"),
      "decodeVideoBatched" -> excluded("partition-batched JDK multi-frame " +
        "codec; same deployment-concern exclusion as decodeBatched"),
      "resizeStub" -> excluded("codec-slot stage, same exclusion"),
      "resizeImageBatched" -> excluded("partition-batched JDK image " +
        "resize; same deployment-concern exclusion as decodeBatched"),
      "resampleAudioBatched" -> excluded("partition-batched JDK audio " +
        "resample; same deployment-concern exclusion as decodeBatched"),
      "explodeFramesBatched" -> excluded("partition-batched JDK frame " +
        "extraction; same deployment-concern exclusion as decodeBatched"),
      "sampleGif" -> excluded(block),
      "frameSample" -> excluded("binary slicing projection; program face " +
        "is mapCols (substring on binary)"),
      "MediaMetaType" -> excluded(const)))
    check("graft.pipeline.Unigram$", Map(
      "trainVocab" -> excluded(artifact),
      "tokenize" -> node("unigramEncode"),
      "encodeIds" -> node("unigramIds"),
      "exportVocab" -> excluded(artifact),
      "importVocab" -> excluded(artifact),
      "tokenizeImported" -> node("spTokenize"),
      "encodeIdsImported" -> node("spIds"),
      "segmentExpr" -> excluded(block)))
    check("graft.pipeline.WordPiece$", Map(
      "trainVocab" -> excluded(artifact),
      "tokenize" -> node("wpTokenize"),
      "encode" -> node("wpEncode"),
      "encodeIds" -> node("wpIds"),
      "exportVocab" -> excluded(artifact),
      "importVocab" -> excluded(artifact),
      "mergedSym" -> excluded(block),
      "segmentExpr" -> excluded(block)))
    check("graft.pipeline.Arpa$", Map(
      "arpaExportKn" -> excluded(artifact),
      "arpaExportKnByLang" -> excluded(artifact),
      "arpaExportMknByLang" -> excluded(artifact),
      "arpaExportMkn" -> excluded(artifact),
      "arpaImport" -> excluded(artifact),
      "arpaImportDir" -> excluded(artifact),
      "fileNameOf" -> excluded(block),
      "langOfFileName" -> excluded(block),
      "arpaScoreAgainst" -> node("arpaScore"),
      "arpaScoreAgainstByLang" -> node("arpaScoreLang")))
    check("graft.operators.GroupTopK$", Map(
      "topKPerKey" -> node("topkPerKey"),
      "requireIntegralId" -> excluded(block)))
    check("graft.operators.Layout$", Map(
      "zorderBy" -> node("zorder"),
      "zkey" -> excluded(block), "interleave" -> excluded(block),
      "bucketOf" -> excluded(block), "checkDims" -> excluded(block)))
    check("graft.operators.Skew$", Map(
      "saltedAgg" -> excluded("physical-plan (salting) variant of the " +
        "groupSelect node — the program face IS groupSelect; skew salting " +
        "is an execution-strategy concern, not program semantics")))
  }
}
