package graft

import org.apache.spark.sql.functions._
import graft.api.MStream
import graft.pipeline.Unigram

/** Unigram-LM tokenizer (Kudo 2018, hard-EM Viterbi variant): the
  * segmentation expression against a plain-Scala reference DP AND an
  * exhaustive optimality check, the trainer against a full plain-Scala
  * reimplementation of seed → EM rounds → prune, streaming == batch
  * tokenize, and the contracts. */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  // ---- plain-Scala reference implementation ------------------------

  private def refSegment(w: String, probs: Map[String, Double], L: Int): Seq[String] = {
    val n = w.length
    val dp = new Array[Double](n + 1)
    val bl = new Array[Int](n + 1)
    dp(0) = 1.0
    for (i <- 1 to n) {
      var bestS = -1.0; var bestL = 0
      for (l <- 1 to math.min(L, i)) {
        val piece = w.substring(i - l, i)
        val p = probs.getOrElse(piece, if (l == 1) 1e-100 else 0.0)
        val cand = dp(i - l) * p
        if (cand >= bestS) { bestS = cand; bestL = l }
      }
      dp(i) = bestS; bl(i) = bestL
    }
    var pos = n
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (pos > 0) { out += w.substring(pos - bl(pos), pos); pos -= bl(pos) }
    out.reverse.toSeq
  }

  private def probsOf(v: Seq[(String, Long)]): Map[String, Double] = {
    val t = v.map(_._2).sum.toDouble
    v.map { case (p, c) => p -> (c.toDouble / t) }.toMap
  }

  private def refTrain(words: Seq[(String, Long)], vocabSize: Int, L: Int,
                       rounds: Int, seedSize: Int): Seq[(String, Long)] = {
    val cand = scala.collection.mutable.Map.empty[String, Long]
    for ((w, wc) <- words; i <- 0 until w.length;
         l <- 1 to math.min(L, w.length - i))
      cand.updateWith(w.substring(i, i + l))(o => Some(o.getOrElse(0L) + wc))
    val top = cand.toSeq.sortBy { case (p, c) => (-c, p) }.take(seedSize)
    val chars = cand.toSeq.filter(_._1.length == 1)
    var vocab = (top ++ chars).distinct.sortBy { case (p, c) => (-c, p) }
    for (_ <- 1 to rounds) {
      val probs = probsOf(vocab)
      val counts = scala.collection.mutable.Map.empty[String, Long]
      for ((w, wc) <- words; piece <- refSegment(w, probs, L))
        counts.updateWith(piece)(o => Some(o.getOrElse(0L) + wc))
      val topV = counts.toSeq.sortBy { case (p, c) => (-c, p) }.take(vocabSize)
      val keptChars = vocab.collect { case (p, _) if p.length == 1 =>
        p -> math.max(counts.getOrElse(p, 0L), 1L) }
      vocab = (topV ++ keptChars).groupBy(_._1)
        .map { case (p, xs) => p -> xs.map(_._2).max }
        .toSeq.sortBy { case (p, c) => (-c, p) }
    }
    vocab
  }

  // ---- corpora ------------------------------------------------------

  private val rnd = new scala.util.Random(31)
  private val syllables = Vector("ka", "to", "mi", "ra", "su", "ne", "lo", "ch", "qu")
  private def randWord(): String =
    Seq.fill(1 + rnd.nextInt(4))(syllables(rnd.nextInt(syllables.size))).mkString
  private val corpus = (0L until 60L)
    .map(i => (i, Seq.fill(3 + rnd.nextInt(8))(randWord()).mkString(" ")))

  test("segmentation expression == reference DP and is score-optimal") {
    val words = corpus.flatMap(_._2.split(" ")).distinct.take(40)
    val vocab: Seq[(String, Long)] = {
      val cand = scala.collection.mutable.Map.empty[String, Long]
      for (w <- words; i <- 0 until w.length; l <- 1 to math.min(3, w.length - i))
        cand.updateWith(w.substring(i, i + l))(o => Some(o.getOrElse(0L) + 1L))
      cand.toSeq.sortBy { case (p, c) => (-c, p) }.take(50) ++
        cand.toSeq.filter(_._1.length == 1)
    }.distinct
    val probs = probsOf(vocab)
    val got = words.toDF("w")
      .select(col("w"), Unigram.segmentExpr(col("w"), probs, 3).as("ps"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    words.foreach { w =>
      val ref = refSegment(w, probs, 3)
      assert(got(w) == ref, s"word '$w': ${got(w)} vs reference $ref")
      assert(got(w).mkString == w, s"pieces must rebuild the word '$w'")
      // exhaustive optimality: the chosen segmentation maximizes the
      // product over ALL segmentations with pieces <= 3 chars
      def all(s: String): Seq[Seq[String]] =
        if (s.isEmpty) Seq(Nil)
        else (1 to math.min(3, s.length)).flatMap(l =>
          all(s.drop(l)).map(s.take(l) +: _))
      def score(ps: Seq[String]): Double =
        ps.map(p => probs.getOrElse(p, if (p.length == 1) 1e-100 else 0.0)).product
      val bestScore = all(w).map(score).max
      assert(score(got(w)) == bestScore,
        s"word '$w': chosen ${got(w)} scores ${score(got(w))} < $bestScore")
    }
  }

  test("trainVocab == the plain-Scala reference training, all chars kept") {
    val docs = corpus.toDF("doc_id", "text")
    try {
      val got = Unigram.trainVocab(docs, "text", vocabSize = 30,
          maxPieceLen = 3, emRounds = 2, seedSize = 40)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      val wordCounts = corpus.flatMap(_._2.split(" ").filter(_.nonEmpty))
        .groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }.toSeq
      val want = refTrain(wordCounts, 30, 3, 2, 40).toSet
      assert(got == want, s"vocab:\n${got.toSeq.sorted}\nvs reference\n${want.toSeq.sorted}")
      val charsInCorpus = corpus.flatMap(_._2.replace(" ", "")).toSet
      assert(charsInCorpus.forall(c => got.exists(_._1 == c.toString)),
        "every corpus character survives pruning")
    } finally graft.api.Pinned.release(spark)
  }

  test("tokenize: streaming == batch, zero state, pieces rebuild text") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val docs = corpus.take(20).toDF("doc_id", "text")
    try {
      val vocab = Unigram.trainVocab(docs, "text", vocabSize = 25,
        maxPieceLen = 3, emRounds = 1, seedSize = 40)
      val batch = Unigram.tokenize(MStream(docs), vocab, "text", maxPieceLen = 3).df
        .select(col("doc_id"), col("pieces"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      // pieces rebuild the concatenated words
      corpus.take(20).foreach { case (id, text) =>
        assert(batch(id).mkString == text.split(" ").filter(_.nonEmpty).mkString,
          s"doc $id pieces rebuild its words")
      }
      val in = MemoryStream[(Long, String)]
      val out = Unigram.tokenize(MStream(in.toDF().toDF("doc_id", "text")),
        vocab, "text", maxPieceLen = 3)
      assert(out.df.isStreaming)
      in.addData(corpus.take(20): _*)
      val name = s"uni_${System.nanoTime()}"
      val q = out.df.writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Append()).start()
      try {
        q.processAllAvailable()
        assert(q.lastProgress == null ||
          q.lastProgress.stateOperators.forall(_.numRowsTotal == 0L),
          "tokenize is stateless")
        val streamed = spark.table(name).select(col("doc_id"), col("pieces"))
          .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
        assert(streamed == batch, "streaming equals batch")
      } finally q.stop()
    } finally graft.api.Pinned.release(spark)
  }

  test("UnigramEncode node: v10 stamp, codec identity, document run == direct API") {
    import graft.api.{App, Program}
    import graft.api.Program._
    val d = Doc(Seq(External("in"), External("v"),
      UnigramEncode("a", "in", "v", "text", 3, "pieces")), Seq("a"))
    val json = Program.toJson(d)
    assert(json.contains("\"version\":10") && Program.fromJson(json) == d)
    val bad = intercept[IllegalArgumentException](Program.fromJson(Program.toJson(
      Doc(Seq(External("in"), External("v"),
        UnigramEncode("a", "in", "v", "text", 0)), Seq("a")))))
    assert(bad.getMessage.contains("maxPieceLen"), bad.getMessage)
    try {
      val docs = corpus.take(15).toDF("doc_id", "text")
      val vocab = Unigram.trainVocab(docs, "text", 25, maxPieceLen = 3,
        emRounds = 1, seedSize = 40)
      val cap = Program.capture(
        Program.Rec.external("in", MStream(docs))
          .unigramTokenize(Program.Rec.external("v", MStream(vocab)),
            "text", maxPieceLen = 3).as("a"))
      assert(Program.fromJson(Program.toJson(cap)) == cap)
      val config = new App.Config()
        .setSource("in", App.Source("list", rows = Some(docs)))
        .setSource("v", App.Source("list", rows = Some(vocab)))
        .addSink("a", App.Sink("memory"))
      Program.validate(cap, spark, config)
      val out = App.runProgram(spark, config, Program.toJson(cap))
        .collectFirst { case App.BatchOutput("a", o) => o }.get
        .collect().map(r => r.getLong(0) -> r.getSeq[String](2)).toMap
      val direct = Unigram.tokenize(MStream(docs), vocab, "text", maxPieceLen = 3)
        .df.collect().map(r => r.getLong(0) -> r.getSeq[String](2)).toMap
      assert(out == direct, "document execution equals the direct API")
    } finally graft.api.Pinned.release(spark)
  }

  test("encodeIds: ids are (cnt desc, piece) ranks, OOV takes oovId, node round-trips") {
    import graft.api.Program
    import graft.api.Program._
    try {
      val docs = corpus.take(15).toDF("doc_id", "text")
      val vocab = Unigram.trainVocab(docs, "text", 25, maxPieceLen = 3,
        emRounds = 1, seedSize = 40)
      val ranked = vocab.collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy { case (p, c) => (-c, p) }.zipWithIndex
        .map { case ((p, _), i) => p -> i.toLong }.toMap
      val pieces = Unigram.tokenize(MStream(docs), vocab, "text", maxPieceLen = 3)
        .df.select(col("doc_id"), col("pieces"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val got = Unigram.encodeIds(MStream(docs), vocab, "text", maxPieceLen = 3)
        .df.select(col("doc_id"), col("ids"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      got.foreach { case (id, ids) =>
        val want = pieces(id).map(p => ranked.getOrElse(p, -1L))
        assert(ids == want, s"doc $id: $ids vs rank-mapped $want")
      }
      // a doc with a char outside the training corpus: OOV id
      val oov = Unigram.encodeIds(MStream(Seq((999L, "zzz")).toDF("doc_id", "text")),
          vocab, "text", maxPieceLen = 3, oovId = -7L)
        .df.select(col("ids")).collect().head.getSeq[Long](0)
      assert(oov.forall(_ == -7L), s"unknown chars take oovId: $oov")
      // node codec + document run == direct API
      val d = Doc(Seq(External("in"), External("v"),
        UnigramIds("a", "in", "v", "text", 3, -1L, "ids")), Seq("a"))
      val json = Program.toJson(d)
      assert(json.contains("\"version\":10") && Program.fromJson(json) == d)
      val cap = Program.capture(
        Program.Rec.external("in", MStream(docs))
          .unigramEncodeIds(Program.Rec.external("v", MStream(vocab)),
            "text", maxPieceLen = 3).as("a"))
      assert(Program.fromJson(Program.toJson(cap)) == cap)
      val config = new graft.api.App.Config()
        .setSource("in", graft.api.App.Source("list", rows = Some(docs)))
        .setSource("v", graft.api.App.Source("list", rows = Some(vocab)))
        .addSink("a", graft.api.App.Sink("memory"))
      Program.validate(cap, spark, config)
      val out = graft.api.App.runProgram(spark, config, Program.toJson(cap))
        .collectFirst { case graft.api.App.BatchOutput("a", o) => o }.get
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](2)).toMap
      assert(out == got, "document execution equals the direct API")
    } finally graft.api.Pinned.release(spark)
  }

  test("SentencePiece .vocab export -> import round-trips pieces AND ids") {
    val docs = corpus.toDF("doc_id", "text")
    try {
      val vocab = Unigram.trainVocab(docs, "text", vocabSize = 30,
        maxPieceLen = 3, emRounds = 2, seedSize = 50)
      val path = java.nio.file.Files.createTempDirectory("sp_rt")
        .resolve("rt.vocab").toString
      Unigram.exportVocab(vocab, path)
      // the file is piece<TAB>score in (cnt desc, piece) order — the id order
      val lines = scala.io.Source.fromFile(path, "UTF-8").getLines().toVector
      assert(lines.nonEmpty && lines.forall(_.count(_ == '\t') == 1))
      val fileOrder = lines.map(_.split('\t')(0))
      val wantOrder = vocab.collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
        .sortBy { case (p, c) => (-c, p) }.map(_._1)
      assert(fileOrder == wantOrder, "line order = (cnt desc, piece) = the id order")
      val imported = Unigram.importVocab(spark, path)
      // pieces: imported (log-space) face == in-session (product) face
      val inPieces = Unigram.tokenize(MStream(docs), vocab, "text", maxPieceLen = 3)
        .df.select(col("doc_id"), col("pieces")).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val spPieces = Unigram.tokenizeImported(MStream(docs), imported, "text")
        .df.select(col("doc_id"), col("pieces")).collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(spPieces == inPieces,
        "log-space segmentation under the exported scores reproduces the " +
          "in-session product-space segmentation")
      // ids: sp_id (line number) == encodeIds rank by construction
      val inIds = Unigram.encodeIds(MStream(docs), vocab, "text", maxPieceLen = 3)
        .df.select(col("doc_id"), col("ids")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val spIds = Unigram.encodeIdsImported(MStream(docs), imported, "text")
        .df.select(col("doc_id"), col("ids")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(spIds == inIds)
    } finally graft.api.Pinned.release(spark)
  }

  test("foreign .vocab fixture: log-space back-off arithmetic by hand") {
    val path = java.nio.file.Files.createTempDirectory("sp_foreign")
      .resolve("foreign.vocab").toString
    // SentencePiece layout: piece<TAB>score (natural-log), line = id
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      "ab\t-0.5\na\t-1.0\nb\t-1.2\nc\t-3.0\naa\t-2.0\n".getBytes("UTF-8"))
    val imported = Unigram.importVocab(spark, path)
    assert(imported.collect().map(r => (r.getString(0), r.getLong(2))).toMap ==
      Map("ab" -> 0L, "a" -> 1L, "b" -> 2L, "c" -> 3L, "aa" -> 4L),
      "sp_id is the 0-based line number")
    val docs = Seq((1L, "abc"), (2L, "abq"), (3L, "aa"), (4L, "")).toDF("doc_id", "text")
    val got = Unigram.encodeIdsImported(MStream(docs), imported, "text")
      .df.select(col("doc_id"), col("ids")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // "abc": [ab c] = -3.5 beats [a b c] = -5.2 -> ids [0, 3]
    assert(got(1L) == Seq(0L, 3L))
    // "abq": q unknown -> [ab q] -> [0, oov]
    assert(got(2L) == Seq(0L, -1L))
    // "aa": [aa] = -2.0 TIES [a a] = -2.0 -> longer piece wins -> [4]
    assert(got(3L) == Seq(4L))
    assert(got(4L) == Seq())
    val pieces = Unigram.tokenizeImported(MStream(docs), imported, "text")
      .df.select(col("doc_id"), col("pieces")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(pieces(1L) == Seq("ab", "c") && pieces(2L) == Seq("ab", "q") &&
      pieces(3L) == Seq("aa"))
  }

  test("imported faces: streaming == batch (zero-shuffle projection)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("sp_stream")
      .resolve("s.vocab").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      "ab\t-0.5\na\t-1.0\nb\t-1.2\n".getBytes("UTF-8"))
    val imported = Unigram.importVocab(spark, path)
    val rows = Seq((1L, "ab a b"), (2L, "ba"), (3L, ""))
    val batch = Unigram.encodeIdsImported(
        MStream(rows.toDF("doc_id", "text")), imported, "text")
      .df.select(col("doc_id"), col("ids")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val in = MemoryStream[(Long, String)]
    val out = Unigram.encodeIdsImported(
      MStream(in.toDF().toDF("doc_id", "text")), imported, "text")
    assert(out.df.isStreaming)
    in.addData(rows: _*)
    val name = s"sp_${System.nanoTime()}"
    val q = out.df.select(col("doc_id"), col("ids")).writeStream
      .format("memory").queryName(name).outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      assert(q.lastProgress == null ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0L))
      assert(spark.table(name).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap == batch)
    } finally q.stop()
  }

  test("SpTokenize/SpIds nodes: v11 stamp, codec identity, document run") {
    import graft.api.Program
    import graft.api.Program._
    val path = java.nio.file.Files.createTempDirectory("sp_node")
      .resolve("n.vocab").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      "ab\t-0.5\na\t-1.0\nb\t-1.2\n".getBytes("UTF-8"))
    val d = Doc(Seq(External("in"),
      SpTokenize("p", "in", path, "text"),
      SpIds("a", "p", path, "text", as = "tok_ids")), Seq("a"))
    val json = Program.toJson(d)
    assert(json.contains("\"version\":11") && Program.fromJson(json) == d)
    val docs = Seq((1L, "ab b"), (2L, "")).toDF("doc_id", "text")
    try {
      val cap = Program.capture(
        Program.Rec.external("in", MStream(docs))
          .spEncodeIds(path, "text").as("a"))
      assert(Program.fromJson(Program.toJson(cap)) == cap)
      val config = new graft.api.App.Config()
        .setSource("in", graft.api.App.Source("list", rows = Some(docs)))
        .addSink("a", graft.api.App.Sink("memory"))
      Program.validate(cap, spark, config)
      val out = graft.api.App.runProgram(spark, config, Program.toJson(cap))
        .collectFirst { case graft.api.App.BatchOutput("a", o) => o }.get
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](2)).toMap
      assert(out == Map(1L -> Seq(0L, 2L), 2L -> Seq()))
    } finally graft.api.Pinned.release(spark)
  }

  test("importVocab contracts: malformed, duplicate, oversized pieces") {
    def write(name: String, content: String): String = {
      val p = java.nio.file.Files.createTempDirectory("sp_bad").resolve(name)
      java.nio.file.Files.write(p, content.getBytes("UTF-8"))
      p.toString
    }
    assert(intercept[IllegalArgumentException](Unigram.importVocab(spark,
      write("m.vocab", "nolp\n"))).getMessage.contains("malformed"))
    assert(intercept[IllegalArgumentException](Unigram.importVocab(spark,
      write("d.vocab", "a\t-1.0\na\t-2.0\n"))).getMessage.contains("twice"))
    val big = Unigram.importVocab(spark,
      write("l.vocab", "abcdefghijklmnopq\t-1.0\n")) // 17 code points
    assert(intercept[IllegalArgumentException](Unigram.tokenizeImported(
      MStream(Seq((1L, "x")).toDF("doc_id", "text")), big, "text"))
      .getMessage.contains("16"))
    assert(intercept[IllegalArgumentException](Unigram.importVocab(spark,
      write("e.vocab", ""))).getMessage.contains("1..65536"))
  }

  test("contracts: bounds, vocab shape, streaming trainer rejection") {
    val docs = corpus.take(5).toDF("doc_id", "text")
    assert(intercept[IllegalArgumentException](Unigram.trainVocab(
      docs, "text", vocabSize = 0)).getMessage.contains("vocabSize"))
    assert(intercept[IllegalArgumentException](Unigram.trainVocab(
      docs, "text", 10, maxPieceLen = 0)).getMessage.contains("maxPieceLen"))
    assert(intercept[IllegalArgumentException](Unigram.trainVocab(
      docs, "text", 10, emRounds = 0)).getMessage.contains("emRounds"))
    assert(intercept[IllegalArgumentException](Unigram.tokenize(
      MStream(docs), Seq(("a", 1L)).toDF("piece", "x"), "text"))
      .getMessage.contains("cnt"))
    graft.api.Pinned.release(spark)
  }
}
