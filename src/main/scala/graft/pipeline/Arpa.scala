package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * KenLM ARPA artifact interop — the last gap between "the CCNet shape"
 * and "drop-in for a CCNet deployment", whose pretrained model is a
 * KenLM ARPA file, not an in-session DataFrame.
 *
 * [[arpaExportKn]]/[[arpaExportMkn]] serialize the in-session Kneser-Ney
 * family model ([[TextOps.knModel]]'s count tables) to the standard ARPA
 * text format: for every n-gram entry the INTERPOLATED conditional
 * probability (log10), and for every sequence that contexts a higher
 * order its back-off weight log10 γ — exactly KenLM's interpolated-model
 * serialization, so the engine's left-join back-off scoring and standard
 * ARPA back-off scoring coincide:
 *
 *   score(w | h)  =  p(h·w)                      if h·w is an entry
 *                 =  γ(h) · score(w | h')        otherwise (γ = 1 when h
 *                                                is not an entry)
 *
 * equals the engine's "unseen context skips its level entirely" fold for
 * every case (entry present → the stored interpolated value IS the fold's
 * value; entry absent with live context → γ(h)·p_{j−1}, the fold's
 * discount-mass branch; dead context → the fold's level skip). Tokens
 * unseen in the model take the `<unk>` entry γ₁/(V+1) — the fold's
 * uniform floor. Entries carry no `<s>`/`</s>` marks: this engine's LM
 * semantics are document-windowed, not sentence-delimited (documented
 * deviation; the FORMAT is standard and KenLM-readable).
 *
 * [[arpaImport]] parses any ARPA text file (KenLM-trained included) into
 * per-order local tables, and [[arpaScoreAgainst]] scores a batch frame
 * or arriving stream against it with standard back-off semantics — so
 * `knAgainst`-style pipelines interoperate with models trained OUTSIDE
 * the engine.
 *
 * Scale posture: an ARPA file is THE model artifact — bounded by the
 * same pruning lever (`minCount`) that keeps the in-session model
 * broadcastable; export streams entries through `toLocalIterator`
 * (driver holds one partition at a time), import parses driver-side into
 * plan-local tables that BROADCAST into the scoring joins. The entry
 * count is capped by `graft.arpa.maxEntries` (default 20M) with a named
 * error — a model beyond that is not an artifact and should be pruned
 * harder, matching KenLM practice.
 */
object Arpa {

  /** Entry-count cap for export and import (conf `graft.arpa.maxEntries`). */
  private def maxEntries(spark: SparkSession): Long = {
    val key = "graft.arpa.maxEntries"
    val raw = spark.conf.getOption(key).getOrElse("20000000")
    val v = try raw.toLong catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"$key must be a positive long, got '$raw'")
    }
    require(v > 0, s"$key must be positive, got $v")
    v
  }

  /** An imported (or freshly exported) ARPA model: per-order tables with
    * suffix-aligned key columns __p{order-j+1}..__p{order}, a log10
    * probability __lp{j}, and (below the top order) a nullable log10
    * back-off __bo{j}; `unkLp10` is the `<unk>` entry's log10 prob. */
  final case class ArpaModel(order: Int, tables: Map[Int, DataFrame],
                             unkLp10: Option[Double]) {
    require(order >= 2 && order <= 8,
      s"ArpaModel order must be in [2, 8], got $order")
  }

  // ------------------------------------------------------------- export

  /** Export the fixed-discount interpolated-KN model of `refDocs` (the
    * [[TextOps.knLmScoreAgainst]] model at the same `order`/`discount`/
    * `minCount`) as an ARPA text file at `path` (a local filesystem
    * path). Round-trip guarantee: importing the file and scoring with
    * [[arpaScoreAgainst]] reproduces `knLmScoreAgainst`'s scores (same
    * reference, same levers) — ArpaSpec pins it at orders 3 and 5,
    * pruned and unpruned. */
  def arpaExportKn(refDocs: DataFrame, refTextCol: String, order: Int,
                   path: String, discount: Double = 0.75,
                   minCount: Long = 1L): Unit = {
    require(discount > 0 && discount < 1,
      s"discount must be in (0, 1), got $discount")
    exportModel(refDocs, refTextCol, order, path, minCount,
      ds => ((_: Int, _: Column) => lit(discount),
        (j: Int) => lit(discount) * col(s"__n1p$j"),
        (st: org.apache.spark.sql.Row) =>
          discount * st.getAs[Long]("__n1p1")),
      needDiscounts = false)
  }

  /** Export the MODIFIED-KN model (KenLM parity: count-bucketed D1/D2/D3+
    * per level, derived from each level's count-of-counts with
    * `--discount_fallback` semantics — [[TextOps.mknLmScoreAgainst]]'s
    * model) as an ARPA text file at `path`. */
  def arpaExportMkn(refDocs: DataFrame, refTextCol: String, order: Int,
                    path: String,
                    fallback: (Double, Double, Double) = TextOps.MknFallback,
                    minCount: Long = 1L): Unit = {
    TextOps.checkMknParams(order, Map.empty, fallback)
    exportModel(refDocs, refTextCol, order, path, minCount,
      ds => ((j: Int, c: Column) => {
        val (d1, d2, d3) = ds(j)
        when(c === 1L, lit(d1)).when(c === 2L, lit(d2)).otherwise(lit(d3))
      }, (j: Int) => {
        val (d1, d2, d3) = ds(j)
        lit(d1) * col(s"__nb1$j") + lit(d2) * col(s"__nb2$j") +
          lit(d3) * col(s"__nb3$j")
      }, (st: org.apache.spark.sql.Row) => {
        val (d1, d2, d3) = ds(1)
        d1 * st.getAs[Long]("__nb11") + d2 * st.getAs[Long]("__nb21") +
          d3 * st.getAs[Long]("__nb31")
      }), needDiscounts = true, fallback = fallback)
  }

  /** The shared export engine: build the KN-family tables, compute every
    * entry's interpolated probability via the SAME fold arithmetic the
    * scoring faces use, attach back-off weights to context entries, and
    * stream the sections to `path`. `mkDisc(ds)` returns the per-level
    * (discount-of-count, discount-mass-numerator) column builders. */
  private def exportModel(refDocs: DataFrame, refTextCol: String, order: Int,
                          path: String, minCount: Long,
                          mkDisc: Map[Int, (Double, Double, Double)] =>
                            ((Int, Column) => Column, Int => Column,
                             org.apache.spark.sql.Row => Double),
                          needDiscounts: Boolean,
                          fallback: (Double, Double, Double) = TextOps.MknFallback): Unit = {
    require(order >= 2 && order <= 8,
      s"arpaExport order must be in [2, 8], got $order")
    require(!refDocs.isStreaming,
      "arpaExport: the reference corpus must be a batch frame")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    val spark = refDocs.sparkSession
    // a private scope: the model tables pin for the export's own actions
    // (counts + section streams) and release on exit, leaving the
    // caller's registrations untouched
    graft.api.Pinned.scoped(spark) { scope =>
    val (rawN, ctxN, cont, ctxc, stats) =
      TextOps.knModel(refDocs, refTextCol, order, minCount)
    val st = stats.head()
    require(!st.isNullAt(0) && st.getAs[Double]("__t1") > 0,
      "arpaExport: the reference corpus yields an empty model " +
        "(needs at least one bigram)")
    val ds =
      if (needDiscounts) TextOps.mknDiscountsFor(order, rawN, cont, fallback)
      else Map.empty[Int, (Double, Double, Double)]
    val (disc, gnum, unkNum) = mkDisc(ds)

    def keys(j: Int): Seq[String] = TextOps.gramCols(order, j)
    def withStats(d: DataFrame): DataFrame =
      Seq("__t1", "__n1p1", "__nb11", "__nb21", "__nb31", "__v")
        .foldLeft(d)((x, c) => x.withColumn(c, lit(st.getAs[Any](c))))

    /** The interpolated probability of an entry whose TOP level is `top`
      * (raw counts when top == order, continuation counts below) — the
      * knLp/mknLp arithmetic without the final log, over LEFT-joined
      * count columns, so it is defined for context-only entries too. */
    def pFold(top: Int): Column = {
      val c1 = coalesce(col("__cc1"), lit(0L))
      var p: Column =
        greatest(c1.cast("double") - disc(1, c1), lit(0.0)) / col("__t1") +
          gnum(1) / col("__t1") * (lit(1.0) / (col("__v") + lit(1.0)))
      val innerTop = if (top == order) order - 1 else top
      for (j <- 2 to innerTop) {
        val cj = coalesce(col(s"__cc$j"), lit(0L))
        val hi =
          greatest(cj.cast("double") - disc(j, cj), lit(0.0)) / col(s"__ctot$j") +
            gnum(j) / col(s"__ctot$j") * p
        p = when(coalesce(col(s"__ctot$j"), lit(0L)) > 0, hi).otherwise(p)
      }
      if (top == order) {
        val cN = coalesce(col(s"__cr$order"), lit(0L))
        val hiN =
          greatest(cN.cast("double") - disc(order, cN), lit(0.0)) / col(s"__tot$order") +
            gnum(order) / col(s"__tot$order") * p
        p = when(coalesce(col(s"__tot$order"), lit(0L)) > 0, hiN).otherwise(p)
      }
      p
    }

    /** Context table of level j+1, its keys SHIFTED one position right so
      * they align with level-j entry names (__p{i} -> __p{i+1}). */
    def shiftedCtx(j: Int): DataFrame = {
      val (src, totCol) =
        if (j + 1 == order) (ctxN, s"__tot$order") else (ctxc(j + 1), s"__ctot${j + 1}")
      val srcKeys = keys(j + 1).dropRight(1)
      val carried = Seq(totCol, s"__n1p${j + 1}", s"__nb1${j + 1}",
        s"__nb2${j + 1}", s"__nb3${j + 1}")
      src.select(srcKeys.map(n => col(n).as(s"__p${n.drop(3).toInt + 1}")) ++
        carried.map(col): _*)
    }

    /** Per-level entry frame: (key cols, __lp10, __bo10 nullable). */
    def entries(j: Int): DataFrame = {
      if (j == order) {
        var d = rawN.join(ctxN, keys(order).dropRight(1))
        for (i <- order - 1 to 2 by -1)
          d = d.join(cont(i), keys(i), "left")
            .join(ctxc(i), keys(i).dropRight(1), "left")
        d = withStats(d.join(cont(1), keys(1), "left"))
        d.select(keys(order).map(col) :+ log10(pFold(order)).as("__lp10") :+
          lit(null).cast("double").as("__bo10"): _*)
      } else {
        val ctx = shiftedCtx(j)
        val base = cont(j).select(keys(j).map(col): _*)
          .unionByName(ctx.select(keys(j).map(col): _*))
          .distinct()
        var d = base
        for (i <- j to 2 by -1)
          d = d.join(cont(i), keys(i), "left")
            .join(ctxc(i), keys(i).dropRight(1), "left")
        d = withStats(d.join(cont(1), keys(1), "left"))
          .join(ctx, keys(j), "left")
        val totCol =
          if (j + 1 == order) col(s"__tot$order") else col(s"__ctot${j + 1}")
        val bo = when(totCol.isNotNull && totCol > 0,
          log10(gnum(j + 1) / totCol))
        d.select(keys(j).map(col) :+ log10(pFold(j)).as("__lp10") :+
          bo.as("__bo10"): _*)
      }
    }

    // <unk>: the fold's uniform floor γ₁ · 1/(V+1) as a first-class entry
    val t1 = st.getAs[Double]("__t1")
    val v = st.getAs[Long]("__v")
    val unkLp10 = math.log10(unkNum(st) / t1 * (1.0 / (v + 1.0)))

    // header counts first (one count() per level, driver scalars)
    val levelFrames = (1 to order).map(j => j -> entries(j)).toMap
    val counts = (1 to order).map(j => j -> levelFrames(j).count()).toMap
    val total = counts.values.sum + 1
    val cap = maxEntries(spark)
    require(total <= cap,
      s"arpaExport: $total entries exceed graft.arpa.maxEntries = $cap — " +
        "an ARPA file is a driver-sized artifact; prune harder (minCount) " +
        "or raise the conf deliberately")

    // Hadoop FS streams (the Artifacts convention): local paths on
    // local[*], object-store URIs on a cluster — the artifact layer must
    // not be the one local-only piece of the deployment story
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val w = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
      fs.create(p, true), java.nio.charset.StandardCharsets.UTF_8))
    try {
      w.write("\\data\\\n")
      for (j <- 1 to order)
        w.write(s"ngram $j=${counts(j) + (if (j == 1) 1 else 0)}\n")
      for (j <- 1 to order) {
        w.write(s"\n\\$j-grams:\n")
        if (j == 1) w.write(s"${fmt(unkLp10)}\t<unk>\n")
        val it = levelFrames(j).sort(keys(j).map(col): _*).toLocalIterator()
        while (it.hasNext) {
          val r = it.next()
          val gram = (0 until j).map(r.getString).mkString(" ")
          val lp = fmt(r.getDouble(j))
          if (j < order && !r.isNullAt(j + 1))
            w.write(s"$lp\t$gram\t${fmt(r.getDouble(j + 1))}\n")
          else w.write(s"$lp\t$gram\n")
        }
      }
      w.write("\n\\end\\\n")
    } finally w.close()
    scope.release()
    }
  }

  /** Shortest round-trip decimal text of a double (Double.toString —
    * parsing it returns the identical bits, the round-trip guarantee). */
  private def fmt(d: Double): String = d.toString

  /** Export ONE ARPA file PER LANGUAGE of a labeled reference corpus —
    * the literal CCNet deployment layout (Wenzek et al. ship one KenLM
    * artifact per language): each language's slice exports through
    * [[arpaExportKn]] to `dir/<lang>.arpa`. Artifact-writing is
    * inherently one file per language, so the driver loop here is over
    * the LANGUAGE SET (bounded — CCNet's is ~100; capped at 1024 with a
    * named error), not over data; each slice's model still trains as
    * distributed count tables. A null language exports as `__null.arpa`;
    * names outside [A-Za-z0-9_-] hex-escape. Languages whose slice has
    * no bigram are SKIPPED (no model — the by-lang scorer's NULL-verdict
    * languages). Returns (language, file path) for each written file. */
  def arpaExportKnByLang(refDocs: DataFrame, refTextCol: String,
                         refLangCol: String, order: Int, dir: String,
                         discount: Double = 0.75,
                         minCount: Long = 1L): Seq[(String, String)] =
    exportByLang(refDocs, refLangCol, dir, "arpaExportKnByLang",
      (slice, path) => arpaExportKn(slice, refTextCol, order, path,
        discount, minCount))

  /** [[arpaExportKnByLang]] with KenLM's real smoothing — one
    * MODIFIED-KN ARPA file per language (each language's bucketed
    * discounts derive from its own slice's count-of-counts). */
  def arpaExportMknByLang(refDocs: DataFrame, refTextCol: String,
                          refLangCol: String, order: Int, dir: String,
                          fallback: (Double, Double, Double) = TextOps.MknFallback,
                          minCount: Long = 1L): Seq[(String, String)] =
    exportByLang(refDocs, refLangCol, dir, "arpaExportMknByLang",
      (slice, path) => arpaExportMkn(slice, refTextCol, order, path,
        fallback, minCount))

  private def exportByLang(refDocs: DataFrame, refLangCol: String,
                           dir: String, label: String,
                           exportOne: (DataFrame, String) => Unit): Seq[(String, String)] = {
    require(!refDocs.isStreaming,
      s"$label: the reference corpus must be a batch frame")
    val langs = refDocs.select(col(refLangCol).cast("string")).distinct()
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq
    require(langs.size <= 1024,
      s"$label: ${langs.size} languages — one ARPA file per " +
        "language is an artifact layout, not a per-key operation; cap 1024")
    def fileNameOf(l: String): String =
      if (l == null) "__null"
      else if (l.nonEmpty && l.forall(c => c.isLetterOrDigit || c == '_' || c == '-')) l
      else "x" + l.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .map(b => f"${b & 0xff}%02x").mkString
    langs.sorted(Ordering.String.on[String](l => if (l == null) "" else l))
      .flatMap { l =>
        val slice = refDocs.filter(col(refLangCol).cast("string") <=> lit(l))
        val path = new org.apache.hadoop.fs.Path(dir, s"${fileNameOf(l)}.arpa").toString
        // a language slice without a bigram has no model: skip, like the
        // by-lang scorer's NULL verdict
        try {
          exportOne(slice, path)
          Some((l, path))
        } catch {
          case e: IllegalArgumentException
              if e.getMessage != null && e.getMessage.contains("empty model") =>
            None
        }
      }
  }

  // ------------------------------------------------------------- import

  /** Parse an ARPA text file (standard format — KenLM output included)
    * into an [[ArpaModel]]. Driver-side streaming parse (the artifact
    * contract), capped by `graft.arpa.maxEntries`; per-order tables are
    * plan-local and broadcast into the scoring joins. `<s>`/`</s>`
    * entries parse like any other token (this engine never emits
    * sentence-boundary positions, so they simply never join). */
  def arpaImport(spark: SparkSession, path: String): ArpaModel = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val cap = maxEntries(spark)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"arpaImport: no ARPA file at $path")
    val src = scala.io.Source.fromInputStream(fs.open(p))(scala.io.Codec.UTF8)
    val declared = scala.collection.mutable.Map.empty[Int, Long]
    val rows = scala.collection.mutable.Map.empty[Int, scala.collection.mutable.ArrayBuffer[Row]]
    var unk: Option[Double] = None
    try {
      val it = src.getLines()
      var section = 0 // 0 = preamble, -1 = \data\, j > 0 = \j-grams:
      var n = 0L
      val gramHdr = """\\(\d+)-grams:""".r
      val countLine = """ngram (\d+)\s*=\s*(\d+)""".r
      for (raw <- it) {
        val line = raw.trim
        if (line.nonEmpty) line match {
          case "\\data\\" => section = -1
          case "\\end\\" => section = 0
          case gramHdr(j) =>
            section = j.toInt
            require(declared.contains(section),
              s"arpaImport: section \\$section-grams: not declared in \\data\\")
          case countLine(j, c) if section == -1 =>
            declared(j.toInt) = c.toLong
          case _ if section > 0 =>
            n += 1
            require(n <= cap,
              s"arpaImport: more than graft.arpa.maxEntries = $cap entries — " +
                "not a driver-sized artifact; raise the conf deliberately")
            val j = section
            val parts = line.split("[\t ]+")
            require(parts.length == j + 1 || parts.length == j + 2,
              s"arpaImport: malformed $j-gram line '$line' " +
                s"(want logprob + $j tokens [+ backoff])")
            val lp = java.lang.Double.parseDouble(parts(0))
            val words = parts.slice(1, j + 1)
            val bo: Any =
              if (parts.length == j + 2) java.lang.Double.parseDouble(parts(j + 1))
              else null
            if (j == 1 && words(0) == "<unk>") unk = Some(lp)
            else rows.getOrElseUpdate(j,
              scala.collection.mutable.ArrayBuffer.empty[Row]) +=
              Row.fromSeq(words.toSeq ++ Seq(lp, bo))
          case _ => () // preamble / \data\ chatter
        }
      }
    } finally src.close()
    require(declared.nonEmpty, s"arpaImport: no \\data\\ header in $path")
    val order = declared.keys.max
    require(order >= 2,
      s"arpaImport: model order $order — an LM artifact needs order >= 2")
    val tables = (1 to order).map { j =>
      val schema = StructType(
        TextOps.gramCols(order, j).map(n => StructField(n, StringType)) ++
          Seq(StructField(s"__lp$j", DoubleType),
            StructField(s"__bo$j", DoubleType)))
      val data = rows.getOrElse(j, scala.collection.mutable.ArrayBuffer.empty[Row])
      import scala.jdk.CollectionConverters._
      j -> spark.createDataFrame(new java.util.ArrayList[Row](data.asJava), schema)
    }.toMap
    ArpaModel(order, tables, unk)
  }

  // ------------------------------------------------------------ scoring

  /** Score documents — batch frame or arriving stream — against an
    * imported ARPA model with standard back-off semantics: a position
    * takes its longest-match entry's log10 prob, paying each skipped
    * context's back-off weight (absent context = weight 1); tokens
    * outside the model's vocabulary take the `<unk>` entry. Output
    * (idCol, n_grams, avg_logprob) in NATURAL log — drop-in for the KN
    * family's faces (the ARPA file stores log10; scores convert once per
    * position). Streaming is stream-static broadcast joins + the
    * stateless per-batch combine — zero state rows. */
  def arpaScoreAgainst(stream: graft.api.MStream, model: ArpaModel,
                       idCol: String, textCol: String): graft.api.MStream = {
    val order = model.order
    require(model.unkLp10.nonEmpty,
      "arpaScoreAgainst: the model has no <unk> entry — open-vocabulary " +
        "scoring needs one (KenLM models carry it; graft exports always " +
        "write it)")
    val unk = model.unkLp10.get
    def keys(j: Int): Seq[String] = TextOps.gramCols(order, j)
    // back-off weights of level-j entries, re-keyed as the CONTEXT of a
    // level-(j+1) probe: __p{i} -> __p{i-1}
    def boCtx(j: Int): DataFrame =
      model.tables(j).where(col(s"__bo$j").isNotNull)
        .select(keys(j).map(n => col(n).as(s"__p${n.drop(3).toInt - 1}")) :+
          col(s"__bo$j"): _*)
    def withJoins(pos: DataFrame): DataFrame = {
      var d = pos
      for (j <- order to 1 by -1)
        d = d.join(broadcast(model.tables(j).select(
          (keys(j).map(col) :+ col(s"__lp$j")): _*)), keys(j), "left")
      for (j <- 1 until order)
        d = d.join(broadcast(boCtx(j)), keys(j + 1).dropRight(1), "left")
      d
    }
    var lg: Column = coalesce(col("__lp1"), lit(unk))
    for (j <- 2 to order)
      lg = when(col(s"__lp$j").isNotNull, col(s"__lp$j"))
        .otherwise(coalesce(col(s"__bo${j - 1}"), lit(0.0)) + lg)
    val lp = lg * lit(math.log(10.0))
    TextOps.againstApply(stream, idCol, textCol, order, "n_grams", withJoins, lp)
  }
}
