package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Cross-session model artifacts: persist pinned model tables — threshold
 * cuts (`TextOps.perplexityBucketThresholds`), BPE merges
 * (`TextOps.trainBpeMerges`), vocabularies (`TextOps.buildVocab`),
 * IVF/PQ codebooks (`Ivf.train`/`Pq.train`), NB class tables — as named
 * parquet parts plus a JSON manifest, so ONE pipeline trains and ANOTHER
 * scores without retraining (the reference's program-as-artifact stance,
 * milan-lang `ApplicationInstance`, extended to the MODEL half; the
 * query-as-artifact half is [[Program]]).
 *
 * Layout under `dir`:
 * {{{
 *   manifest.json             // {"format": 1, "kind": ..., "meta": {...},
 *                             //  "tables": ["cuts", ...]}
 *   tables/<name>/…parquet…   // one parquet directory per table
 * }}}
 *
 * The manifest writes LAST — a directory without one is an aborted save,
 * and [[load]] rejects it with a named error instead of reading a torn
 * artifact. Tables load lazily (plain parquet reads), so an against-face
 * binds a loaded artifact exactly like an in-session frame — the scoring
 * joins, broadcast decisions and pruning levers are unchanged.
 *
 * Scale posture: every supported family is a by-design driver-or-
 * broadcast-sized artifact (each trainer caps its own size); parquet
 * round-trips doubles bit-exactly, so frozen cuts compare identically
 * after reload. Paths are whatever the session's Hadoop conf resolves —
 * local paths on local[*], object-store URIs on a cluster.
 */
object Artifacts {

  /** A loaded artifact: its declared kind, caller metadata, and lazily
    * read tables. */
  final case class Artifact(kind: String, meta: Map[String, String],
                            tables: Map[String, DataFrame])

  private val NamePat = "[A-Za-z0-9_-]{1,64}".r

  private def checkName(what: String, n: String): Unit =
    require(NamePat.matches(n),
      s"$what '$n' must match ${NamePat.regex} (it names a directory)")

  /** Persist `tables` under `dir` with a `kind` tag and free-form `meta`.
    * Fails if `dir` already holds an artifact (pass `overwrite = true`
    * to replace it — tables write first, the manifest commits last). */
  def save(dir: String, kind: String, tables: Map[String, DataFrame],
           meta: Map[String, String] = Map.empty,
           overwrite: Boolean = false): Unit = {
    require(tables.nonEmpty, "Artifacts.save: no tables to save")
    checkName("artifact kind", kind)
    tables.keys.foreach(checkName("table name", _))
    tables.values.foreach(t => require(!t.isStreaming,
      "Artifacts.save: model artifacts are batch frames"))
    val spark = tables.head._2.sparkSession
    val hadoop = spark.sparkContext.hadoopConfiguration
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(hadoop)
    val manifest = new org.apache.hadoop.fs.Path(base, "manifest.json")
    require(overwrite || !fs.exists(manifest),
      s"Artifacts.save: $dir already holds an artifact " +
        "(pass overwrite = true to replace it)")
    // overwrite keeps the commit-last invariant: the OLD manifest must
    // not survive into the rewrite window, or a crash mid-save leaves a
    // directory whose stale manifest accepts a mix of old and new tables
    // — exactly the torn artifact load() is designed to reject
    if (overwrite && fs.exists(manifest)) fs.delete(manifest, false)
    val mode = if (overwrite) "overwrite" else "errorifexists"
    tables.toSeq.sortBy(_._1).foreach { case (name, df) =>
      df.write.mode(mode).parquet(
        new org.apache.hadoop.fs.Path(base, s"tables/$name").toString)
    }
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    val json = JsonMethods.compact(JsonMethods.render(
      ("format" -> 1) ~ ("kind" -> kind) ~ ("meta" -> meta) ~
        ("tables" -> tables.keys.toSeq.sorted)))
    val out = fs.create(manifest, overwrite)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Load the artifact at `dir`. Optionally require its `kind` tag —
    * binding a BPE-merge artifact where threshold cuts are expected
    * should fail by NAME, not as a missing-column AnalysisException
    * downstream. */
  def load(spark: SparkSession, dir: String,
           expectKind: Option[String] = None): Artifact = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: Formats = DefaultFormats
    val hadoop = spark.sparkContext.hadoopConfiguration
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(hadoop)
    val manifest = new org.apache.hadoop.fs.Path(base, "manifest.json")
    require(fs.exists(manifest),
      s"Artifacts.load: no manifest.json under $dir — not an artifact " +
        "directory (or an aborted save; the manifest commits last)")
    val in = fs.open(manifest)
    val j = try JsonMethods.parse(in) finally in.close()
    val format = (j \ "format").extractOpt[Int].getOrElse(0)
    require(format == 1,
      s"Artifacts.load: unsupported manifest format $format (this build " +
        "reads format 1)")
    val kind = (j \ "kind").extract[String]
    expectKind.foreach(k => require(kind == k,
      s"Artifacts.load: $dir holds a '$kind' artifact, expected '$k'"))
    val meta = (j \ "meta").extractOpt[Map[String, String]].getOrElse(Map.empty)
    val names = (j \ "tables").extract[Seq[String]]
    require(names.nonEmpty, s"Artifacts.load: manifest under $dir lists no tables")
    val tables = names.map { n =>
      checkName("table name", n)
      n -> spark.read.parquet(
        new org.apache.hadoop.fs.Path(base, s"tables/$n").toString)
    }.toMap
    Artifact(kind, meta, tables)
  }
}
