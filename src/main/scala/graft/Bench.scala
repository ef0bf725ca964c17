package graft

import org.apache.spark.sql.SparkSession

/**
 * Driver-run benchmark: every SparkEntry query at SPARK_GRAFT_SF_DIR,
 * one JSON line on stdout. Queries are fully materialized through the
 * noop sink (a bare `count()` would let Catalyst prune projections and
 * under-measure); a warm-up pass at sf0.001 amortizes JVM/codegen/JIT
 * warm-up out of the measured numbers, the way any long-lived cluster
 * would.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // RDD.unpersist logs one "locally checkpointed ... cannot be
    // recomputed" WARN per released block, unconditionally. Every such
    // release here is deliberate (supersede-and-unpersist hygiene in
    // connectedComponents/buildVocab/residual joins, and isolate() below)
    // and the frames are never re-read, so the rdd logger drops to ERROR
    // in the HARNESS only — library code never touches log levels.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd", org.apache.logging.log4j.Level.ERROR)

    // Per-query isolation: a query must not be billed for state a previous
    // query left behind (cached plans, persisted RDDs, checkpoint blocks) —
    // round 2's artifact showed tail queries 3-7x their isolated time from
    // exactly that accumulation. Clear both caches between queries and give
    // the JVM a GC breath so one query's garbage doesn't land in another's
    // measurement window.
    def isolate(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
    }

    def materialize(name: String, dir: String): Double = {
      isolate()
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    val names = SparkEntry.queries.keys.toSeq.sorted
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory && warmDir != sfDir)
      names.foreach(materialize(_, warmDir))

    // Best-of-2 at the measured scale: the first pass still absorbs
    // first-touch effects sf0.001 can't warm (file-listing, codegen paths
    // only taken at the larger input); the min of two runs is the
    // steady-state number a long-lived cluster would see. Queries whose
    // two samples disagree badly (host noise, GC landing inside the
    // window) report the MEDIAN OF THREE instead: the median discards the
    // one outlier sample a noisy host injects, where best-of-N would keep
    // drifting optimistic and max would bill the noise — bounded extra
    // cost (one extra run only for flagged queries), and the reported
    // number tracks steady state even on a loaded host.
    def pass(): Seq[(String, Double)] = names.map(n => n -> materialize(n, sfDir))
    val p1 = pass().toMap
    val results = pass().map { case (n, t2) =>
      val t1 = p1.getOrElse(n, -1.0)
      if (t2 < 0 || t1 < 0) n -> math.max(t1, t2)
      else {
        val best = math.min(t1, t2)
        val noisy = math.max(t1, t2) > best * 1.5 && best > 0.05
        if (!noisy) n -> best
        else {
          val t3 = materialize(n, sfDir)
          val med =
            if (t3 < 0) best
            else Seq(t1, t2, t3).sorted.apply(1)
          System.err.println(
            f"[bench] $n unstable ($t1%.2f/$t2%.2f), third sample $t3%.2f -> median $med%.2f")
          n -> med
        }
      }
    }
    // Artifact layout is dictated by the driver's TAIL capture (the LAST
    // ~2000 chars of stdout survive and are parsed as JSON): two lines go
    // out. First the full-precision line — queries ASCENDING by time so a
    // truncated head loses only the fastest entries, except FAILURES (-1
    // sentinels) which sort as if slowest; it also persists COMPLETE to
    // BENCH_FULL.json (absolute path — an optional first arg overrides;
    // the round snapshot commits it). LAST, a compact line built to FIT
    // the tail whole: every query at integer milliseconds under
    // "queries_ms" (encoding "<name sans q_>:<ms>", comma-separated; -1 =
    // failed), self-trimming from the fastest end if the surface ever
    // outgrows the budget. The tail parser therefore always sees one
    // complete JSON object with the full per-query map — no BENCH_FULL
    // git archaeology needed to answer "did X regress".
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val ascending = results.sortBy { case (_, v) => if (v < 0) Double.MaxValue else v }
    val qs = ascending.map { case (k, v) => "\"" + k + "\":" + fmt(v) }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val fullPath = java.nio.file.Paths.get(
      args.headOption.getOrElse("BENCH_FULL.json")).toAbsolutePath
    val line =
      s"""{"metric":"total","unit":"sec","sf":"$sfDir","full":"$fullPath","queries":$qs,"value":${fmt(total)}}"""
    try java.nio.file.Files.write(fullPath, (line + "\n").getBytes("UTF-8"))
    catch { case e: Exception => System.err.println(s"[bench] $fullPath write failed: $e") }
    println(line)
    val msEntries = ascending.map { case (k, v) =>
      (if (k.startsWith("q_")) k.drop(2) else k) + ":" +
        (if (v < 0) "-1" else math.round(v * 1000).toString)
    }
    // no "full" path here — it rides the first line; every byte of the
    // ~2000-char tail budget goes to query entries. Budget 1880, not
    // 1980: the driver captures the LAST 2000 chars of stdout, and sbt
    // appends a trailing "[success] Total time: ..." line (~80 chars)
    // AFTER this one — a 1980-char line left the JSON head truncated in
    // the captured tail every round since r13 ("parsed": null in
    // BENCH_r13..r17). 1880 + the sbt trailer + newlines fits the
    // 2000-char window with slack, so the driver finally parses the
    // compact line whole; the trim drops only the FASTEST entries
    // (reported in omitted_fastest), and the full map still persists to
    // BENCH_FULL.json on the first line.
    def compact(es: Seq[String], omitted: Int): String =
      s"""{"metric":"total","unit":"sec","sf":"$sfDir","omitted_fastest":$omitted,"queries_ms":"${es.mkString(",")}","value":${fmt(total)}}"""
    var kept = msEntries
    var omitted = 0
    while (compact(kept, omitted).length > 1880 && kept.nonEmpty) {
      kept = kept.tail; omitted += 1 // ascending: the fastest entry goes first
    }
    println(compact(kept, omitted))
    spark.stop()
  }
}
