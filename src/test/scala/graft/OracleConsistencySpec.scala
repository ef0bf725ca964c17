package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Static consistency pins over the oracle SQL corpus — the contracts that
 * keep 58 hand-mirrored DuckDB queries from drifting apart (or from the
 * engine) as they evolve.
 */
class OracleConsistencySpec extends AnyFunSuite {

  /** The one canonical DuckDB word-split idiom (explicit ASCII-whitespace
    * class matching Java regex `\s`; RE2's `\s` lacks `\x0b`), over any
    * single column reference (`text`, `line`, ...). */
  private val WordSplit =
    """list_filter(string_split_regex(<col>, '[ \t\n\f\r\x0b]+'), x -> x <> '')"""
  private val WordSplitRe =
    (java.util.regex.Pattern.quote("list_filter(string_split_regex(") +
      "[A-Za-z_][A-Za-z0-9_.]*" +
      java.util.regex.Pattern.quote(""", '[ \t\n\f\r\x0b]+'), x -> x <> '')""")).r

  /** The one canonical SENTENCE-split idiom (terminal-punctuation runs —
    * Spark `split(text, "[.!?]+")`'s exact mirror; the sentence-mode LM
    * faces split on it before the word split). */
  private val SentSplitRe =
    ("string_split_regex\\([A-Za-z_][A-Za-z0-9_.]*" +
      java.util.regex.Pattern.quote(""", '[.!?]+')""")).r

  test("no oracle uses RE2 \\s — Java and RE2 disagree on vertical tab") {
    for ((name, sql) <- SparkEntry.oracleSql)
      assert(!sql.contains("\\s"),
        s"$name: oracle contains regex \\s — use the explicit class " +
          "[ \\t\\n\\f\\r\\x0b] so DuckDB (RE2) matches the engine (Java)")
  }

  test("every oracle that tokenizes uses the one canonical word-split idiom") {
    for ((name, sql) <- SparkEntry.oracleSql if sql.contains("string_split_regex")) {
      val splits = "string_split_regex".r.findAllIn(sql).length
      val canonical = WordSplitRe.findAllIn(sql).length +
        SentSplitRe.findAllIn(sql).length
      assert(splits == canonical,
        s"$name: ${splits - canonical} string_split_regex call(s) deviate from " +
          s"the canonical word-split idiom:\n  $WordSplit\n" +
          "(or the canonical sentence-split idiom '[.!?]+')")
    }
  }

  test("every query has an oracle twin or is explicitly rows-only") {
    // the driver records a weaker rows-only check for queries without SQL;
    // every registered query must have a twin UNLESS it is on this
    // explicit not-SQL-expressible list with the reason documented at the
    // query definition
    val rowsOnly = Set(
      // data-dependent codebook size (k = cellsFor(count, target)) — the
      // fixed-k Lloyd-unroll scaffolding cannot mirror it; exactness vs
      // the fixed-k face is pinned in SemanticDedupSpec instead
      "q_semantic_auto")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without oracle twins: $missing")
    assert(rowsOnly.subsetOf(SparkEntry.queries.keySet),
      "rows-only list must name real queries")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("q_program_agg stays oracle-identical to q_agg") {
    // the query IS q_agg executed through the JSON program-import path;
    // if either oracle is edited independently the equivalence claim breaks
    assert(SparkEntry.oracleSql("q_program_agg") == SparkEntry.oracleSql("q_agg"),
      "q_program_agg's oracle must remain q_agg's SQL verbatim")
  }
}
