package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract consistency guards (no Spark session needed):
  * queries and oracles can only drift apart by failing this suite. */
class ContractSpec extends AnyFunSuite {

  /** Queries intentionally WITHOUT a DuckDB oracle — each is seeded /
    * approximate-by-contract and pinned instead by a fixed- or
    * exhaustive-setting oracle twin plus spec gates (see COVERAGE.md).
    * Growing this set is a deliberate act: add the name here AND
    * document the twin, or the build fails. */
  private val RowsOnly = Set(
    "b1_hnsw_edges", "b1_hnsw_incremental", "b4_ivf_build", "b5_ivf_add",
    "b8_pq_train", "b9_pq_encode", "e1_embed_docs",
    "o3_hnsw_search", "o6_ivf_partitioned", "o6_ivf_search", "o6_pq_adc_topk",
    // streamed-then-searched HNSW index: approximate by the same
    // contract as o3_hnsw_search; twins: o3_hnsw_exhaustive (oracle)
    // + StreamingSpec's flush→refresh→search recall gate
    "b10_stream_index")

  test("every oracle key names an existing query") {
    val stray = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(stray.isEmpty, s"oracles without a query: $stray")
  }

  test("every query either has an oracle or is a documented rows-only query") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle == RowsOnly,
      s"undocumented rows-only queries: ${noOracle -- RowsOnly}; " +
        s"stale RowsOnly entries: ${RowsOnly -- noOracle}")
  }

  test("oracle SQL is non-empty and free of unresolved interpolation") {
    // a forgotten s-prefix leaves "$name"/"${expr}" literally in the
    // SQL: flag '$' followed by an identifier char or '{'. JSONPath
    // "$.k" (events_json_extract) is legitimate and passes.
    val unresolved = """\$[A-Za-z_{]""".r
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"$name: empty oracle SQL")
      assert(unresolved.findFirstIn(sql).isEmpty,
        s"$name: unresolved interpolation: ${unresolved.findFirstIn(sql)}")
      assert(!sql.contains(" null)") || sql.contains("IS null"),
        s"$name: a Scala null may have been interpolated into the SQL")
    }
  }
}
