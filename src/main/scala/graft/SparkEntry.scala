package graft

import graft.core.{OracleSql, Tables}
import graft.expressions.TextKernels
import graft.functions.{HashingEmbedder, TextFunctions}
import graft.functions.VectorFunctions._
import graft.operators.{AsofJoin, Bloom, Bpe, Bq, ByteBpe, Chunker, Classifier, Contamination, Crud, Curation, Dedup, Diversity, Dsir, Export, Funnel, Hnsw, Ivf, IvfPq, Layout, LmScore, Lsh, MediaCodec, Multimodal, MultiVec, PageRank, Pca, Phrases, Pq, Profile, RangeJoin, Sampling, Search, Sessionize, Sketch, Sq, TextSearch, Triangles}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query keys are prefixed with their SURVEY §2 operator ids
  * (o1.., b4.., s2.., e1..) or the extension family (dedup_, ann_, t_).
  * Every SQL-expressible query has a DuckDB oracle in [[oracleSql]]
  * generated to be bitwise-compatible (see [[graft.core.OracleSql]]).
  */
object SparkEntry {

  private val QueryVecId = 0L

  /** Text query shared by the E2 search queries and their oracle. */
  private val EmbedQueryText = "spark table scan fast query"

  /** Dedup guard settings shared by the showcase queries AND their
    * oracle SQL — the guarded (bounded-fan-out) configuration is the
    * one demonstrated; both engines apply the identical cutoff so the
    * results stay hash-exact with the guards on. */
  private val DedupMaxBucket = 10000
  private val DedupMaxDocFreq = 10000

  /** t_blocklist pattern list, shared by the Spark query and its
    * unrolled oracle SQL: multi-word phrases over the corpus
    * vocabulary, with a nested pair (`batch batch` inside
    * `batch batch batch`) and overlapping phrases (`fast key` /
    * `key order`) so the oracle pins the automaton's fail-closure
    * outputs, not just disjoint hits. */
  private val BlockPatterns = Seq(
    "batch batch", "batch batch batch", "slow join", "window window",
    "fast key", "key order", "merge merge", "sort sort", "stream stream",
    "query row data", "hash scan join", "customer line", "agg line",
    "value merge", "row column column", "the fast", "group query",
    "data line join", "vector window", "dup dup")

  /** t_blocklist_words pattern list (un-padded; the query and oracle
    * both space-pad them against the normalized text): `windo` is the
    * deliberate near-word — as a SUBSTRING it hits every `window`, so
    * the word-bounded result differing from a substring run is the
    * boundary semantics under test. */
  private val WordBlockPatterns =
    Seq("key", "merge", "windo", "batch batch", "slow join")

  /** PID-suffixed scratch dir under java.io.tmpdir: two concurrent
    * Verify runs on one machine (the run_probe.sh pattern) must not
    * clobber each other's checkpoint/work dirs mid-stream, while
    * same-process reruns wipe and reuse the same directory. */
  private def scratchDir(name: String): String = {
    val p = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      s"${name}_${ProcessHandle.current().pid()}")
    if (java.nio.file.Files.exists(p)) {
      val walk = java.nio.file.Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))
      finally walk.close()
    }
    java.nio.file.Files.createDirectories(p).toString
  }

  /** Deterministic messy-URL planting shared by t_url_canon and
    * dedup_url (and replayed by [[urlCanonCtes]] in both oracles):
    * mixed-case schemes/hosts, userinfo, default and non-default
    * ports, fragments, query strings, and a bare non-URL row. The
    * FOUR copies this logic would otherwise be (two queries, two
    * oracle CTE chains) must stay byte-identical for the oracle
    * comparison to mean anything — hence one def and one CTE string. */
  private def plantedUrl: org.apache.spark.sql.Column =
    when(col("doc_id") % 11 === 0, lit("not a url #x"))
      .otherwise(concat(
        when(col("doc_id") % 2 === 0, lit("HTTP://")).otherwise(lit("https://")),
        when(col("doc_id") % 5 === 0, lit("crawler@")).otherwise(lit("")),
        lit("WWW"), (col("doc_id") % 7).cast("string"),
        lit("."), col("source"), lit(".Example.COM"),
        when(col("doc_id") % 3 === 0,
            when(col("doc_id") % 2 === 0, lit(":80")).otherwise(lit(":443")))
          .when(col("doc_id") % 3 === 1, lit(":8080")).otherwise(lit("")),
        when(col("doc_id") % 4 === 0, lit(""))
          .otherwise(concat(lit("/p/"), col("doc_id").cast("string"))),
        when(col("doc_id") % 6 === 0, lit("?q=1&ref=RSS")).otherwise(lit("")),
        when(col("doc_id") % 2 === 1, lit("#Section-2")).otherwise(lit(""))))

  /** Shared oracle CTE chain for the planted-URL queries: plant →
    * fragment drop → scheme/auth/rest split → canon. Yields CTE
    * `urlc(doc_id, url, canon)`. */
  private def urlCanonCtes: String = {
    val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)(.*)$"
    s"""u AS (SELECT doc_id,
       |  CASE WHEN doc_id % 11 = 0 THEN 'not a url #x'
       |  ELSE
       |    (CASE WHEN doc_id % 2 = 0 THEN 'HTTP://' ELSE 'https://' END) ||
       |    (CASE WHEN doc_id % 5 = 0 THEN 'crawler@' ELSE '' END) ||
       |    'WWW' || CAST(doc_id % 7 AS VARCHAR) || '.' || source ||
       |    '.Example.COM' ||
       |    (CASE WHEN doc_id % 3 = 0 THEN
       |        (CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END)
       |      WHEN doc_id % 3 = 1 THEN ':8080' ELSE '' END) ||
       |    (CASE WHEN doc_id % 4 = 0 THEN ''
       |      ELSE '/p/' || CAST(doc_id AS VARCHAR) END) ||
       |    (CASE WHEN doc_id % 6 = 0 THEN '?q=1&ref=RSS' ELSE '' END) ||
       |    (CASE WHEN doc_id % 2 = 1 THEN '#Section-2' ELSE '' END)
       |  END AS url FROM documents),
       |nf AS (SELECT doc_id, url,
       |  regexp_replace(url, '#.*$$', '') AS nofrag FROM u),
       |p AS (SELECT doc_id, url, nofrag,
       |  lower(regexp_extract(nofrag, '$schemeRe', 1)) AS scheme,
       |  lower(regexp_replace(regexp_extract(nofrag, '$schemeRe', 2),
       |    '^[^@]*@', '')) AS auth,
       |  regexp_extract(nofrag, '$schemeRe', 3) AS rest FROM nf),
       |urlc AS (SELECT doc_id, url,
       |  CASE WHEN regexp_matches(nofrag, '^[A-Za-z][A-Za-z0-9+.-]*://')
       |  THEN scheme || '://' ||
       |    (CASE WHEN scheme = 'http' THEN regexp_replace(auth, ':80$$', '')
       |          WHEN scheme = 'https' THEN regexp_replace(auth, ':443$$', '')
       |          ELSE auth END) ||
       |    (CASE WHEN rest = '' THEN '/' ELSE rest END)
       |  ELSE nofrag END AS canon FROM p)""".stripMargin
  }

  /** Late-interaction query segments shared by mv_maxsim and its oracle
    * (each segment is one query-side vector; see
    * [[graft.operators.MultiVec]]). */
  private[graft] val MaxsimQuerySegments =
    Seq("spark table scan", "fast vector query", "data engine")

  /** Hybrid-search constants shared by the BM25/RRF queries and their
    * oracles (doubles interpolate into the SQL via toString, so both
    * engines compute from the identical IEEE-754 values). */
  private val BmTerms = Seq("vector", "query", "spark")
  private val Bm25K1 = 1.2
  private val Bm25B = 0.75
  private val HybridC = 50
  private val RrfK = 60

  /** Base table joined with the broadcast 1-row query vector (qe). */
  private def withQuery(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    emb.crossJoin(broadcast(
      emb.filter(col("vec_id") === QueryVecId).select(col("embedding").as("qe"))))
  }

  /** Exact SUM of a 2-decimal money column via DECIMAL (order-independent,
    * matches OracleSql.decSum bit-for-bit). */
  private def dSum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(28, scale))).cast("double")

  /** Run `body` with `spark.sql.shuffle.partitions` temporarily set to
    * `n`, restoring the previous value after. Streaming state is
    * partitioned by this number, and every stateful micro-batch pays
    * per-partition state-store open + checkpoint-delta-file costs — at
    * bench scale (sf0.1, one host) 32 state stores per operator are
    * pure fixed overhead. Results are partitioning-invariant by the
    * same contract the oracle replay pins (StreamingSpec), so this is
    * a sizing knob, not semantics; a real cluster sizes it UP. */
  private def withShufflePartitions[T](s: SparkSession, n: Int)(body: => T): T = {
    val key = "spark.sql.shuffle.partitions"
    val prev = s.conf.get(key)
    s.conf.set(key, n.toString)
    try body finally s.conf.set(key, prev)
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Filtered exact kNN + hydration join (the reference's /search path:
    * embed → filter → top-k → hydrate, api/app.py:165-233). */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.documents(spark, dir)
    val topk = withQuery(spark, dir)
      .withColumn("dist", l2(col("embedding"), col("qe")))
      .select("vec_id", "label", "dist")
      .orderBy(col("dist").asc, col("vec_id").asc)
      .limit(10)
    topk.join(docs, topk("vec_id") === docs("doc_id"), "left")
      .select(col("vec_id"), col("dist"), col("label"), col("lang"), col("text"))
      .orderBy(col("dist").asc, col("vec_id").asc)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- O1: L2 distance (util/distance.py:3-4) — full distance scan
    "o1_l2_distance" -> ((s, dir) =>
      withQuery(s, dir)
        .select(col("vec_id"), l2(col("embedding"), col("qe")).as("dist"))
        .orderBy("vec_id")),

    // ---- O2: exact brute-force kNN, (dist, id) tie-break (test_hnsw.py:128-134)
    "o2_knn_exact" -> ((s, dir) =>
      withQuery(s, dir)
        .select(col("vec_id"), l2(col("embedding"), col("qe")).as("dist"))
        .orderBy(col("dist").asc, col("vec_id").asc)
        .limit(10)),

    // ---- O2 variant: cosine-distance top-k (similarity-search baseline)
    "o2_knn_cosine" -> ((s, dir) =>
      withQuery(s, dir)
        .select(col("vec_id"), cosineDistance(col("embedding"), col("qe")).as("dist"))
        .orderBy(col("dist").asc, col("vec_id").asc)
        .limit(10)),

    // ---- O2 variant: MMR diversity rerank (Carbonell-Goldstein '98) —
    // exact top-30 cosine candidates (TakeOrderedAndProject heap, no
    // corpus shuffle), then the greedy λ·rel − (1−λ)·maxsim selection
    // driver-side over the bounded candidate set. The rerank every
    // near-duplicate-heavy RAG corpus needs: plain top-k returns ten
    // copies of the best passage, MMR one plus nine complements.
    "o2_knn_mmr" -> ((s, dir) => {
      val q = Tables.embeddings(s, dir)
        .filter(col("vec_id") === QueryVecId)
        .select("embedding").head.getSeq[Float](0).toArray
      Diversity.mmrRerank(Tables.embeddings(s, dir), "vec_id", "embedding",
        q, nCandidates = 30, k = 8, lambda = 0.5)
    }),

    // ---- O6 tier: Matryoshka funnel search (Kusupati '22 MRL) — stage
    // 1 ranks by L2 over the FIRST 16 dims only (the nested-prefix
    // property MRL training grants; 4× less arithmetic and memory
    // traffic per row at scale), stage 2 reranks the 50 survivors with
    // the full 64-dim distance. Both stages exact and deterministic —
    // unlike the quantized tiers this one needs no recall twin; the
    // oracle replays the whole funnel.
    "o6_matryoshka_rerank" -> ((s, dir) => {
      val pre = withQuery(s, dir)
        .select(col("vec_id"), col("embedding"), col("qe"),
          l2(slice(col("embedding"), 1, 16), slice(col("qe"), 1, 16))
            .as("pdist"))
        .orderBy(col("pdist").asc, col("vec_id").asc)
        .limit(50)
      pre.select(col("vec_id"), col("pdist"),
          l2(col("embedding"), col("qe")).as("dist"))
        .orderBy(col("dist").asc, col("vec_id").asc)
        .limit(10)
    }),

    // ---- Training-data op: hard-negative mining (the contrastive /
    // dual-encoder training staple — for each anchor, the top-k
    // HIGHEST-similarity wrong-label candidates; DPR/Karpukhin '20 §4.2
    // "hard negatives"). Anchor batch broadcasts (rows × dim floats),
    // the corpus is scanned ONCE with the label-mismatch filter riding
    // the join residual, and the literal-k rank cut compiles to a
    // partial WindowGroupLimit below the per-anchor exchange — each map
    // task forwards ≤ k rows per anchor, so the shuffle carries
    // O(anchors × k × tasks), not the corpus. At 100 TB the anchor
    // batch is the training batch (thousands), still broadcast-sized.
    "sample_hard_negatives" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val anchors = emb.filter(col("vec_id") <= 2)
        .select(col("vec_id").as("anchor_id"), col("embedding").as("ae"),
          col("label").as("alabel"))
      val w = Window.partitionBy("anchor_id")
        .orderBy(col("sim").desc, col("vec_id").asc)
      emb.join(broadcast(anchors), col("label") =!= col("alabel"))
        .select(col("anchor_id"), col("vec_id"),
          col("label").cast("long").as("label"),
          cosine(col("embedding"), col("ae")).as("sim"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .orderBy("anchor_id", "rank")
    }),

    // ---- Eval-ops: retrieval-quality evaluation (recall@10 + MRR@10
    // of one retriever against another's ground truth — the offline
    // eval loop every retrieval stack runs before swapping rankers).
    // Here: dot-product retrieval scored against exact-cosine truth,
    // both exact and deterministic so the whole eval replays in SQL.
    // ONE corpus scan computes both scores; two per-anchor literal-k
    // rank cuts (partial WindowGroupLimit — map tasks forward ≤ k rows
    // per anchor); the metric join runs on 2×|anchors|×k rows. At
    // 100 TB the eval set is thousands of anchors — still bounded.
    "e_retrieval_eval" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val anchors = emb.filter(col("vec_id") <= 2)
        .select(col("vec_id").as("anchor_id"), col("embedding").as("ae"))
      val scored = emb.join(broadcast(anchors), col("vec_id") =!= col("anchor_id"))
        .select(col("anchor_id"), col("vec_id"),
          cosine(col("embedding"), col("ae")).as("csim"),
          dot(col("embedding"), col("ae")).as("dsim"))
      val wT = Window.partitionBy("anchor_id")
        .orderBy(col("csim").desc, col("vec_id").asc)
      val wR = Window.partitionBy("anchor_id")
        .orderBy(col("dsim").desc, col("vec_id").asc)
      val truth = scored.withColumn("trank", row_number().over(wT))
        .filter(col("trank") <= 10).select(col("anchor_id"), col("vec_id"),
          lit(1).as("rel"))
      val retr = scored.withColumn("rrank", row_number().over(wR))
        .filter(col("rrank") <= 10)
        .select(col("anchor_id"), col("vec_id"), col("rrank"))
      retr.join(truth, Seq("anchor_id", "vec_id"), "left")
        .groupBy("anchor_id")
        .agg((sum(coalesce(col("rel"), lit(0))).cast("double") / lit(10))
            .as("recall_at_10"),
          coalesce(max(when(col("rel") === 1,
              lit(1.0) / col("rrank"))), lit(0.0)).as("mrr_at_10"))
        .orderBy("anchor_id")
    }),

    // ---- O2 variant: maximum-inner-product search (MIPS) — top-k by
    // dot product descending, the retrieval metric of dual-encoder /
    // recommendation stacks where magnitude carries signal. Same
    // TakeOrderedAndProject shape as the distance paths.
    "o2_knn_dot" -> ((s, dir) =>
      withQuery(s, dir)
        .select(col("vec_id"), dot(col("embedding"), col("qe")).as("score"))
        .orderBy(col("score").desc, col("vec_id").asc)
        .limit(10)),

    // ---- O2 variant: grouped top-k — per-label nearest-3 in one pass
    // (partial WindowGroupLimit below the exchange; the partitioned-
    // search shape for per-category retrieval)
    "o2_knn_grouped" -> ((s, dir) => {
      val w = Window.partitionBy("label")
        .orderBy(col("dist").asc, col("vec_id").asc)
      withQuery(s, dir)
        .select(col("vec_id"), col("label").cast("long").as("label"),
          l2(col("embedding"), col("qe")).as("dist"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .orderBy("label", "rank")
    }),

    // ---- O2 variant: radius search — all rows within L2 distance 1.3
    // of the query (the range_search companion the public ANN stacks
    // pair with top-k; result ordered here for the deterministic dump)
    "o2_range_search" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") === QueryVecId)
        .select("embedding").head.getSeq[Float](0).toSeq
      Search.rangeSearch(emb, "vec_id", "embedding", q, radius = 1.3)
        .select("vec_id", "dist")
        .orderBy(col("dist").asc, col("vec_id").asc)
    }),

    // ---- O7: conjunctive equality filter before kNN (storage_service.py:106-128)
    "o7_knn_filtered" -> ((s, dir) =>
      withQuery(s, dir)
        .filter(col("label") === 3)
        .select(col("vec_id"), col("label").cast("long").as("label"),
          l2(col("embedding"), col("qe")).as("dist"))
        .orderBy(col("dist").asc, col("vec_id").asc)
        .limit(10)),

    // ---- O7 on documents: two-conjunct metadata filter (lang AND source)
    "o7_metadata_filter" -> ((s, dir) =>
      Tables.documents(s, dir)
        .filter(col("lang") === "en" && col("source") === "src3")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")),

    // ---- O7 fidelity: conjunctive filter over the raw metadata_json
    // column — int, list-element, and string values in one JSON payload
    // (the shapes a string map can't hold; the reference stores int and
    // list metadata, tests/integration/test_embed_api.py:153-160). The
    // JSON text is constructed deterministically, then *parsed* by the
    // codegen'd get_json_object path, so the filter rides the scan at
    // 100 TB like any other predicate.
    "o7_metadata_json_filter" -> ((s, dir) => {
      val nodes = Tables.embeddings(s, dir).select(
        col("vec_id").as("id"),
        concat(lit("{\"label\":"), col("label").cast("string"),
          lit(",\"lens\":["), (col("vec_id") % 5).cast("string"),
          lit(","), ((col("vec_id") + 2) % 5).cast("string"),
          lit("],\"src\":\"s"), (col("vec_id") % 3).cast("string"),
          lit("\"}")).as("metadata_json"))
      nodes.filter(Search.metadataJsonFilter(col("metadata_json"),
          Map("label" -> "3", "lens[1]" -> "2", "src" -> "s1")))
        .select("id", "metadata_json")
        .orderBy("id")
    }),

    // ---- O8: empty-filter short-circuit (api/app.py:186-192)
    "o8_filter_empty" -> ((s, dir) =>
      Tables.documents(s, dir)
        .filter(col("lang") === "xx")
        .select("doc_id", "lang")
        .orderBy("doc_id")),

    // ---- S2: point lookup (storage.py:232-252)
    "s2_point_lookup" -> ((s, dir) =>
      Tables.embeddings(s, dir)
        .filter(col("vec_id") === 42)
        .select(col("vec_id"), col("label").cast("long").as("label"),
          size(col("embedding")).cast("long").as("dim"))),

    // ---- S4: size / live count (storage.py:261-267)
    "s4_size" -> ((s, dir) =>
      Tables.embeddings(s, dir).agg(count(lit(1)).as("n"))),

    // ---- B7: cluster stats over label groups (ivf.py:201-215)
    "b7_cluster_stats" -> ((s, dir) =>
      Tables.embeddings(s, dir)
        .groupBy("label").agg(count(lit(1)).as("c"))
        .agg(min(col("c")).as("min_size"), max(col("c")).as("max_size"),
          avg(col("c")).as("avg_size"), sum(col("c")).as("total"))),

    // ---- Extension: TPC-H Q1-style pricing summary (scale-test agg)
    // ---- TPC-H Q6 (forecasting revenue change): pure scan → filter →
    // one-row agg. The pushdown showcase — every predicate lands in the
    // parquet scan (PlanSpec asserts PushedFilters), no join, no
    // shuffle beyond the final partial-agg reduce
    "q6_forecast_revenue" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
          col("l_discount").between(0.05, 0.07) &&
          col("l_quantity") < 24)
        .agg(dSum(col("l_extendedprice") * col("l_discount"), 4)
          .as("revenue"))),

    // ---- TPC-H Q19 shape (adapted to the trimmed part schema): the
    // disjunctive-pushdown showcase — revenue under an OR of three
    // (brand, size-band, quantity-band) conjunct groups. Catalyst
    // extracts the per-side residuals of the disjunction (the brand/size
    // OR-chain reaches the part scan, the quantity OR-chain the lineitem
    // scan) so both scans prune before the join; the join itself is a
    // plain partkey equi-join AQE sizes at runtime (no hints — part is
    // SF-scaled, the round-8 lesson).
    "q19_promo_revenue" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .join(Tables.part(s, dir), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30)))
        .agg(dSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
          .as("revenue"))),

    // ---- TPC-H Q4 (order-priority checking, adapted to the trimmed
    // lineitem schema: "late" = shipped > 90 days after the order date
    // — the reference's commitdate/receiptdate pair isn't in the
    // testdata). The EXISTS showcase: a LEFT SEMI join on the orderkey
    // equi-pair with the lateness predicate as the join residual —
    // orders rows dedup at the join (no post-join distinct), lineitem
    // carries only (l_orderkey, l_shipdate) through the shuffle, and
    // the 6-month o_orderdate window prunes the probe side at the scan.
    // Both sides SF-scaled → no hints, AQE picks the physical join.
    "q4_order_priority" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
      val li = Tables.lineitem(s, dir).select("l_orderkey", "l_shipdate")
      o.join(li, col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL '90' DAY"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

    // ---- TPC-H Q18 (large-volume customers): the HAVING-subquery
    // showcase — aggregate lineitem per order (map-side-combinable
    // decimal sum), keep the >300-quantity tail (at most a few rows per
    // million orders survive, so the join back to orders/customer is a
    // tiny probe side AQE broadcasts at runtime), hydrate the report,
    // deterministic (o_totalprice DESC, o_orderkey) top-100.
    "q18_large_orders" -> ((s, dir) => {
      val big = Tables.lineitem(s, dir).groupBy("l_orderkey")
        .agg(dSum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 300)
      Tables.orders(s, dir)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"), col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
    }),

    // ---- TPC-H Q21 (suppliers who kept orders waiting, adapted:
    // "late" = shipped > 90 days after the order date). The combined
    // EXISTS + NOT EXISTS showcase: late lines LEFT SEMI self-join
    // against all lines (another supplier exists in the order) then
    // LEFT ANTI against late lines (no OTHER supplier was late) — all
    // three joins equi on l_orderkey, so a cluster co-partitions one
    // shuffle and reuses it; projections carry 3 columns per row.
    // Supplier hydration joins AFTER the per-supplier count collapses
    // the fan-in to |suppliers| rows.
    "q21_waiting_supplier" -> ((s, dir) => {
      val o = Tables.orders(s, dir).filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_orderdate")
      val li = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_suppkey", "l_shipdate")
      val late = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL '90' DAY"))
        .select(col("l_orderkey").as("lo"), col("l_suppkey").as("ls"))
      val others = li.select(col("l_orderkey").as("lo2"), col("l_suppkey").as("ls2"))
      val lateOthers = late.select(col("lo").as("lo3"), col("ls").as("ls3"))
      late
        .join(others, col("lo") === col("lo2") && col("ls") =!= col("ls2"),
          "left_semi")
        .join(lateOthers, col("lo") === col("lo3") && col("ls") =!= col("ls3"),
          "left_anti")
        .groupBy("ls").agg(count(lit(1)).as("numwait"))
        .join(Tables.supplier(s, dir), col("ls") === col("s_suppkey"))
        .select(col("s_name"), col("numwait"))
        .orderBy(col("numwait").desc, col("s_name").asc)
        .limit(20)
    }),

    "q1_pricing_summary" -> ((s, dir) => {
      val disc = col("l_extendedprice") * (lit(1) - col("l_discount"))
      val charge = disc * (lit(1) + col("l_tax"))
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dSum(col("l_quantity")).as("sum_qty"),
          dSum(col("l_extendedprice")).as("sum_base_price"),
          dSum(disc, 6).as("sum_disc_price"),
          dSum(charge, 6).as("sum_charge"),
          (dSum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          (dSum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
          (dSum(col("l_discount")) / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // ---- Extension: TPC-H Q3-style join. Orders and customer both
    // scale with SF, so neither carries a broadcast hint — AQE picks
    // broadcast at bench scale and shuffle-join past the threshold
    // (a forced broadcast of either side OOMs at 100×).
    "q3_top_revenue" -> ((s, dir) => {
      val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, dir).filter(col("o_orderdate") < lit("1998-06-01").cast("timestamp"))
      val li = Tables.lineitem(s, dir).filter(col("l_shipdate") > lit("1998-06-01").cast("timestamp"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey")
        .agg(dSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
    }),

    // ---- TPC-H Q10: returned-item revenue per customer — the classic
    // who-returned-the-most report. Orders AND customer join UNHINTED
    // (both scale with SF; AQE picks); only fixed-size nation stays a
    // broadcast dim; deterministic (revenue desc, custkey) cut
    "q10_returned" -> ((s, dir) => {
      val c = Tables.customer(s, dir)
      val n = Tables.nation(s, dir)
      val o = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1996-04-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
      Tables.lineitem(s, dir).filter(col("l_returnflag") === "R")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
          .as("revenue"), count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("c_custkey").asc)
        .limit(20)
    }),

    // ---- Extension: TPC-H Q5-style local-supplier revenue — six-way
    // join (fact lineitem; orders/customer/supplier all join UNHINTED —
    // each scales with SF, so the plan lets Catalyst/AQE pick by
    // measured size instead of forcing a broadcast that would OOM past
    // the threshold; only fixed-size nation/region stay broadcast dims;
    // the c_nationkey = s_nationkey locality predicate rides the
    // supplier join) + one group-by
    "q5_local_supplier" -> ((s, dir) => {
      val asia = Tables.region(s, dir).filter(col("r_name") === "ASIA")
      val nat = Tables.nation(s, dir)
        .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name")
      val cust = Tables.customer(s, dir)
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey"))
      val supp = Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(dSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name").asc)
    }),

    // ---- Join-type coverage: FULL OUTER with unmatched rows on BOTH
    // sides (disjoint modular filters), null-extended columns exact
    "q_outer_join" -> ((s, dir) => {
      val left = Tables.customer(s, dir).filter(col("c_custkey") % 3 === 0)
        .select(col("c_custkey").as("k"), col("c_acctbal"))
      val right = Tables.orders(s, dir).filter(col("o_custkey") % 5 === 0)
        .groupBy(col("o_custkey").as("k2"))
        .agg(count(lit(1)).as("n_orders"),
          dSum(col("o_totalprice")).as("sum_price"))
      left.join(right, col("k") === col("k2"), "full_outer")
        .select(coalesce(col("k"), col("k2")).as("custkey"),
          col("c_acctbal"), col("n_orders"), col("sum_price"))
        .orderBy("custkey")
    }),

    // ---- Extension: window top-N per group
    "q_window_rank" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    }),

    // ---- Distinct-count sketch: KMV bottom-k estimator over an
    // md5-derived uniform hash — bounded ≤k-long state, mergeable,
    // and (uniquely for an approximate aggregate) oracle-exact, since
    // DuckDB reproduces hash, sketch and estimate bit-for-bit. Exact
    // distinct rides along to document the estimation error.
    "sketch_kmv" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      Sketch.distinctEstimate(li, col("l_orderkey"), k = 256)
        .crossJoin(li.agg(countDistinct(col("l_orderkey")).as("exact_distinct")))
    }),

    // ---- Grouped KMV: per-group distinct estimates from ONE pass —
    // the sketch at its real use-site shape (GROUP BY + mergeable
    // bounded state per group); exact answer rides alongside so the
    // estimator's error is visible in the result itself
    "sketch_kmv_grouped" -> ((s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir).filter(col("user_id").isNotNull)
      val k = 64
      val est = ev.select(col("event_type"),
          graft.operators.Sketch.hash32(col("user_id")).as("__h")).as[(String, Long)]
        .groupByKey(_._1).mapValues(_._2)
        .agg(new graft.operators.Sketch.KmvAgg(k).toColumn.name("sketch"))
        .toDF("event_type", "sketch")
        .select(col("event_type"),
          graft.operators.Sketch.estimateColumn(col("sketch"), k).as("est_users"))
      val exact = ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_users"))
      est.join(exact, "event_type").orderBy("event_type")
    }),

    // ---- KMV set operations (Beyer et al. SIGMOD'07): distinct-union /
    // Jaccard / distinct-intersection estimates from two mergeable
    // sketches — the cross-shard set-overlap question count(DISTINCT)
    // can't answer without re-scanning both sides; estimator replayed
    // hash-for-hash by the oracle
    "sketch_kmv_setops" -> ((s, dir) => {
      val ev = Tables.events(s, dir).filter(col("user_id").isNotNull)
      val k = 256
      val a = Sketch.kmvSketch(
        ev.filter(col("event_type").isin("click", "view")), col("user_id"), k)
        .select(col("sketch").as("ska"))
      val b = Sketch.kmvSketch(
        ev.filter(col("event_type").isin("view", "purchase")), col("user_id"), k)
        .select(col("sketch").as("skb"))
      a.crossJoin(b).select(Sketch.setOpEstimates(col("ska"), col("skb"), k): _*)
    }),

    // ---- HyperLogLog (Flajolet et al. 2007): fixed 2^p-register
    // distinct sketch — KMV's sibling with constant state and exact
    // elementwise-max merge. Registers are integer-exact (comparison-
    // sum ρ, order-independent max), the estimate a fixed IEEE
    // expression over an exact scaled-BIGINT Σ2^−r — all replayed by
    // the oracle.
    "sketch_hll" -> ((s, dir) =>
      Sketch.hllEstimate(
        Sketch.hllSketch(Tables.events(s, dir), col("user_id"), p = 6),
        p = 6)),

    // ---- Grouped HLL: one sketch per event type in a single pass —
    // the sketch at its GROUP BY use-site (per-segment distinct users)
    "sketch_hll_grouped" -> ((s, dir) =>
      Sketch.hllEstimateGrouped(
          Sketch.hllSketchGrouped(Tables.events(s, dir), col("event_type"),
            col("user_id"), p = 6),
          p = 6)
        .withColumnRenamed("g", "event_type")
        .orderBy("event_type")),

    // ---- Trailing-window distinct users (the sliding-uniques panel a
    // product dashboard serves): hourly HLL register tables unioned by
    // register max over each trailing 6-hour window — the MERGEABILITY
    // use site: the corpus is sketched ONCE per hour, and every window
    // estimate is a bounded (#hours × 64-register) join + max, never a
    // re-scan; count(DISTINCT) would re-scan the corpus per window.
    // Estimate arithmetic is the fixed IEEE sequence of sketch_hll, so
    // the whole window composition replays exactly.
    "events_sliding_uniques" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val hourly = Sketch.hllSketchGrouped(
        ev.withColumn("hh",
          (unix_timestamp(date_trunc("hour", col("ts"))) / 3600L).cast("long")),
        col("hh"), col("user_id"), p = 6)
      val hours = hourly.select(col("g").as("h")).distinct()
      val trailing = hourly.join(hours,
          col("g") <= col("h") && col("g") > col("h") - lit(6L))
        .groupBy(col("h"), col("bucket"))
        .agg(max(col("r")).as("r"))
      Sketch.hllEstimateGrouped(trailing.withColumnRenamed("h", "g"), p = 6)
        .select(col("g").as("hour_idx"), col("est_distinct"),
          col("v_empty"), col("s_scaled"))
        .orderBy("hour_idx")
    }),

    // ---- HLL merge ≡ union (exactly, not approximately): two disjoint
    // shards sketched independently, merged by register max — the
    // estimate is BIT-IDENTICAL to sketching the union, which is what
    // the oracle computes. Per-shard sketches + lossless union is the
    // incremental-maintenance contract at 1000 executors.
    "sketch_hll_union" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val a = Sketch.hllSketch(ev.filter(col("event_id") % 2 === 0),
        col("user_id"), p = 6)
      val b = Sketch.hllSketch(ev.filter(col("event_id") % 2 === 1),
        col("user_id"), p = 6)
      Sketch.hllEstimate(Sketch.hllMerge(a, b), p = 6)
    }),

    // ---- CountMin frequency sketch (Cormode & Muthukrishnan 2005):
    // the frequency-side complement of KMV/HLL (distinct) and
    // Misra-Gries (membership) — "how often did THIS key occur" for
    // arbitrary post-hoc keys from fixed depth×width state. Registers
    // are md5-hash deterministic sums, fully oracle-replayed.
    "sketch_cms" -> ((s, dir) =>
      Sketch.cmsSketch(Tables.events(s, dir), col("user_id"),
        depth = 4, width = 256).orderBy("row", "bucket")),

    // ---- CMS point estimates vs exact counts: est ≥ exact always
    // (collisions only add) — estimator error visible in-result, the
    // sketch_kmv discipline
    "sketch_cms_estimate" -> ((s, dir) => {
      val ev = Tables.events(s, dir).filter(col("user_id").isNotNull)
      val keys = (0L until 8L).map(_.toString)
      val est = Sketch.cmsEstimate(
        Sketch.cmsSketch(ev, col("user_id"), depth = 4, width = 256),
        keys, depth = 4, width = 256)
      val exact = ev.filter(col("user_id").cast("string").isin(keys: _*))
        .groupBy(col("user_id").cast("string").as("item"))
        .agg(count(lit(1)).as("exact_cnt"))
      est.join(exact, Seq("item"), "left")
        .select(col("item"), col("est_cnt"),
          coalesce(col("exact_cnt"), lit(0L)).as("exact_cnt"))
        .orderBy("item")
    }),

    // ---- CMS merge ≡ union EXACTLY (registers are sums): two disjoint
    // shards sketched independently and merged by elementwise addition
    // replay as one whole-corpus sketch — the per-shard maintenance
    // contract, same shape as sketch_hll_union
    "sketch_cms_union" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val a = Sketch.cmsSketch(ev.filter(col("event_id") % 2 === 0),
        col("user_id"), depth = 4, width = 256)
      val b = Sketch.cmsSketch(ev.filter(col("event_id") % 2 === 1),
        col("user_id"), depth = 4, width = 256)
      Sketch.cmsMerge(a, b).orderBy("row", "bucket")
    }),

    // ---- fastText-style hashed linear classifier scoring (Joulin et
    // al. 2016): hashed uni+bigram bag → weight-sum logit, pure per-row
    // expression riding the scan — the quality/toxicity/domain
    // classifier pass of a curation pipeline. Weights are a fixed
    // deterministic vector (the engine contract is scoring, not
    // training); gram hashing and the ordered weight fold are replayed
    // exactly by the oracle
    "t_classifier_score" -> ((s, dir) =>
      Tables.documents(s, dir).select(col("doc_id"),
          TextFunctions.hashedLinearLogit(col("text"), ClassifierDim,
            classifierWeights, bias = 0.1).as("logit"))
        .withColumn("pred_keep", col("logit") > 0)
        .orderBy("doc_id")),

    // ---- Classifier TRAINING (the fastText fit, not just the apply):
    // full-batch hard-sigmoid GD over the hashed uni+bigram features,
    // labels = (lang = 'en') — fitting a language classifier from the
    // corpus's own labels. Every step is +,×,min,max doubles with
    // DECIMAL(38,18)-routed sums, so the oracle replays the ENTIRE
    // optimization unrolled (the graph_pagerank discipline applied to
    // model fitting). Output = learned weight table, bias at idx=dim.
    "t_classifier_train" -> ((s, dir) =>
      Classifier.train(Tables.documents(s, dir), "doc_id", "text",
          col("lang") === "en", ClassifierDim,
          ClassifierTrainIters, ClassifierTrainLr)
        .toDF(s).orderBy("idx")),

    // ---- Train → score composition: the learned weights feed the
    // same hashedLinearLogit the fixed-weight query uses — fit and
    // apply are one pipeline, and the oracle replays both (training
    // CTEs produce the weight list the scoring fold indexes into)
    "t_classifier_train_score" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val m = Classifier.train(docs, "doc_id", "text",
        col("lang") === "en", ClassifierDim,
        ClassifierTrainIters, ClassifierTrainLr)
      docs.select(col("doc_id"),
          TextFunctions.hashedLinearLogit(col("text"), ClassifierDim,
            m.weights.toSeq, m.bias).as("logit"))
        .withColumn("pred_keep", col("logit") > 0)
        .orderBy("doc_id")
    }),

    // ---- Persisted-model contract: train once, publish the dim+1-row
    // weight table through the crash-safe snapshot protocol, score from
    // the LOADED model (Classifier.save/load). Doubles round-trip
    // parquet exactly, so the scores are bit-identical to the fresh
    // model's — the oracle IS t_classifier_train_score's SQL. At 100 TB
    // this is the shape that stops each report refitting the GD passes.
    "t_classifier_stored_score" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val path = s"/tmp/graft_clf_model_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      Classifier.save(s, Classifier.train(docs, "doc_id", "text",
        col("lang") === "en", ClassifierDim,
        ClassifierTrainIters, ClassifierTrainLr), path)
      val m = Classifier.load(s, path)
      docs.select(col("doc_id"),
          TextFunctions.hashedLinearLogit(col("text"), ClassifierDim,
            m.weights.toSeq, m.bias).as("logit"))
        .withColumn("pred_keep", col("logit") > 0)
        .orderBy("doc_id")
    }),

    // ---- Classifier calibration (reliability table): the eval-ops
    // pass after training a quality classifier — score the corpus, cut
    // EXACT score deciles (order statistics, not sketches — the
    // radix-selection passes), and report per-decile mass and observed
    // positive rate. A well-calibrated classifier shows frac_pos
    // monotone in decile; bins are on the raw logit (no exp/sigmoid —
    // monotone, so identical bins, and no cross-libm exp risk)
    "t_calibration" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val m = Classifier.train(docs, "doc_id", "text",
        col("lang") === "en", ClassifierDim,
        ClassifierTrainIters, ClassifierTrainLr)
      val scored = docs.select(col("doc_id"), col("lang"),
        TextFunctions.hashedLinearLogit(col("text"), ClassifierDim,
          m.weights.toSeq, m.bias).as("logit"))
      val cutsRow = Sketch.exactQuantilesDisc(scored, col("logit"),
        (1 to 9).map(_ / 10.0)).head
      val cuts = (0 until 9).map(i => cutsRow.getDouble(1 + i))
      val decile = cuts.zipWithIndex.foldRight(lit(9)) { case ((c, i), acc) =>
        when(col("logit") <= c, i).otherwise(acc)
      }
      scored.groupBy(decile.cast("long").as("decile"))
        .agg(count(lit(1)).as("n"),
          (dSum(col("logit"), 12) / count(lit(1)).cast("double"))
            .as("mean_logit"),
          (sum(when(col("lang") === "en", 1L).otherwise(0L)).cast("double") /
            count(lit(1)).cast("double")).as("frac_pos"))
        .orderBy("decile")
    }),

    // ---- DSIR importance weights (Xie et al. 2023): hashed-n-gram
    // bag-of-words log-ratio model λ learned in ONE corpus pass
    // (target = lang 'en' docs, raw = whole corpus; a conditional
    // count inside the same aggregation — no second scan), scored as
    // the same gram-ordered per-row fold the classifier uses. The
    // oracle recomputes the counts, the four-ln λ, and the fold.
    "t_dsir_weight" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val m = Dsir.learn(docs, "text", col("lang") === "en", DsirDim)
      docs.select(col("doc_id"),
          Dsir.logWeight(col("text"), m).as("dsir_logw"))
        .orderBy("doc_id")
    }),

    // ---- DSIR selection: Gumbel-top-k importance resampling over the
    // learned log-weights — the full select-like-the-target pipeline
    // (fit model → score → resample without replacement), deterministic
    // in the salt, one TakeOrderedAndProject. Oracle replays the
    // Gumbel perturbation from the same md5 uniforms. The emitted
    // columns are the SELECTION plus its bit-exact log-weight, not the
    // raw Gumbel key: Math.log and libm ln disagree by 1 ulp on some
    // inputs (e.g. ln(0x1.affd60b8p-1)), which ORDER-BY selection
    // absorbs (a flip needs two independent keys within 1 ulp at the
    // cut) but a value-hash compare would not.
    "sample_dsir" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val m = Dsir.learn(docs, "text", col("lang") === "en", DsirDim)
      Dsir.resample(
          docs.select(col("doc_id"),
            Dsir.logWeight(col("text"), m).as("dsir_logw")),
          "doc_id", col("dsir_logw"), k = 100, salt = "dsir")
        .select("doc_id", "dsir_logw")
        .orderBy("doc_id")
    }),

    // ---- Z-order layout (Morton curve): the write-time clustering
    // that makes parquet zone-map skipping work on TWO predicate
    // columns at once (customer × order-date box scans). Exact BIGINT
    // bucket + bit-interleave arithmetic — the full layout (including
    // the range shuffle that becomes the write) runs, and the oracle
    // replays the z-values in closed form.
    "layout_zorder" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val dims = Seq(col("o_custkey"),
        datediff(col("o_orderdate"), lit("1970-01-01")))
      Layout.zorderBy(o, dims, bits = 16, numFiles = 8)
        .select(col("o_orderkey"), col("zval"))
        .orderBy("o_orderkey")
    }),

    // ---- Bucketed co-located join: write both fact tables bucketed
    // AND bucket-sorted on the join key (one file per bucket via the
    // aligned repartition), then join — zero Exchange, zero Sort below
    // the join (PlanSpec pins the shape). The shuffle is paid once at
    // write time; at 100 TB every recurring orders⋈lineitem join
    // becomes a per-bucket local merge instead of the pipeline's
    // dominant shuffle. Results are layout-independent, so the oracle
    // replays the plain join.
    "layout_bucketed_join" -> ((s, dir) => {
      val o = Layout.writeBucketed(
        Tables.orders(s, dir).select("o_orderkey", "o_orderpriority"),
        "graft_bk_orders", "o_orderkey", nBuckets = 16)
      val l = Layout.writeBucketed(
        Tables.lineitem(s, dir).select("l_orderkey", "l_quantity"),
        "graft_bk_lineitem", "l_orderkey", nBuckets = 16)
      o.join(l, col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), dSum(col("l_quantity")).as("sum_qty"))
        .orderBy("o_orderpriority")
    }),

    // ---- Heavy hitters: single-pass Misra-Gries candidate sweep
    // (bounded <=k counters, mergeable) + exact verification of the
    // <=k candidates. The MG membership guarantee (every item with
    // count > N/(k+1) survives the sweep) makes the composed result
    // EQUAL to the exact HAVING query no matter the fold order — an
    // approximate-sketch pipeline with an exact oracle.
    "sketch_heavy_hitters" -> ((s, dir) =>
      Sketch.heavyHitters(
        Tables.documents(s, dir)
          .select(explode(split(lower(col("text")), "\\s+")).as("word"))
          .filter(col("word") =!= ""),
        col("word"), k = 40)),

    // ---- Per-LANGUAGE heavy hitters (the per-domain top-terms report
    // beside a mixture manifest): the same MG-candidates + exact-verify
    // composition at GROUP BY granularity — membership guarantee per
    // group, so the sketch pipeline still equals the exact HAVING query
    "sketch_heavy_hitters_grouped" -> ((s, dir) =>
      Sketch.heavyHittersGrouped(
        Tables.documents(s, dir)
          .select(col("lang"),
            explode(split(lower(col("text")), "\\s+")).as("word"))
          .filter(col("word") =!= ""),
        col("lang"), col("word"), k = 40)
        .withColumnRenamed("g", "lang")),

    // ---- Window-function family: offset (lag/lead), distribution
    // (percent_rank/cume_dist), bucketing (ntile), frame-edge
    // (first_value) — one pass, one window sort, deterministic
    // (o_custkey, o_orderkey) keys
    "q_window_funcs" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey").asc)
      Tables.orders(s, dir)
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
        .withColumn("next_price", lead(col("o_totalprice"), 1).over(w))
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .withColumn("pct_rank", percent_rank().over(w))
        .withColumn("cume", cume_dist().over(w))
        .withColumn("first_price", first(col("o_totalprice")).over(w))
        .select("o_custkey", "o_orderkey", "prev_price", "next_price",
          "quartile", "pct_rank", "cume", "first_price")
        .orderBy("o_custkey", "o_orderkey")
    }),

    // ---- Sampled quantiles: exact percentiles over a deterministic
    // 10% hash sample — reproducible approximate quantiles (error from
    // the sample rate, not a sketch bound), with the exact median
    // alongside to document the estimation gap
    "sketch_quantile" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      Sketch.sampledQuantiles(o, col("o_totalprice"), col("o_orderkey"),
          probs = Seq(0.25, 0.5, 0.75, 0.95), fraction = 0.1)
        .crossJoin(o.agg(expr("percentile(o_totalprice, 0.5)").as("exact_p50")))
    }),

    // ---- Mergeable bounded-state quantile sketch — the KLL/GK slot,
    // md5-determinized: per-language length thresholds from ONE pass
    // with ≤ k rows of state per group (the per-group quality-cutoff
    // shape a 100 TB curation pipeline needs). The retained set (the k
    // hash-smallest rows per lang) is a pure function of the input
    // multiset — order/partitioning-independent — so the oracle replays
    // the sketch AND the estimate bit-for-bit; merge ≡ union and
    // idempotent-replay are gated in SketchSpec.
    "sketch_kll" -> ((s, dir) => {
      val sk = Sketch.quantileSketchGrouped(Tables.documents(s, dir),
        col("lang"), col("n_chars"), col("doc_id"), k = 256)
      Sketch.quantileEstimateGrouped(sk, Seq(0.5, 0.9, 0.99))
        .select(col("g").as("lang"), col("n_sample"),
          col("q0").as("p50"), col("q1").as("p90"), col("q2").as("p99"))
        .orderBy("lang")
    }),

    // ---- EXACT quantiles by distributed selection: the max(1,⌈p·n⌉)-th
    // smallest value (quantile_disc order statistic) per p, via six
    // bounded radix-bisection passes over the order-preserving double
    // bit image — no sort, O(|probs|·4096) state, deterministic and
    // partitioning-independent. The exact complement of sketch_kll's
    // one-pass O(1/√k) sample: the answer IS an input element, so the
    // oracle replays it with a row_number() order-statistic query.
    "sketch_quantile_exact" -> ((s, dir) =>
      Sketch.exactQuantilesDisc(Tables.documents(s, dir), col("n_chars"),
        Seq(0.01, 0.25, 0.5, 0.9, 0.99))),

    // ---- Grouped exact selection — sketch_kll's per-language cutoffs
    // with EXACT ranks: one selection state per (lang, p), six corpus
    // scans total for all groups and probs, group prefixes on a
    // broadcast join (driver state G×|probs|×4096, never expression
    // size). Direct exact-vs-sketch comparison with sketch_kll.
    "sketch_quantile_exact_grouped" -> ((s, dir) =>
      Sketch.exactQuantilesDiscGrouped(Tables.documents(s, dir),
          col("lang"), col("n_chars"), Seq(0.5, 0.9, 0.99))
        .select(col("g").as("lang"), col("n_rows"),
          col("q0").as("p50"), col("q1").as("p90"), col("q2").as("p99"))
        .orderBy("lang")),

    // ---- Data profiling: one-pass per-column statistics as tidy
    // (col_name, metric, value) rows — decimal-exact means, exact
    // distincts; the ingestion-time data-quality snapshot
    "t_profile" -> ((s, dir) =>
      Profile.profile(Tables.documents(s, dir),
        Seq("doc_id", "lang", "n_chars", "text"))),

    // ---- Time-series gap fill: dense hourly grid (types × hours
    // between the global bounds) LEFT-joined to the observed rollup,
    // missing buckets forward-filled per type (last_value IGNORE NULLS
    // over an unbounded-preceding frame). 215 genuine gaps in the
    // sf0.01 grid. Grid generation is a per-row sequence explode; the
    // fill is one window pass per type.
    "events_gapfill" -> ((s, dir) => {
      val hourly = Tables.events(s, dir)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("h"))
        .agg(dSum(col("value")).as("v"))
      val bounds = hourly.agg(min(col("h")).as("mn"), max(col("h")).as("mx"))
      val grid = hourly.select("event_type").distinct()
        .crossJoin(bounds.select(explode(
          sequence(col("mn"), col("mx"), expr("interval 1 hour"))).as("h")))
      val w = Window.partitionBy("event_type").orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(hourly, Seq("event_type", "h"), "left")
        .withColumn("v_filled", last(col("v"), ignoreNulls = true).over(w))
        .withColumn("is_gap", col("v").isNull.cast("long"))
        .select(col("event_type"),
          date_format(col("h"), "yyyy-MM-dd HH:mm:ss").as("h"),
          col("v_filled"), col("is_gap"))
        .orderBy("event_type", "h")
    }),

    // ---- Extension: event-time hourly aggregation (streaming analog)
    "events_hourly" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("h"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dSum(col("value")).as("sum_value"))
        .orderBy("h", "event_type")),

    // ---- Anomaly detection over the hourly event series: per-type
    // z-scores from EXACT integer sufficient sums (Σn, Σn² both fit
    // BIGINT; μ, σ, z are then a fixed IEEE double op sequence both
    // engines execute identically) — the monitoring query a pipeline
    // runs over its own ingest rates. Two small aggs (hours × types,
    // then types), one broadcast join back; the corpus is touched once.
    "events_anomaly" -> ((s, dir) => {
      val hourly = Tables.events(s, dir)
        .groupBy(date_format(date_trunc("hour", col("ts")),
            "yyyy-MM-dd HH:mm:ss").as("h"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      val stats = hourly.groupBy(col("event_type").as("t")).agg(
        count(lit(1)).as("hours"),
        sum(col("n")).as("s1"),
        sum(col("n") * col("n")).as("s2"))
      val mu = col("s1").cast("double") / col("hours").cast("double")
      val sigma = sqrt(col("s2").cast("double") / col("hours").cast("double")
        - mu * mu)
      val z = (col("n").cast("double") - mu) / sigma
      hourly.join(broadcast(stats), col("event_type") === col("t"))
        // zero-variance guard in EXACT integer arithmetic (σ=0 ⟺
        // Σn²·hours = (Σn)²): keeps NaN/Inf z-scores out of the result
        // on degenerate all-equal series, identically in both engines
        .filter(col("s2") * col("hours") =!= col("s1") * col("s1"))
        .select(col("h"), col("event_type"), col("n"), z.as("z"))
        .filter(abs(col("z")) > 2.0)
        .orderBy("h", "event_type")
    }),

    // ---- Product analytics: ordered first-completion funnel
    // (view → click → purchase, 24 h attribution window) — one
    // filtered user-keyed min aggregation per step, step joins share
    // the user-hash partitioning; timestamps compare as epoch micros
    "events_funnel" -> ((s, dir) =>
      Funnel.funnel(Tables.events(s, dir), "user_id", "ts", "event_type",
          Seq("view", "click", "purchase"), withinSeconds = Some(86400L))
        .select(col("user_id"),
          unix_micros(col("t1")).as("t1_us"),
          unix_micros(col("t2")).as("t2_us"),
          unix_micros(col("t3")).as("t3_us"),
          col("steps_completed"))
        .orderBy("user_id")),

    // ---- Product analytics: day-cohort retention matrix — first-seen
    // cohort per user, distinct active users per (cohort, day offset)
    "events_retention" -> ((s, dir) =>
      Funnel.retention(Tables.events(s, dir), "user_id", "ts")
        .select(date_format(col("cohort"), "yyyy-MM-dd").as("cohort"),
          col("day_offset"), col("n_users"))
        .orderBy("cohort", "day_offset")),

    // ---- Product analytics: DAU + trailing 7-day WAU — the trailing
    // distinct fans each (user, day) pair out to the window-end days it
    // supports (bounded explode on the deduped pair table), never a
    // window sort over the event stream
    "events_active_users" -> ((s, dir) =>
      Funnel.activeUsers(Tables.events(s, dir), "user_id", "ts", 7)
        .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
          col("dau"), col("wau"))
        .orderBy("day")),

    // ---- metadata_json analog: JSON extraction (storage.py:213,245)
    "events_json_extract" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .orderBy("event_id")),

    // ---- Text analysis: token/char counting over documents
    "t_token_stats" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), col("n_chars"),
          length(col("text")).cast("long").as("len"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .orderBy("doc_id")),

    // ---- Text analysis: type-token ratio (lexical diversity — the
    // template-spam / keyword-stuffing signal Gopher-class filters
    // compose with repetition fractions; low TTR = a few words looped).
    // Pure per-row array ops riding the scan, no shuffle; the space
    // split is t_token_stats' token contract, so the two signals report
    // over the identical token stream.
    "t_ttr" -> ((s, dir) => {
      val w = split(col("text"), " ")
      Tables.documents(s, dir)
        .select(col("doc_id"), size(w).cast("long").as("n_words"),
          size(array_distinct(w)).cast("long").as("n_distinct"))
        .withColumn("ttr",
          col("n_distinct").cast("double") / col("n_words"))
        .orderBy("doc_id")
    }),

    // ---- Dedup (exact): content-hash grouping, keep-first
    "dedup_exact" -> ((s, dir) =>
      Tables.documents(s, dir)
        .groupBy(md5(col("text")).as("text_hash"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("text_hash")),

    // ---- O2+S2: kNN with hydration join (the reference's /search result
    // assembly: index hits → storage rows, hnsw.py:368-373)
    "q2_knn_hydrated" -> ((s, dir) => {
      val topk = withQuery(s, dir)
        .select(col("vec_id"), l2(col("embedding"), col("qe")).as("dist"))
        .orderBy(col("dist").asc, col("vec_id").asc).limit(10)
      val docs = Tables.documents(s, dir)
      topk.join(docs, topk("vec_id") === docs("doc_id"), "left")
        .select(col("vec_id"), col("dist"), col("lang"))
        .orderBy(col("dist").asc, col("vec_id").asc)
    }),

    // ---- Dedup (MinHash+LSH): shingle → minhash → band → bucket-join.
    // The hot-bucket guard stays ON (the 100 TB-safe default) and the
    // oracle mirrors the same ≤ maxBucket cutoff — the guarded
    // configuration is the demonstrated one, as dedup_editdist does
    // with its stopgram cutoff.
    "dedup_minhash_lsh" -> ((s, dir) =>
      Dedup.minhashLshPairs(Tables.documents(s, dir), "doc_id", "text",
        numHashes = 8, bands = 4, shingle = 3,
        maxBucket = DedupMaxBucket).orderBy("a", "b")),

    // ---- Dedup (incremental, cross-corpus): a new ingest batch
    // (doc_id % 7 = 0) deduped AGAINST the existing corpus (the rest) —
    // cross-side pairs only, so per-batch work scales with the batch,
    // never re-pairing the corpus against itself (the streaming-flush
    // dedup shape at 100 TB)
    "dedup_incremental" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.minhashLshPairsAgainst(
        docs.filter(col("doc_id") % 7 === 0),
        docs.filter(col("doc_id") % 7 =!= 0),
        "doc_id", "text", numHashes = 8, bands = 4, shingle = 3,
        maxBucket = DedupMaxBucket).orderBy("new_id", "old_id")
    }),

    // ---- Dedup (n-gram Jaccard): inverted-index pair join. Stopgram
    // cutoff ON (df ≤ maxDocFreq universe filter), mirrored in the
    // oracle's keepg CTE — guarded is the demonstrated configuration.
    "dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccardPairs(Tables.documents(s, dir), "doc_id", "text",
        n = 3, threshold = 0.5, maxDocFreq = DedupMaxDocFreq).orderBy("a", "b")),

    // ---- Dedup (fuzzy, character-level): character-5-gram Jaccard
    // candidate screen + exact Levenshtein gate — both engines run
    // textbook edit distance, so the two-stage fuzzy-dedup recipe is
    // oracle-exact end-to-end. The df≤100 stopgram cutoff (mirrored in
    // the oracle) is the 100 TB-safe shape: without it ubiquitous
    // grams explode the inverted index (measured 769M candidate pairs
    // at sf0.1 exhaustive vs 152k guarded).
    "dedup_editdist" -> ((s, dir) =>
      Dedup.editDistancePairs(Tables.documents(s, dir), "doc_id", "text",
        maxDist = 5, candidateThreshold = 0.3, n = 5,
        maxDocFreq = 100).orderBy("a", "b")),

    // ---- Dedup (substring-level): winnowing-fingerprint shared-passage
    // pairs — repeated passages >= window+gramLen-1 = 49 chars always
    // surface (the SIGMOD'03 guarantee); a shared fingerprint certifies
    // a shared 40-char substring, so the pipeline is oracle-exact
    "dedup_shared_passage" -> ((s, dir) =>
      Dedup.sharedPassagePairs(Tables.documents(s, dir), "doc_id", "text",
        gramLen = 40, window = 10).orderBy("a", "b")),

    // ---- Graph analytics: PageRank over the near-dup pair graph —
    // 5 power iterations, decimal-routed neighbor sums so the iterative
    // computation is hash-exact vs the oracle's unrolled SQL. Rank
    // orders cluster members by connectivity (authority-based canonical
    // pick, complementing keepBestInCluster's quality argmax).
    "graph_pagerank" -> ((s, dir) => {
      val pairs = Dedup.ngramJaccardPairs(Tables.documents(s, dir), "doc_id",
        "text", n = 3, threshold = 0.5, maxDocFreq = DedupMaxDocFreq)
      PageRank.run(pairs, iters = 5)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    }),

    // ---- Dedup clustering: connected components over the Jaccard pair
    // graph (iterative min-label propagation; oracle is a DuckDB
    // recursive CTE over the identical pair SQL). Upgrades pair-based
    // keep-first to transitive cluster-canonical semantics.
    "dedup_clusters" -> ((s, dir) => {
      val pairs = Dedup.ngramJaccardPairs(Tables.documents(s, dir), "doc_id",
        "text", n = 3, threshold = 0.5, maxDocFreq = DedupMaxDocFreq)
      Dedup.connectedComponents(pairs).orderBy("id")
    }),

    // ---- Graph structure of the near-dup pair graph: triangles +
    // local clustering coefficients (degree-oriented wedge join — the
    // Suri-Vassilvitskii skew killer; triangle-rich components are true
    // duplicate families, triangle-free stars are hub false-matches)
    "graph_triangles" -> ((s, dir) => {
      val pairs = Dedup.ngramJaccardPairs(Tables.documents(s, dir), "doc_id",
        "text", n = 3, threshold = 0.5, maxDocFreq = DedupMaxDocFreq)
      Triangles.perVertex(pairs, "a", "b")
        .select(col("id").as("doc_id"), col("deg"), col("n_tri"), col("coeff"))
        .orderBy("doc_id")
    }),

    // ---- Dedup (cluster representative by quality): survivors are all
    // unclustered docs + each cluster's best-quality member (tie → min
    // id) — curation-grade near-dup removal where survival follows
    // quality, not id order
    "dedup_cluster_best" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .withColumn("quality", TextFunctions.qualityScore(col("text")))
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.5, maxDocFreq = DedupMaxDocFreq)
      Dedup.keepBestInCluster(docs, "doc_id", "quality",
          Dedup.connectedComponents(pairs))
        .select("doc_id", "quality").orderBy("doc_id")
    }),

    // ---- Dedup pipeline flagship: screen → components → cluster-best
    // keep flag → leakage-safe split, ONE query. The three standalone
    // queries above each pay the pair screen by contract; the pipeline
    // shape computes pairs ONCE (they feed only connectedComponents,
    // whose checkpointed labels all three products then share — the
    // bench plan-audit note about the trio recomputing the screen,
    // answered as a composition). Output: per-doc disposition record
    // (comp, quality, keep, split) — what a curation run actually
    // writes next to the corpus.
    "pipeline_dedup_full" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
        .withColumn("quality", TextFunctions.qualityScore(col("text")))
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.5, maxDocFreq = DedupMaxDocFreq)
      val comps = Dedup.connectedComponents(pairs)
      val kept = Dedup.keepBestInCluster(docs, "doc_id", "quality", comps)
        .select(col("doc_id").as("__keep_id"))
      Sampling.splitByCluster(docs, "doc_id", comps,
          Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
        .join(comps.select(col("id").as("__c_id"), col("comp")),
          col("doc_id") === col("__c_id"), "left")
        .join(kept, col("doc_id") === col("__keep_id"), "left")
        .select(col("doc_id"),
          coalesce(col("comp"), col("doc_id")).as("comp"),
          col("quality"),
          col("__keep_id").isNotNull.as("keep"),
          col("split"))
        .orderBy("doc_id")
    }),

    // ---- Dedup (boilerplate): CCNet-style segment-level removal — drop
    // segments occurring in ≥ minDocFreq distinct docs, reassemble the
    // rest in order. Testdata docs are single-line, so the query
    // segments on " " (word granularity); the operator's delim covers
    // line-level for real corpora.
    "dedup_boilerplate" -> ((s, dir) =>
      Dedup.boilerplateRemove(Tables.documents(s, dir), "doc_id", "text",
        delim = " ", minDocFreq = 390L).orderBy("doc_id")),

    // ---- Dedup (SimHash): sign-sum fingerprint. The md5-bit variant is
    // cross-engine reproducible, so the full 64-bit fingerprint is
    // oracle-checked (the xxhash64 bigint variant stays library-side
    // for cheap hamming screening; DedupSpec covers it)
    "dedup_simhash" -> ((s, dir) =>
      Dedup.simhashMd5Hex(Tables.documents(s, dir), "text")
        .select("doc_id", "simhash").orderBy("doc_id")),

    // ---- tf-weighted SimHash (the Manku'07 production form): same bit
    // build over the token MULTISET — every occurrence adds ±1, exact
    // integer term-frequency weights
    "dedup_simhash_weighted" -> ((s, dir) =>
      Dedup.simhashWeightedMd5Hex(Tables.documents(s, dir), "text")
        .select("doc_id", "simhash").orderBy("doc_id")),

    // ---- SimHash near-dup pairs: 56 bits of the oracle-exact md5
    // fingerprint (first 14 hex chars, parsed identically by both
    // engines) fed through the SAME blocked Hamming screen as image
    // dHash (one screen, two modalities) — text near-dup detection the
    // Manku WWW'07 way, pairs + distances hash-checked against the
    // oracle's all-pairs join over its own recomputed fingerprints.
    // nBlocks = 8 (56 tables keyed on 35 bits), not the textbook-
    // minimum 4: at the sf1 tier's duplication density the 14-bit band
    // buckets of nBlocks = 4 blow past maxBucket, the guard drops them,
    // and the screen under-reports vs the all-pairs oracle (25.6M of
    // 29.2M pairs) — the scaladoc's own "raise nBlocks at corpus
    // scale" knob, now exercised by the flagship query. Identical
    // output at every SF where no bucket degenerates (all gate SFs).
    "dedup_simhash_neardup" -> ((s, dir) =>
      Dedup.hammingNearDupPairs(
        Dedup.simhashMd5Hex(Tables.documents(s, dir), "text")
          .select(col("doc_id"),
            conv(substring(col("simhash"), 1, 14), 16, 10).cast("long")
              .as("h56")),
        "doc_id", "h56", maxDist = 3, hashBits = 56, nBlocks = 8)
        .orderBy("a", "b")),

    // ---- SemDeDup (Abbas et al. 2023): semantic dedup via embedding
    // clusters — within-cluster cosine pairs only (the paper's O(Σ|c|²)
    // reduction; at persisted scale a cluster-partition-local join),
    // components, keep the LEAST-prototypical member (lowest cosine to
    // its centroid, ties → min id). Fixed deterministic centroids make
    // every stage — assignment argmin, pair cosines, component walk,
    // keeper argmin — hash-exact vs the oracle.
    "dedup_semantic" -> ((s, dir) => {
      val model = Ivf.Model(fixedIvfCentroids, "embedding")
      Dedup.semDedup(Tables.embeddings(s, dir), "vec_id", "embedding", model,
          threshold = 0.45)
        .select(col("vec_id"), col("keep_id"),
          col(Ivf.ClusterCol).cast("long").as("cluster_id"), col("cos_centroid"))
        .orderBy("vec_id")
    }),

    // ---- ANN extension: embedding-cosine near-duplicate pairs
    "ann_cosine_neardup" -> ((s, dir) =>
      Dedup.cosineNearDupPairs(Tables.embeddings(s, dir), "vec_id", "embedding",
        threshold = 0.45).orderBy("a", "b")),

    // ---- Text analysis: language ID (marker-word heuristic)
    "t_langid" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), TextFunctions.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")),

    // ---- Text analysis: quality signals + score
    "t_quality" -> ((s, dir) => {
      val sig = TextFunctions.qualitySignals(col("text"))
      Tables.documents(s, dir).select(
        col("doc_id"), sig("n_tokens_q").as("n_tokens_q"),
        sig("punct_ratio").as("punct_ratio"),
        sig("stopword_ratio").as("stopword_ratio"),
        TextFunctions.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")
    }),

    // ---- Text analysis: character-level Shannon entropy (the
    // gibberish / keyboard-mash / binary-spill quality signal — near 0
    // for repeated chars, ~log|alphabet| for uniform noise, prose in a
    // narrow band between). The codegen CharEntropy kernel computes the
    // per-doc code-point histogram in a per-row TreeMap and folds
    // Σ c·ln(c) in ascending code-point order — one linear pass riding
    // the scan, where the SQL formulation shuffles ~n_chars (doc, char)
    // rows; the oracle pays that shuffle to replay the identical IEEE
    // sequence (see EntropyUtil's determinism contract).
    "t_entropy" -> ((s, dir) =>
      Tables.documents(s, dir)
        .filter(col("text").isNotNull && length(col("text")) > 0)
        .select(col("doc_id"), length(col("text")).cast("long").as("n_cp"),
          TextKernels.charEntropy(col("text")).as("h_nats"))
        .withColumn("h_bits", col("h_nats") / lit(0.6931471805599453))
        .orderBy("doc_id")),

    // ---- Curation: multi-pattern blocklist gate (C4 / Raffel et al.
    // 2020 §2.2 — drop any page containing a listed word or phrase;
    // production lists run to thousands of entries). ONE Aho-Corasick
    // automaton pass per row riding the scan — per-row cost independent
    // of |patterns|, where the naive plan rescans the text once per
    // pattern (the 1M×2000-pattern probe measures that gap). The
    // pattern list includes a nested pair and overlapping phrases so
    // the oracle pins the automaton's fail-closure outputs, and the
    // report keeps WHICH patterns hit (the audit trail a silent gate
    // loses).
    "t_blocklist" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          TextFunctions.blocklistMatches(col("text"), BlockPatterns).as("hits"))
        .filter(size(col("hits")) > 0)
        .select(col("doc_id"), size(col("hits")).cast("long").as("n_hits"),
          array_join(col("hits"), "|").as("matched"))
        .orderBy("doc_id")),

    // ---- The WORD-BOUNDED blocklist gate — the composition the kernel
    // scaladoc names instead of a boundary flag: collapse non-alnum
    // runs to single spaces (lowercased), pad the text ends, and
    // space-pad every pattern; `windo` in the list proves the
    // semantics (as a substring it would hit every `window`). The
    // normalization is one regexp per row riding the scan; the
    // automaton pass is unchanged.
    "t_blocklist_words" -> ((s, dir) => {
      val padded = WordBlockPatterns.map(p => s" $p ")
      Tables.documents(s, dir)
        .withColumn("t", concat(lit(" "),
          regexp_replace(lower(col("text")), "[^a-z0-9]+", " "), lit(" ")))
        .select(col("doc_id"),
          TextFunctions.blocklistMatches(col("t"), padded).as("hits"))
        .filter(size(col("hits")) > 0)
        .select(col("doc_id"), size(col("hits")).cast("long").as("n_hits"),
          array_join(transform(col("hits"), h => trim(h)), "|").as("matched"))
        .orderBy("doc_id")
    }),

    // ---- Text analysis: Gopher-style repetition signals (word-level
    // dup fractions + top-bigram coverage; per-row scan, no shuffle)
    "t_repetition" -> ((s, dir) => {
      val sig = TextFunctions.repetitionSignals(col("text"))
      Tables.documents(s, dir).select(
        col("doc_id"), sig("n_tokens").as("n_tokens"),
        sig("dup_word_frac").as("dup_word_frac"),
        sig("dup_3gram_frac").as("dup_3gram_frac"),
        sig("top_bigram_frac").as("top_bigram_frac"))
        .orderBy("doc_id")
    }),

    // ---- Curation: Gopher quality rules (Rae et al. 2021 §A1.1) —
    // per-row signal block + verdict, no shuffle. Word bounds sit
    // inside the corpus's 10-99-word range and the required-stopword
    // floor is 1 (this corpus carries only "the"/"a"-class function
    // words), so both verdicts appear; every other knob is the paper's
    // published threshold.
    "t_gopher_rules" -> ((s, dir) => {
      val sig = Curation.gopherSignals(col("text"))
      Tables.documents(s, dir).select(
        col("doc_id"), sig("n_words").as("n_words"),
        sig("mean_word_len").as("mean_word_len"),
        sig("symbol_word_ratio").as("symbol_word_ratio"),
        sig("bullet_line_frac").as("bullet_line_frac"),
        sig("ellipsis_line_frac").as("ellipsis_line_frac"),
        sig("alpha_word_frac").as("alpha_word_frac"),
        sig("stop_hits").as("stop_hits"),
        Curation.gopherPass(col("text"), minWords = 30L, maxWords = 90L,
          minStopHits = 1L).as("gopher_pass"))
        .orderBy("doc_id")
    }),

    // ---- Curation: C4 line rules (Raffel et al. 2020 §2.2) over
    // 8-word windows (the line proxy for a newline-less corpus — most
    // docs' tail window falls under the 5-word floor, so both line
    // verdicts fire); terminal punctuation waived (corpus has none),
    // doc-level lorem-ipsum/brace drops active. Pure per-row scan.
    "t_c4_clean" -> ((s, dir) =>
      Curation.c4CleanLines(Tables.documents(s, dir), "doc_id",
        Curation.wordWindows(col("text"), 8), minWords = 5,
        requirePunct = false).orderBy("doc_id")),

    // ---- Curation: corpus-global exact line dedup (C4 §2.2 span
    // dedup / RefinedWeb §3.3) over 4-word windows — the ~40-word
    // vocabulary makes cross-document window collisions the common
    // case, so most of the corpus dedups away. One content-keyed
    // map-side-combinable aggregation shuffle + winner semi-join +
    // per-doc reassembly; no corpus-wide window sort.
    "dedup_lines_global" -> ((s, dir) =>
      Curation.globalLineDedup(Tables.documents(s, dir), "doc_id",
        Curation.wordWindows(col("text"), 4)).orderBy("doc_id")),

    // ---- Curation: exact duplicated-span removal (Lee et al. 2021
    // ExactSubstr at 5-word resolution, the gram-cover construction) —
    // every ≥5-word span occurring more than once in the corpus
    // survives only at its global (doc, position) first occurrence;
    // overlapping covered grams merge into maximal removed intervals.
    "dedup_span_exact" -> ((s, dir) =>
      Curation.exactSpanDedup(Tables.documents(s, dir), "doc_id", "text", 5)
        .orderBy("doc_id")),

    // ---- Char-level ExactSubstr (Lee'21 §4.1 operates on raw bytes,
    // not word arrays): the gram-cover span dedup at character
    // granularity — catches duplicated passages word tokenization
    // splits differently. 30-char grams ≈ the word version's 5-gram
    // span scale.
    "dedup_span_chars" -> ((s, dir) =>
      Curation.exactSpanDedupChars(Tables.documents(s, dir), "doc_id", "text", 30)
        .orderBy("doc_id")),

    // Sharded twin of the char screen — the path users actually run at
    // corpus-bytes scale (peak shuffle state ÷ shards): hash-range
    // passes over the gram key, union ≡ unsharded row-for-row, so the
    // SAME DuckDB oracle gates it every round (not only CurationSpec).
    "dedup_span_chars_sharded" -> ((s, dir) => {
      val spill = java.nio.file.Files
        .createTempDirectory("graft_span_shards").toString
      Curation.exactSpanDedupCharsSharded(Tables.documents(s, dir),
        "doc_id", "text", 30, shards = 3, spillDir = spill)
        .orderBy("doc_id")
    }),

    // ---- Sampling: fixed-size per-stratum deterministic sample (the
    // quota shape — exactly n per lang; WindowGroupLimit partial)
    "sample_stratified" -> ((s, dir) =>
      Sampling.stratifiedFixed(Tables.documents(s, dir), Seq("lang"), "doc_id", 20)
        .select("doc_id", "lang").orderBy("lang", "doc_id")),

    // ---- Sampling: mixture construction — per-source quotas (the
    // domain-mixing step; src0's quota exceeds its stratum size to
    // exercise the min(quota, |s|) clamp, unlisted sources drop)
    "sample_mixture" -> ((s, dir) =>
      Sampling.mixtureSample(Tables.documents(s, dir), "source", "doc_id",
          Map("src0" -> 40L, "src1" -> 10L, "src2" -> 5L, "src5" -> 7L))
        .select("doc_id", "source").orderBy("source", "doc_id")),

    // ---- Sampling: temperature-balanced mixture — per-language quotas
    // ∝ √n_s (the multilingual n^α downsampling at α = 0.5), computed
    // in exact integer arithmetic (isqrt + integral divide) so the
    // oracle replays the quota derivation AND the selection bit-exactly
    "sample_temperature" -> ((s, dir) =>
      Sampling.temperatureSample(Tables.documents(s, dir), "lang",
          "doc_id", k = 200L)
        .select("doc_id", "lang").orderBy("doc_id")),

    // ---- Sampling: epoch-based upsampling (the repeat-factor half of
    // domain mixing — 2.25 epochs of src0, half of src1, one of src2;
    // fractional epochs select deterministically by salted hash)
    "sample_upsample" -> ((s, dir) =>
      Sampling.upsample(Tables.documents(s, dir), "source", "doc_id",
          Map("src0" -> 2.25, "src1" -> 0.5, "src2" -> 1.0))
        .select("doc_id", "source", "epoch")
        .orderBy("doc_id", "epoch")),

    // ---- Sampling: Bernoulli-by-hash (row-level agreement of the hash)
    "sample_hash_frac" -> ((s, dir) =>
      Sampling.hashFraction(Tables.documents(s, dir), "doc_id", 0.25)
        .select("doc_id").orderBy("doc_id")),

    // ---- Sampling: weighted without replacement (A-ES priority keys;
    // libm-exact ln makes the keys — hence the selected set — oracle-
    // exact). Weight = document length: the "sample long docs more"
    // curation move.
    "sample_weighted" -> ((s, dir) =>
      Sampling.weightedSample(Tables.documents(s, dir), "doc_id",
          "n_chars", k = 100)
        .select("doc_id", "es_key")),

    // ---- Sampling: per-stratum weighted sample (A-ES ranked inside
    // each language — the per-domain weighted selection a mixture
    // pipeline runs after setting quotas)
    "sample_weighted_grouped" -> ((s, dir) =>
      Sampling.weightedSampleGrouped(Tables.documents(s, dir), "lang",
          "doc_id", "n_chars", k = 20)
        .select("doc_id", "lang", "es_key").orderBy("doc_id")),

    // ---- Sampling: deterministic train/val/test split (weights chosen
    // binary-exact so the cumulative cuts are bit-identical in SQL)
    "sample_hash_split" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(Sampling.splitColumn(col("doc_id"),
          Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125)).as("split"))
        .groupBy("split").agg(count(lit(1)).as("n")).orderBy("split")),

    // ---- Sampling: leakage-safe split — every near-dup cluster
    // (connected component of the Jaccard pair graph) lands wholly on
    // one side, keyed by the cluster's canonical min-id member;
    // unclustered docs split by their own id, identical to
    // sample_hash_split. The contamination guard an eval pipeline needs:
    // a doc and its near-twin can never straddle train/test.
    "sample_split_cluster" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.5, maxDocFreq = DedupMaxDocFreq)
      Sampling.splitByCluster(docs, "doc_id",
          Dedup.connectedComponents(pairs),
          Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
        .select("doc_id", "split").orderBy("doc_id")
    }),

    // ---- Diversity selection: greedy k-center (farthest-point) over
    // the embedding corpus — the coreset pick that COVERS the space
    // with a budget (the opposite pole from SemDeDup's redundancy
    // pruning). Deterministic trajectory (min-id seed, id tie-break,
    // sequential double fold), so the oracle replays all 8 rounds
    // exactly as unrolled SQL.
    "sample_kcenter" -> ((s, dir) =>
      Diversity.kCenter(Tables.embeddings(s, dir), "vec_id", "embedding",
        k = 8)),

    // ---- Diversity cover: every row labeled with its nearest selected
    // center (first-match squared-distance argmin, the NearestCentroid
    // kernel) — the cover structure for diversity-stratified sampling
    "sample_kcenter_cover" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val sel = Diversity.kCenter(emb, "vec_id", "embedding", k = 8)
        .orderBy("sel_rank").collect().map(_.getLong(1))
      val embById = emb.filter(col("vec_id").isin(sel.map(Long.box): _*))
        .select("vec_id", "embedding").collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
      Diversity.assignToCenters(emb, "vec_id", "embedding",
          sel.map(i => (i, embById(i))))
        .orderBy("vec_id")
    }),

    // ---- Per-IVF-cell k-center — the large-k scale composition
    // (kCenter is k sequential driver rounds; this runs every cell's
    // greedy in parallel under a mass-proportional budget). Fixed
    // centroids make assignment + apportionment + every per-cell round
    // oracle-exact as unrolled SQL.
    "sample_kcenter_cells" -> ((s, dir) =>
      Diversity.kCenterPerCell(Tables.embeddings(s, dir), "vec_id",
          "embedding", k = 16, Ivf.Model(fixedIvfCentroids, "embedding"))
        .select(col("cell").cast("long").as("cell"), col("sel_rank"),
          col("vec_id"), col("dist"))
        .orderBy("cell", "sel_rank")),

    // ---- Deterministic epoch shuffle: per-epoch pseudorandom corpus
    // order (the key IS the order — distributed range sort, no global
    // row index); reproducible and engine-exact via md5
    "sample_epoch_shuffle" -> ((s, dir) =>
      Sampling.epochShuffle(Tables.documents(s, dir).select("doc_id"),
        "doc_id", epoch = 3)),

    // ---- Text analysis: min-shingle document fingerprint
    "t_fingerprint" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")),

    // ---- URL canonicalization + host census (the URL-level dedup
    // precursor — C4 keeps one page per URL; RefinedWeb §3.1 dedups the
    // frontier by normalized URL — and the per-host quota key). URLs
    // are planted deterministically with the messes canonicalization
    // exists for: mixed-case schemes/hosts, userinfo, default and
    // non-default ports, fragments, query strings, and a bare non-URL
    // string. Canon + host are pure regexp column expressions riding
    // the scan; the oracle spells identical RE2∩Java patterns (each
    // matching at most once, so replace-first ≡ replace-all).
    "t_url_canon" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val url = plantedUrl
      val canon = Curation.canonicalizeUrl(url)
      docs.select(col("doc_id"), url.as("url"), canon.as("canon"),
          Curation.urlHost(canon).as("host"))
        .orderBy("doc_id")
    }),

    // ---- URL-level dedup (one page per canonical URL — C4's very
    // first pass, BEFORE any content is fetched or compared): the same
    // planted corpus as t_url_canon, keep the LOWEST doc_id per
    // canonical URL. One hash aggregation on the canon key (map-side
    // combined, ~50 B/row shuffle regardless of page size) + a
    // left-semi join back — the exact dedup_exact shape with the
    // canonicalizer supplying the key, which is the point: URL dedup
    // IS exact dedup over a normalized key column.
    "dedup_url" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val url = plantedUrl
      val keyed = docs.select(col("doc_id"),
        Curation.canonicalizeUrl(url).as("canon"))
      val keepers = keyed.groupBy(col("canon"))
        .agg(min(col("doc_id")).as("keep_id"))
      keyed.join(keepers,
          keyed("doc_id") === keepers("keep_id"), "left_semi")
        .select(col("doc_id"), col("canon"))
        .orderBy("doc_id")
    }),

    // ---- S1: upsert (update-in-place + insert, storage.py:198-230)
    "s1_upsert" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val updates = docs.filter(col("doc_id") < 10)
        .select(col("doc_id"), lit("UPDATED").as("text"))
      Crud.upsert(docs, updates, "doc_id")
        .filter(col("doc_id") < 20).orderBy("doc_id")
    }),

    // ---- S5/B2: tombstone delete + compaction
    "s5_delete_compact" -> ((s, dir) =>
      Crud.compact(Crud.tombstone(Tables.documents(s, dir), "doc_id", Seq(0L, 1L, 2L, 3L, 4L)))
        .select("doc_id", "lang").orderBy("doc_id")),

    // ---- S6: next-id assignment (max+1, storage.py:276-280)
    "s6_next_id" -> ((s, dir) =>
      Tables.embeddings(s, dir)
        .agg(coalesce(max(col("vec_id")) + 1, lit(0)).cast("long").as("next_id"))),

    // ---- S1/S5 through the FACADE's delta-log layout (round 14): a
    // full mutation lifecycle — ingest (delta append, reserve-then-
    // write ids) → delete (tombstone delta) → compact (fold +
    // physical drop) → second ingest (next-id high-water continues) —
    // and the merged read must equal the plain SQL the oracle runs.
    // Output is content-keyed (ids are engine-internal).
    "s1_store_delta_roundtrip" -> ((s, dir) => withShufflePartitions(s, 8) {
      val tmp = scratchDir("graft_s1store")
      val store = VectorStore.open(s, tmp, dim = 2)
      val docs = Tables.documents(s, dir)
      def rowsFor(pred: Column) = docs.filter(pred)
        .select(array(lit(0.0f), lit(1.0f)).as("embedding"),
          col("text").as("content"))
      store.ingest(rowsFor(col("doc_id") < 200))
      // delete every doc whose content starts with 'a' (ids resolved
      // through the store, the facade's own lookup path)
      val delIds = store.snapshot()
        .filter(col("content").startsWith("a"))
        .select("id").collect().map(_.getLong(0)).toSeq
      store.delete(delIds)
      store.compact()
      store.ingest(rowsFor(col("doc_id") >= 200 && col("doc_id") < 250))
      store.snapshot().filter(!col("is_deleted"))
        .select("content").orderBy("content")
    }),

    // ---- B4: IVF build — cluster size histogram (rows-only: KMeans)
    "b4_ivf_build" -> ((s, dir) => {
      val (assigned, _) = Ivf.build(Tables.embeddings(s, dir), "embedding", k = 8)
      assigned.groupBy(col(Ivf.ClusterCol)).agg(count(lit(1)).as("n"))
        .orderBy(Ivf.ClusterCol)
    }),

    // ---- B4 oracle twin: one Lloyd refinement step from the fixed
    // deterministic centroids — assignment argmin + per-(cluster, dim)
    // sum/count/mean, folded in vec_id order so the doubles are
    // bit-exact. Pins the k-means UPDATE arithmetic the way
    // o6_ivf_fixed pins the assignment/probe side.
    "b4_lloyd_fixed" -> ((s, dir) => {
      val model = Ivf.Model(fixedIvfCentroids, "embedding")
      Ivf.lloydStepOrdered(
          Ivf.assign(Tables.embeddings(s, dir), model), "vec_id", "embedding")
        .orderBy("cluster_id", "dim_pos")
    }),

    // ---- B4 hierarchical twin: the two-level coarse quantizer's
    // ASSIGNMENT (super argmin, then child argmin within the chosen
    // super, global contiguous ids) over a fixed deterministic
    // supers/children geometry — oracle-exact, pinning the
    // TwoLevelNearestCentroidFloat kernel the way o6_ivf_fixed pins
    // the flat argmin. The seeded buildHier path is recall-gated in
    // IvfSpec/ScaleProbe; the arithmetic is pinned here.
    "b4_hier_fixed" -> ((s, dir) => {
      Ivf.assignHier(Tables.embeddings(s, dir), fixedHierModel)
        .select(col("vec_id"),
          col(Ivf.ClusterCol).cast("long").as("cluster_id"))
        .orderBy("vec_id")
    }),

    // ---- O6: IVF n_probe pruned search (rows-only: KMeans)
    "o6_ivf_search" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") === QueryVecId)
        .select("embedding").head.getSeq[Float](0).toSeq
      val (assigned, model) = Ivf.build(emb, "embedding", k = 8)
      Ivf.search(assigned, model, "vec_id", q, nProbe = 3, topK = 10)
        .select("vec_id", "dist")
    }),

    // ---- O6 end-to-end: search a PERSISTED cluster-partitioned table —
    // probing is literal parquet partition pruning (rows-only)
    "o6_ivf_partitioned" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") === QueryVecId)
        .select("embedding").head.getSeq[Float](0).toSeq
      val (assigned, model) = Ivf.build(emb, "embedding", k = 8)
      val path = s"/tmp/graft_ivf_partitioned_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      Ivf.writePartitioned(assigned, path)
      Ivf.search(s.read.parquet(path), model, "vec_id", q, nProbe = 3, topK = 10)
        .select("vec_id", "dist")
    }),

    // ---- O6 with n_probe = k: exhaustive probe ≡ brute-force kNN, so the
    // IVF search path itself is oracle-checked (the recall-traded pruned
    // variants stay rows-only)
    "o6_ivf_exhaustive" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") === QueryVecId)
        .select("embedding").head.getSeq[Float](0).toSeq
      val (assigned, model) = Ivf.build(emb, "embedding", k = 8)
      Ivf.search(assigned, model, "vec_id", q, nProbe = model.k, topK = 10)
        .select("vec_id", "dist")
    }),

    // ---- O6 through the HIERARCHICAL build with n_probe = k:
    // exhaustive probe ≡ brute-force kNN regardless of centroid
    // placement, so the whole two-level chain (super fit → distributed
    // per-group child fits → two-level assignment → flat-view search)
    // is oracle-checked end to end.
    "o6_hier_exhaustive" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") === QueryVecId)
        .select("embedding").head.getSeq[Float](0).toSeq
      val (assigned, hm) = Ivf.buildHier(emb, "embedding", k = 9)
      Ivf.search(assigned, hm.flat, "vec_id", q, nProbe = hm.k, topK = 10)
        .select("vec_id", "dist")
    }),

    // ---- O7 through the IVF path: metadata filter composes BEFORE the
    // pruned scan (pushdown below the probe filter); exhaustive probe
    // makes it oracle-exact
    "o7_ivf_filtered" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") === QueryVecId)
        .select("embedding").head.getSeq[Float](0).toSeq
      val (assigned, model) = Ivf.build(emb, "embedding", k = 8)
      Ivf.search(assigned, model, "vec_id", q, nProbe = model.k, topK = 10,
          filter = Some(col("label") === 3))
        .select(col("vec_id"), col("label").cast("long").as("label"), col("dist"))
    }),

    // ---- kNN join through the IVF-bucketed scale path, exhaustive probe:
    // must equal the brute-force kNN join bit-for-bit (oracle-checked)
    "o2_knn_join_ivf" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val queries = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
      val (assigned, model) = Ivf.build(emb, "embedding", k = 8)
      Search.knnJoinIvf(assigned, model, "vec_id", queries, "qid", "qemb",
          k = 5, nProbe = model.k)
        .select(col("query_id"), col("neighbor_id"), col("dist"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),

    // ---- B5: IVF incremental add — nearest-centroid assignment
    "b5_ivf_add" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val (_, model) = Ivf.build(emb, "embedding", k = 8)
      val newRows = emb.filter(col("vec_id") < 5)
        .select((col("vec_id") + 10000).as("vec_id"), col("embedding"))
      Ivf.assign(newRows, model).select("vec_id", Ivf.ClusterCol).orderBy("vec_id")
    }),

    // ---- B8: PQ codebook training (rows-only: KMeans)
    "b8_pq_train" -> ((s, dir) => {
      val cb = Pq.train(Tables.embeddings(s, dir), "embedding",
        dim = 64, chunks = 8, k = 16)
      import s.implicits._
      // centroid stringified: rows-only check, and the verify harness
      // sorts output rows with pandas, which can't sort array cells
      cb.centroids.zipWithIndex.flatMap { case (cents, c) =>
        cents.zipWithIndex.map { case (cent, i) =>
          (c, i, cent.mkString("[", ",", "]")) }
      }.toSeq.toDF("chunk", "idx", "centroid").orderBy("chunk", "idx")
    }),

    // ---- B9: PQ encode — per-chunk argmin codes (rows-only: KMeans)
    "b9_pq_encode" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val cb = Pq.train(emb, "embedding", dim = 64, chunks = 8, k = 16)
      // pq_code stringified: rows-only check; pandas can't sort array cells
      Pq.encode(emb, "embedding", cb)
        .select(col("vec_id"), col("pq_code").cast("string").as("pq_code"))
        .orderBy("vec_id")
    }),

    // ---- ADC search extension: approximate top-k over PQ codes
    "o6_pq_adc_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") === QueryVecId)
        .select("embedding").head.getSeq[Float](0).toSeq
      val cb = Pq.train(emb, "embedding", dim = 64, chunks = 8, k = 16)
      Pq.adcSearch(Pq.encode(emb, "embedding", cb), "vec_id", "pq_code", cb, q, k = 10)
        .select("vec_id", "dist")
    }),

    // ---- E1/E2: deterministic hashing embedder over documents
    "e1_embed_docs" -> ((s, dir) =>
      // embedding stringified: rows-only check; pandas can't sort array cells
      HashingEmbedder.embed(Tables.documents(s, dir), "doc_id", "text", dim = 64)
        .select(col("doc_id"), col("embedding").cast("string").as("embedding"))
        .orderBy("doc_id")),

    // ---- E1 oracle slice: the hashing-embedder pipeline (tokenize →
    // hash-bucket ±1 counts → L2 normalize) with md5-derived buckets so
    // every step exists in DuckDB — norm² is an exact integer and the
    // normalized components are single correctly-rounded ops, so the
    // embedding math is verified bit-for-bit (the production embedder
    // keeps xxhash64; identical structure)
    "e1_embed_oracle" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val toks = docs.select(col("doc_id"),
          explode(split(lower(col("text")), "\\s+")).as("t"))
        .filter(col("t") =!= "")
      val withB = toks.select(col("doc_id"),
        (conv(substring(md5(col("t")), 1, 8), 16, 10).cast("long") % 64).as("bucket"),
        when(conv(substring(md5(col("t")), 9, 1), 16, 10).cast("int") % 2 === 0,
          lit(1.0)).otherwise(lit(-1.0)).as("sign"))
      val counts = withB.groupBy("doc_id", "bucket").agg(sum(col("sign")).as("c"))
      val agg = counts.groupBy("doc_id").agg(
        sum(col("c") * col("c")).as("norm_sq"),
        (0 until 8).map(i =>
          sum(when(col("bucket") === i, col("c")).otherwise(0.0)).as(s"c$i")): _*)
      docs.select("doc_id").join(agg, Seq("doc_id"), "left")
        .select(Seq(col("doc_id"), coalesce(col("norm_sq"), lit(0.0)).as("norm_sq")) ++
          (0 until 8).map(i =>
            coalesce(col(s"c$i") / sqrt(col("norm_sq")), lit(0.0)).as(s"d$i")): _*)
        .orderBy("doc_id")
    }),

    // ---- E2 + O2: text-query search over hashed embeddings, end-to-end
    // ---- Per-label centroids + inter-class margins (embedding-space
    // diagnostics: how separable are the labels a classifier will be
    // asked to learn): ONE posexplode pass → (label, dim) exact means
    // (labels × 64 cells, map-side combined), then the labels² × 64
    // pairwise-distance fold runs DRIVER-side on the bounded centroid
    // table — the corpus is scanned once. Margin = L2 distance to the
    // nearest OTHER label's centroid.
    //
    // Determinism: components are quantized to the 2^-20 grid
    // (round(v·2^20) — a tie v·2^20 = k+.5 requires exactly 21
    // fractional binary digits and both engines round it away from
    // zero) and summed as exact BIGINTs, so the per-cell sum is
    // order-independent with NO decimal cast anywhere. A raw
    // double→DECIMAL route is a trap here: real float32 data contains
    // values like 0.1983642578125 whose decimal expansion terminates
    // in a 5 exactly at the rounding digit, and Spark rounds decimal
    // casts HALF_UP while DuckDB rounds half-to-even — 1-ulp sum
    // divergence. The 5e-7 quantization error is orders below any
    // meaningful class margin. Mean = (S/2^20)/n as two IEEE divides
    // both engines execute identically.
    "e_label_margins" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val means = emb
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy("label", "dim")
        .agg(sum(round(col("v").cast("double") * lit(1048576.0))
            .cast("long")).as("sq"),
          count(lit(1)).as("n"))
        .collect().groupBy(_.getInt(0))
        .map { case (l, rows) =>
          l -> rows.sortBy(_.getInt(1))
            .map(r => r.getLong(2).toDouble / 1048576.0 / r.getLong(3).toDouble)
        }
      val counts = emb.groupBy("label").agg(count(lit(1)).as("n_vecs"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      val labels = means.keys.toSeq.sorted
      val out = labels.map { a =>
        val best = labels.filter(_ != a).map { b =>
          // ascending-dim left fold from 0.0 — the list_reduce order
          var d2 = 0.0
          val (ma, mb) = (means(a), means(b))
          var i = 0
          while (i < ma.length) {
            val d = ma(i) - mb(i); d2 += d * d; i += 1
          }
          (d2, b)
        }.min
        (a, counts(a), best._2, math.sqrt(best._1))
      }
      import s.implicits._
      out.toDF("label", "n_vecs", "nearest_label", "margin")
        .orderBy("label")
    }),

    // ---- Embedding PCA by power iteration (the common-direction
    // analysis behind All-but-the-Top, Mu & Viswanath ICLR'18): the
    // corpus pays ONE decimal-routed second-moment aggregation (map-
    // side combined to ≤ dim² rows per partition), the 6-round power
    // method runs driver-local on the 64×64 matrix with list_reduce
    // fold order — loadings AND eigenvalue hash-exact vs the oracle's
    // unrolled matvec replay (the pagerank/classifier-train pattern on
    // a dense matrix)
    "e_pca_power" -> ((s, dir) =>
      Pca.topComponent(Tables.embeddings(s, dir), col("embedding"),
        dim = 64, iters = 6).orderBy("i")),

    // ---- The documented 100 TB play for exact PCA: the component is
    // statistical, so the second moment runs over a DETERMINISTIC
    // md5-hash row sample (Sampling.hashFraction — stable across runs,
    // engines, partitionings) at 1/4 the explode cost, and the oracle
    // replays the identical sample filter — still hash-exact, because
    // the sample is a function of the data, not of an RNG
    "e_pca_power_sampled" -> ((s, dir) =>
      Pca.topComponent(
        Sampling.hashFraction(Tables.embeddings(s, dir), "vec_id", 0.25, "pca"),
        col("embedding"), dim = 64, iters = 6).orderBy("i")),

    // ---- All-but-the-Top at its use site: project the learned common
    // direction out of every embedding (per-row codegen residual — the
    // 100 TB-shaped application of a driver-computed 32 KB component)
    // and rank by residual energy; dot, residual, and norm folds all
    // mirror the oracle's list_reduce order
    "e_pca_residual" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      // the component comes from the deterministic md5 quarter-sample
      // (the scale play at its use site — the component is statistical;
      // the oracle replays the same sample filter, so the residual
      // ranking stays hash-exact); the residual scan covers the FULL
      // corpus
      val comp = Pca.topComponent(
        Sampling.hashFraction(emb, "vec_id", 0.25, "pca"),
        col("embedding"), dim = 64, iters = 6)
        .orderBy("i").collect().map(_.getDouble(1))
      emb.select(col("vec_id"),
          Pca.normSq(Pca.projectOut(col("embedding"), comp), 64)
            .as("res_norm_sq"))
        .orderBy(col("res_norm_sq").desc, col("vec_id").asc)
        .limit(10)
    }),

    // oracle-exact: the md5-variant count embedder runs for corpus AND
    // query, and cosine over raw signed counts (exact integers) is
    // bitwise-reproducible in SQL — embed → knnCosine → top-10 is the
    // full E2 path under the hash gate, not a rows-only check
    "e2_embed_search" -> ((s, dir) => {
      val docs = HashingEmbedder.embedMd5Counts(Tables.documents(s, dir),
        "doc_id", "text", dim = 64)
      val q = HashingEmbedder.md5CountsLocal(EmbedQueryText, 64).map(_.toFloat)
      Search.knnCosine(docs, "doc_id", "embedding", q.toSeq, 10)
        .select("doc_id", "dist")
    }),

    // ---- Multi-vector late-interaction retrieval: per-window doc
    // vectors + MaxSim scoring (Σ_q max_w cosine). Integer-exact
    // md5-count embeddings make the full operator oracle-checkable.
    "mv_maxsim" -> ((s, dir) =>
      MultiVec.maxsimSearch(Tables.documents(s, dir), "doc_id", "text",
        MaxsimQuerySegments, k = 10)),

    // ---- E2 NORMALIZED-embedding variant, oracle-exact end-to-end:
    // the md5-variant normalized embedder runs for corpus AND query
    // (the e1_embed_oracle construction) — components are single
    // correctly-rounded float divisions of exact integer counts, and
    // cosine folds them in array order identically in both engines, so
    // the full embed → normalize → knnCosine path is hash-checked.
    // The production embedder keeps xxhash64 with the same structure
    // (determinism + distributed/driver agreement pinned in
    // TextFunctionsSpec).
    "e2_embed_search_norm" -> ((s, dir) => {
      val docs = HashingEmbedder.embedMd5Normalized(Tables.documents(s, dir),
        "doc_id", "text", dim = 64)
      val q = HashingEmbedder.md5NormalizedLocal(EmbedQueryText, 64)
      Search.knnCosine(docs, "doc_id", "embedding", q.toSeq, 10)
        .select("doc_id", "dist")
    }),

    // ---- O3: HNSW-equivalent top-k (per-partition graphs; rows-only —
    // approximate by contract, recall gated in HnswSpec)
    "o3_hnsw_search" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") === QueryVecId)
        .select("embedding").head.getSeq[Float](0).toSeq
      Hnsw.search(emb.withColumnRenamed("vec_id", "id"), "id", "embedding",
        q, k = 10, ef = 50).select("id", "dist")
    }),

    // ---- O3 exhaustive twin: with ef ≥ shard size the beam search
    // visits every node reachable from the entry point, so on connected
    // shard graphs the deterministic build + exact shard merge equals
    // exact kNN — pinning the whole HNSW search arithmetic (greedy
    // descent, beam, (dist,id) merge) to the exact-kNN SQL oracle, the
    // same construction as o6_ivf_exhaustive (nProbe = k).
    "o3_hnsw_exhaustive" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") === QueryVecId)
        .select("embedding").head.getSeq[Float](0).toSeq
      Hnsw.search(emb.withColumnRenamed("vec_id", "id"), "id", "embedding",
        q, k = 10, ef = 5000).select("id", "dist")
    }),

    // ---- O3 through the FACADE's persisted-graph deployment shape:
    // ingest → buildHnsw (edges + params + watermark persisted) →
    // ingest MORE rows (served as an exact tail below the graph
    // results) → searchHnsw with an exhaustive beam. With ef far above
    // every shard the graph side ≡ exact kNN over the built rows, the
    // tail side is exact by construction, and the (dist, id) merge is
    // the engine-wide tie-break — so the whole persisted chain
    // (buildEdges → parquet → searchEdges reconstruct → watermark
    // split → merge) is oracle-checked against brute-force kNN.
    // Store ids differ from vec_ids (ingest assigns its own), so the
    // compare key is the content column carrying the vec_id.
    "o3_hnsw_store_exh" -> ((s, dir) => withShufflePartitions(s, 8) {
      val tmp = scratchDir("graft_hnswstore")
      val store = VectorStore.open(s, tmp, dim = 64)
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") === QueryVecId)
        .select("embedding").head.getSeq[Float](0).toSeq
      def rowsFor(pred: Column) = emb.filter(pred)
        .select(col("embedding"), col("vec_id").cast("string").as("content"))
      store.ingest(rowsFor(col("vec_id") < 400))
      store.buildHnsw(numPartitions = 4)
      store.ingest(rowsFor(col("vec_id") >= 400))
      store.searchHnsw(q, k = 10, ef = 5000)
        .join(store.snapshot().select("id", "content"), "id")
        .select(col("content"), col("dist"))
        .orderBy(col("dist").asc, col("content").asc)
    }),

    // ---- O3/O6 second scale path: banded hyperplane-LSH ANN, 16 tables
    // × 8 bits with 2-bit multi-probe. Approximate by contract, but at
    // these settings the candidate set provably covers the true top-10
    // with overwhelming probability, so the result is oracle-checked
    // against the exact-kNN SQL (recall-vs-exact also gated in LshSpec).
    "o3_lsh_search" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") === QueryVecId)
        .select("embedding").head.getSeq[Float](0).toSeq
      val model = Lsh.fitBanded(dim = 64, bitsPerTable = 8, nTables = 16)
      Lsh.search(Lsh.assign(emb, "embedding", model), model, "vec_id",
        "embedding", q, k = 10, probeBits = 2)
        .select("vec_id", "dist")
        .orderBy(col("dist").asc, col("vec_id").asc)
    }),

    // ---- The LSH PERSISTED-SIGNATURE deployment shape under the same
    // oracle: build step persists the (id, sigs) table — exactly what
    // VectorStore.trainLsh stores — then the query filters the compact
    // signature table with the probe cut and point-joins only the
    // candidates back for the exact (dist, id) rerank. Same model, same
    // probe cut ⇒ same candidate set as o3_lsh_search, so the exact-kNN
    // oracle gates the whole persisted chain (assign → persist → probe
    // filter → hydrate-join → rerank).
    "o3_lsh_persisted" -> ((s, dir) => {
      val tmp = scratchDir("graft_lshpersist")
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") === QueryVecId)
        .select("embedding").head.getSeq[Float](0).toSeq
      val model = Lsh.fitBanded(dim = 64, bitsPerTable = 8, nTables = 16)
      Lsh.assign(emb, "embedding", model)
        .select(col("vec_id"), col(graft.operators.Lsh.SigsCol))
        .write.mode("overwrite").parquet(s"$tmp/sigs")
      val cand = s.read.parquet(s"$tmp/sigs")
        .filter(Lsh.probeCondition(model, q, probeBits = 2))
        .select("vec_id")
      Search.knnExact(emb.join(cand, "vec_id"), "vec_id", "embedding", q, 10)
        .select("vec_id", "dist")
        .orderBy(col("dist").asc, col("vec_id").asc)
    }),

    // ---- O7 × O3: metadata filter composed below the HNSW path
    // (test_search_api.py:149-172 exclusion semantics). The filter
    // applies before graph construction, so each per-shard graph holds
    // only matching rows; with ef far above every filtered shard the
    // beam is exhaustive and the exact shard merge equals exact
    // filtered kNN — oracle-checked. Pruned-setting recall is gated in
    // HnswSpec.
    "o7_hnsw_filtered" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") === QueryVecId)
        .select("embedding").head.getSeq[Float](0).toSeq
      Hnsw.search(emb, "vec_id", "embedding", q, k = 10, ef = 200,
          Hnsw.Params(), // library default m16/efC200 — the config that
                         // holds the 10M recall gate (Hnsw knob table)
          filter = Some(col("label") === 3))
        .select(col("id").as("vec_id"), col("dist"))
        .orderBy(col("dist").asc, col("vec_id").asc)
    }),

    // ---- O7 × O6-scale-path: metadata filter composed below banded
    // LSH. At 32×4 with 2-bit multi-probe each table probes 11 of 16
    // buckets — the chance any row escapes all 32 tables is (5/16)^32,
    // so the candidate set provably covers the filtered corpus and the
    // exact filtered-kNN SQL is its oracle.
    "o7_lsh_filtered" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") === QueryVecId)
        .select("embedding").head.getSeq[Float](0).toSeq
      val model = Lsh.fitBanded(dim = 64, bitsPerTable = 4, nTables = 32)
      Lsh.search(Lsh.assign(emb, "embedding", model), model, "vec_id",
          "embedding", q, k = 10, probeBits = 2,
          filter = Some(col("label") === 3))
        .select(col("vec_id"), col("label").cast("long").as("label"), col("dist"))
        .orderBy(col("dist").asc, col("vec_id").asc)
    }),

    // ---- LSH-bucketed embedding near-dup (the corpus-scale candidate
    // generator): 32 tables × 4 bits recovers the full exact pair set at
    // threshold 0.45 on this data, so it shares the exact-pairs oracle.
    "ann_cosine_neardup_lsh" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      // 64 tables × 4 bits: per-pair miss probability at cos 0.45 is
      // (1 − 0.65⁴)^64 ≈ 3·10⁻⁶ — 32 tables measurably dropped 1 of
      // 144 true pairs at sf0.1 (the sf-scaled exact-oracle check)
      val model = Lsh.fitBanded(dim = 64, bitsPerTable = 4, nTables = 64)
      Lsh.cosineNearDupPairs(Lsh.assign(emb, "embedding", model), "vec_id",
        "embedding", threshold = 0.45, maxBucket = 10000).orderBy("a", "b")
    }),

    // ---- B1/B3: HNSW build — edge histogram per level (rows-only)
    "b1_hnsw_edges" -> ((s, dir) =>
      Hnsw.buildEdges(Tables.embeddings(s, dir), "vec_id", "embedding",
          Hnsw.Params(), numPartitions = 4)
        .groupBy("level").agg(count(lit(1)).as("n_edges"))
        .orderBy("level")),

    // ---- B1 incremental: insert a batch into persisted shard graphs
    // (no full rebuild — the reference's live-graph insert,
    // hnsw.py:143-225) and report the updated edge histogram (rows-only;
    // the incremental ≡ rebuild recall contract is gated in HnswSpec)
    "b1_hnsw_incremental" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val params = Hnsw.Params() // default m16/efC200 (knob table: the
                                 // 10M-gate config; m8/efC50 fails there)
      val base = emb.filter(col("vec_id") % 5 =!= 0)
      val batch = emb.filter(col("vec_id") % 5 === 0)
      val edges = Hnsw.buildEdges(base, "vec_id", "embedding", params, numPartitions = 4)
      Hnsw.insertEdges(edges, base, batch, "vec_id", "embedding",
          numPartitions = 4, params)
        .groupBy("level").agg(count(lit(1)).as("n_edges"))
        .orderBy("level")
    }),

    // ---- B10: streaming ingest — watermark-free complete-mode hourly
    // rollup over the events stream; must equal the batch oracle exactly
    "b10_stream_hourly" -> ((s, dir) => withShufflePartitions(s, 8) {
      val stream = Tables.eventsStream(s, dir)
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("h"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dSum(col("value")).as("sum_value"))
      val name = s"b10_sink_${System.nanoTime()}"
      val q = stream.writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      // analysis is eager, so the result plan holds the sink data and the
      // catalog entry can be dropped (repeated bench runs don't leak views)
      val out = s.table(name).orderBy("h", "event_type")
      s.catalog.dropTempView(name)
      out
    }: DataFrame),

    // ---- Stream-stream watermarked interval join: click-to-view
    // attribution (click within 1 h of the same user's view), both
    // sides live streams. Inner pairs emit as both sides arrive; the
    // watermark + time bound give Spark a state-eviction horizon
    // (steady-state store = rate x (delay + window), not stream
    // length). The replay is a single AvailableNow batch, so the
    // result equals the batch interval join the oracle runs.
    "b10_stream_join" -> ((s, dir) => withShufflePartitions(s, 8) {
      val views = Tables.eventsStream(s, dir)
        .filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id").as("v_user"),
          col("ts").as("view_ts"))
      val clicks = Tables.eventsStream(s, dir)
        .filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
          col("ts").as("click_ts"))
      val joined = graft.streaming.StreamJoin.intervalJoin(
          views, "v_user", "view_ts", clicks, "c_user", "click_ts",
          windowSec = 3600L, watermark = "35 days")
        .select(col("view_id"), col("click_id"), col("v_user").as("user_id"),
          (unix_micros(col("click_ts")) - unix_micros(col("view_ts")))
            .as("lag_us"))
      val name = s"b10_join_${System.nanoTime()}"
      val q = joined.writeStream.format("memory").queryName(name)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val out = s.table(name).orderBy("view_id", "click_id")
      s.catalog.dropTempView(name)
      out
    }: DataFrame),

    // ---- As-of join: latest order at-or-before each event (temporal
    // enrichment; union + last-ignoreNulls window composition)
    "q_asof_enrich" -> ((s, dir) =>
      AsofJoin.asofLeft(Tables.events(s, dir), "user_id", col("ts"),
          Tables.orders(s, dir), "o_custkey", col("o_orderdate"),
          "o_orderkey", Seq("o_orderkey", "o_totalprice"))
        .select("event_id", "user_id", "o_orderkey", "o_totalprice")
        .orderBy("event_id")),

    // ---- Grouping sets: ROLLUP over the pricing summary dimensions
    "q_rollup" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .rollup("l_returnflag", "l_linestatus")
        .agg(dSum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    // ---- Pearson correlation per group: the five sufficient sums are
    // decimal-routed exact (order-independent under any partitioning),
    // then one fixed IEEE expression — second-order statistics with the
    // same bit-replayable discipline as the first-order aggregates
    "q_corr" -> ((s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      def ds(c: Column) = sum(c.cast(DecimalType(38, 18))).cast("double")
      Tables.lineitem(s, dir).groupBy("l_returnflag")
        .agg(count(lit(1)).cast("double").as("nn"),
          ds(col("l_quantity")).as("sx"),
          ds(col("l_extendedprice")).as("sy"),
          ds(col("l_quantity") * col("l_quantity")).as("sxx"),
          ds(col("l_extendedprice") * col("l_extendedprice")).as("syy"),
          ds(col("l_quantity") * col("l_extendedprice")).as("sxy"))
        .select(col("l_returnflag"),
          ((col("nn") * col("sxy") - col("sx") * col("sy")) /
            sqrt((col("nn") * col("sxx") - col("sx") * col("sx")) *
              (col("nn") * col("syy") - col("sy") * col("sy")))).as("corr"),
          col("nn").cast("long").as("n"))
        .orderBy("l_returnflag")
    }),

    // ---- Exact per-group mode with a deterministic tie-break (highest
    // count, then lowest value) — two map-side-combinable aggregations,
    // no window over the fact table
    "q_mode" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_quantity")
        .agg(count(lit(1)).as("cnt"))
        .groupBy("l_returnflag")
        .agg(max(struct(col("cnt"), (-col("l_quantity")).as("nv"))).as("m"))
        .select(col("l_returnflag"), (-col("m.nv")).as("mode_qty"),
          col("m.cnt").as("mode_cnt"))
        .orderBy("l_returnflag")),

    // ---- Equal-width histogram (20 bins over the observed range):
    // bounds from one aggregation, the bin expression evaluated with
    // the identical IEEE op order in both engines, top bin clamped
    "events_histogram" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val b = ev.agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
      ev.crossJoin(broadcast(b))
        .select(least(lit(19.0d),
          floor((col("value") - col("lo")) * lit(20.0d) /
            (col("hi") - col("lo")))).cast("long").as("bin"))
        .groupBy("bin").agg(count(lit(1)).as("n"))
        .orderBy("bin")
    }),

    // ---- Grouping sets: CUBE (all 4 grouping combinations)
    "q_cube" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .cube("l_returnflag", "l_linestatus")
        .agg(dSum(col("l_extendedprice")).as("sum_price"), count(lit(1)).as("n"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)),

    // ---- Pivot: wide conditional aggregation (explicit value list, so
    // no extra distinct-values job; absent cells stay NULL on both
    // engines). Single shuffle — same plan as the groupBy it rewrites to.
    "q_pivot" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(dSum(col("l_quantity")))
        .withColumnRenamed("F", "qty_f")
        .withColumnRenamed("O", "qty_o")
        .orderBy("l_returnflag")),

    // ---- Unpivot: measures → (measure, value) rows — the inverse
    // reshape (pure per-row generate above one aggregation; the oracle
    // is the UNION ALL expansion)
    "q_unpivot" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(dSum(col("l_quantity")).as("sum_qty"),
          dSum(col("l_extendedprice")).as("sum_base_price"),
          dSum(col("l_discount")).as("sum_disc"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("sum_qty"), col("sum_base_price"), col("sum_disc")),
          "measure", "value")
        .orderBy("l_returnflag", "measure")),

    // ---- Null-semantics parity: null group keys, count(*) vs count(col),
    // null-skipping aggregates, coalesce — engines must agree exactly
    "q_null_agg" -> ((s, dir) => {
      val o = Tables.orders(s, dir).withColumn("prio_n",
        when(col("o_orderkey") % 7 === 0, lit(null).cast("string"))
          .otherwise(col("o_orderpriority")))
      o.groupBy(col("prio_n"))
        .agg(count(lit(1)).as("n_rows"),
          count(col("prio_n")).as("n_nonnull"),
          countDistinct(col("o_custkey")).as("n_cust"),
          dSum(col("o_totalprice")).as("sum_price"))
        .withColumn("prio_out", coalesce(col("prio_n"), lit("<none>")))
        .select("prio_out", "n_rows", "n_nonnull", "n_cust", "sum_price")
        .orderBy("prio_out")
    }),

    // ---- Set operations: INTERSECT / EXCEPT over filtered id sets
    "q_setops" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val en = docs.filter(col("lang") === "en").select("doc_id")
      val src0 = docs.filter(col("source") === "src0").select("doc_id")
      en.intersect(src0).withColumn("tag", lit("both"))
        .unionByName(en.except(src0).withColumn("tag", lit("en_only")))
        .orderBy("tag", "doc_id")
    }),

    // ---- Distinct aggregates
    "q_distinct" -> ((s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"))
        .orderBy("l_returnflag")),

    // ---- Sessionization: per-user inactivity-gap sessions (training-
    // pipeline staple; 8h gap per the event cadence)
    "events_sessionize" -> ((s, dir) =>
      Sessionize.sessions(Tables.events(s, dir), "user_id", "ts", "event_id",
          "value", gapMicros = 8L * 3600 * 1000000)
        .orderBy("user_id", "session_id")),

    // ---- SCD2 effective-dating: collapse each user's event stream to
    // its event_type CHANGE POINTS and date each state
    // [valid_from, valid_to) by the next change (open-ended current
    // state flagged). The dimension-table versioning pattern a warehouse
    // builds from a change log. Two windows, both partitioned by
    // user_id — one shuffle on the user key, nothing corpus-global;
    // (ts, event_id) ordering makes the trajectory deterministic under
    // duplicate timestamps, and null-safe inequality keeps a null state
    // from silently merging with its neighbours.
    "q_scd2" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, dir)
        .withColumn("__prev", lag(col("event_type"), 1).over(w))
        .filter(!(col("__prev") <=> col("event_type")))
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("valid_from_us"),
          unix_micros(lead(col("ts"), 1).over(w)).as("valid_to_us"))
        .withColumn("is_current", col("valid_to_us").isNull)
        .orderBy("user_id", "valid_from_us")
    }),

    // ---- k-anonymity suppression: publish per-(lang, source) corpus
    // stats only for groups with ≥ k members; smaller groups roll up
    // into one '__other__' bucket instead of leaking a re-identifiable
    // small-population row. Two aggregations — the second over the
    // already-bounded group table — all-integer, exact.
    "q_kanon_suppress" -> ((s, dir) => {
      val k = 10
      val g = Tables.documents(s, dir)
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("char_mass"))
      g.select(
          when(col("n_docs") >= k, col("lang")).otherwise("__other__").as("lang"),
          when(col("n_docs") >= k, col("source")).otherwise("__other__").as("source"),
          col("n_docs"), col("char_mass"))
        .groupBy("lang", "source")
        .agg(sum(col("n_docs")).as("n_docs"),
          sum(col("char_mass")).as("char_mass"),
          count(lit(1)).cast("long").as("n_groups"))
        .orderBy("lang", "source")
    }),

    // ---- Skew-mitigation pattern: two-stage salted aggregation — a hot
    // key splits across 16 deterministic salt shards in stage 1 (map-side
    // combined), stage 2 merges the per-shard partials. Decimal partials
    // keep the result bit-identical to the unsalted oracle.
    "q_salted_agg" -> ((s, dir) => {
      val salted = Tables.events(s, dir)
        .withColumn("__salt", pmod(col("event_id"), lit(16)))
        .groupBy("user_id", "__salt")
        .agg(count(lit(1)).as("__n"),
          sum(col("value").cast(DecimalType(28, 2))).as("__s"))
      salted.groupBy("user_id")
        .agg(sum(col("__n")).as("n_events"),
          sum(col("__s")).cast("double").as("sum_value"))
        .orderBy("user_id")
    }),

    // ---- Window frame aggregation: moving sum over the last 3 orders
    // per customer (decimal-exact within the frame)
    "q_moving_sum" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        .rowsBetween(-2, Window.currentRow)
      Tables.orders(s, dir)
        .withColumn("mov_sum",
          sum(col("o_totalprice").cast(DecimalType(28, 2))).over(w).cast("double"))
        .select("o_custkey", "o_orderkey", "mov_sum")
        .orderBy("o_custkey", "o_orderkey")
    }),

    // ---- Range join: orders in the 30 days before each event, per user —
    // bucketed equi-join (no nested-loop cross product)
    "q_range_join" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select("event_id", "user_id", "ts")
      val pairs = RangeJoin.innerPairs(ev, "user_id", col("ts"),
        Tables.orders(s, dir), "o_custkey", col("o_orderdate"),
        windowMicros = 30L * 86400 * 1000000L,
        payload = Seq("o_orderkey", "o_totalprice"))
      val agg = pairs.groupBy("event_id")
        .agg(count(lit(1)).as("n_orders"), dSum(col("o_totalprice")).as("sum_total"))
      ev.join(agg, Seq("event_id"), "left")
        .select(col("event_id"), col("user_id"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("sum_total"), lit(0.0)).as("sum_total"))
        .orderBy("event_id")
    }),

    // ---- Streaming stateful dedup: dropDuplicates state over the event
    // stream (at scale the state is bounded with a watermark; the finite
    // replay here needs none), then a batch count over the sink
    "b10_stream_dedup" -> ((s, dir) => withShufflePartitions(s, 8) {
      // Tables.eventsStream handles the file-vs-directory table layout
      // (the bare glob read here returned an empty stream on a
      // directory-shaped corpus — sf1 tier finding)
      val stream = Tables.eventsStream(s, dir)
        .select("user_id").dropDuplicates("user_id")
      val name = s"b10_dedup_sink_${System.nanoTime()}"
      val q = stream.writeStream.format("memory").queryName(name)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val out = s.table(name).agg(count(lit(1)).as("n_users"))
      s.catalog.dropTempView(name)
      out
    }: DataFrame),

    // ---- B10 → B1/B5: live index maintenance on flush — the reference's
    // indexing_service loop (save the index on every threshold flush) as
    // one composed streaming path. The corpus replays as 3 micro-batches
    // (3 files, maxFilesPerTrigger=1); every flush runs Hnsw.refreshEdges
    // (first flush builds, later flushes insert only unseen ids into the
    // persisted shard graphs — no rebuild). The final search runs over
    // the PERSISTED edges exactly as the last flush left them. Rows-only
    // (HNSW is approximate by contract); the recall + incremental-insert
    // contracts are gated in StreamingSpec/HnswSpec.
    "b10_stream_index" -> ((s, dir) =>
      streamIndexPipeline(s, dir, ef = 100, tmpName = "graft_b10idx")),

    // ---- Streaming funnel: the batch funnel's semantics as live
    // flatMapGroupsWithState state (|steps| longs per active user),
    // replayed as two time-ordered micro-batches and hash-checked
    // against the SAME batch oracle — stream ≡ batch under
    // time-ordered arrival
    "b10_stream_funnel" -> ((s, dir) => streamFunnelPipeline(s, dir)),

    // ---- Streaming HLL maintenance: micro-batch register folding by
    // elementwise MAX — idempotent exact-union merge, so the folded
    // state is register-identical to the batch sketch under ANY split
    // and the final estimate hash-matches the batch sketch_hll oracle
    "b10_stream_hll" -> ((s, dir) => withShufflePartitions(s, 8) {
      import s.implicits._
      val tmp = scratchDir("graft_b10hll")
      val ev = Tables.events(s, dir).select(col("user_id"))
      ev.repartition(2).write.mode("overwrite").parquet(s"$tmp/in")
      val stream = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$tmp/in")
      val state = new java.util.concurrent.atomic.AtomicReference(
        Map.empty[Int, Int])
      val q = Sketch.streamingHll(stream, col("user_id"), p = 6,
        s"$tmp/ckpt", state)
      q.awaitTermination()
      Sketch.hllEstimate(state.get().toSeq.toDF("bucket", "r"), p = 6)
    }: DataFrame),

    // ---- Delta-log streaming upsert WITH in-stream tombstones: the
    // documents corpus ingests as flush 1; flush 2 carries updates
    // (doc_id % 7 = 0 → lang uppercased) and deletions (doc_id % 5 = 0,
    // tombstone rows) in one batch. compactEvery=2 folds the delta tail
    // into the base MID-PIPELINE, so the oracle gates the whole
    // merge-on-read chain: O(batch) append → latest-seq-wins merge →
    // tombstone shadowing of base rows → crash-safe fold — the final
    // state must equal the plain SQL the oracle runs over `documents`.
    "b10_stream_tombstone" -> ((s, dir) => withShufflePartitions(s, 8) {
      val tmp = scratchDir("graft_b10tomb")
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("lang"))
      docs.withColumn("__del", lit(false))
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/in/b0")
      val schema = s.read.parquet(s"$tmp/in/b0").schema
      def drain(): Unit = graft.streaming.StreamingIngest.upsertStream(
        s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
          .parquet(s"$tmp/in/*"),
        "doc_id", s"$tmp/store", s"$tmp/ckpt",
        flushThreshold = Long.MaxValue, compactEvery = 2,
        tombstoneCol = Some("__del")).awaitTermination()
      drain()
      // flush 2 is written only after flush 1 fully drained, so the
      // update/delete batch is unambiguously the LATER delta seq
      docs.filter(col("doc_id") % 5 === 0 || col("doc_id") % 7 === 0)
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0, upper(col("lang")))
            .otherwise(col("lang")).as("lang"),
          (col("doc_id") % 5 === 0).as("__del"))
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/in/b1")
      drain()
      graft.core.DeltaLog.readMerged(s, s"$tmp/store", "doc_id")
        .getOrElse(sys.error("no delta-log state published by the stream"))
        .orderBy("doc_id")
    }: DataFrame),

    // ---- Streaming quantile-sketch maintenance: fold each micro-
    // batch's per-group bottom-k-by-hash samples into the running state
    // — idempotent exact-union merge (replayed rows dedup by hash), so
    // the folded state is bit-identical to the batch sketch under ANY
    // split and the estimates hash-match the batch sketch_kll oracle
    "b10_stream_kll" -> ((s, dir) => withShufflePartitions(s, 8) {
      import s.implicits._
      val tmp = scratchDir("graft_b10kll")
      val docs = Tables.documents(s, dir).select("doc_id", "lang", "n_chars")
      docs.repartition(2).write.mode("overwrite").parquet(s"$tmp/in")
      val stream = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$tmp/in")
      val state = new java.util.concurrent.atomic.AtomicReference(
        Map.empty[String, Seq[Sketch.QItem]])
      val q = Sketch.streamingQuantile(stream, col("lang"), col("n_chars"),
        col("doc_id"), k = 256, s"$tmp/ckpt", state)
      q.awaitTermination()
      val sk = state.get().toSeq.toDF("g", "sketch")
      Sketch.quantileEstimateGrouped(sk, Seq(0.5, 0.9, 0.99))
        .select(col("g").as("lang"), col("n_sample"),
          col("q0").as("p50"), col("q1").as("p90"), col("q2").as("p99"))
        .orderBy("lang")
    }: DataFrame),

    // ---- B10 exhaustive twin: the identical flush → refreshEdges →
    // searchEdges loop, searched with ef far above every shard size —
    // the o3_hnsw_exhaustive construction applied to the STREAM-
    // MAINTAINED index. The beam then visits every reachable node per
    // shard graph (built incrementally across flushes), so the whole
    // streaming-maintenance loop is pinned to the exact-kNN SQL oracle
    // instead of rows-only.
    "b10_stream_index_exh" -> ((s, dir) =>
      streamIndexPipeline(s, dir, ef = 5000, tmpName = "graft_b10idx_exh")),

    // ---- Streaming near-dup maintenance: micro-batch ingest keeping a
    // cross-batch near-duplicate PAIR table live — the streaming twin
    // of pipeline_dedup_full's screen. Per flush: intra-batch LSH pairs
    // + cross pairs against the ACCUMULATED corpus (cross-side only, so
    // per-flush work scales with the batch's bucket overlap, never
    // re-pairing the corpus against itself), then the batch joins the
    // corpus. Every (a,b) pair has exactly one emitting flush (the
    // later doc's), so the maintained table ≡ the one-shot batch screen
    // — hence the SAME minhashLshSql oracle — provided no band bucket
    // exceeds maxBucket at FINAL corpus size (the guard is applied to
    // partial buckets per flush; a bucket degenerate only in aggregate
    // would stream pairs batch excludes — same density condition the
    // sf1 tier checks).
    "b10_stream_neardup" -> ((s, dir) => streamNearDupPipeline(s, dir)),

    // ---- Multimodal: binary payload + batch feature extraction (stub
    // codec, real plumbing). One row per (doc, bucket) scalar feature —
    // the byte-histogram codec is expressible in SQL (ord() per char ==
    // byte on this ASCII corpus), so the full decode path is oracle-exact
    "mm_extract_features" -> ((s, dir) =>
      Multimodal.extractFeatures(
        Multimodal.asMediaTable(Tables.documents(s, dir), "doc_id", "text"),
        "media", dim = 16)
        .select(col("doc_id"), posexplode(col("features")).as(Seq("bucket", "feature")))
        .select(col("doc_id"), col("bucket").cast("long").as("bucket"),
          col("feature").cast("double").as("feature"))
        .orderBy("doc_id", "bucket")),

    // ---- North-star extension: kNN similarity JOIN (bounded-heap
    // group top-k; map-side combined)
    "o2_knn_join" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val queries = emb.filter(col("vec_id") < 3)
        .select(col("vec_id").as("qid"), col("embedding").as("qemb"))
      Search.knnJoin(emb, "vec_id", "embedding", queries, "qid", "qemb", 5)
        .select(col("query_id"), col("neighbor_id"), col("dist"),
          col("rank").cast("long").as("rank"))
        .orderBy("query_id", "rank")
    }),

    // ---- S3: get_embedding = column projection (the reference's
    // layer-1/layer-2 split, storage.py:254-259)
    "s3_projection" -> ((s, dir) =>
      Tables.embeddings(s, dir)
        .filter(col("vec_id") < 5)
        .select(col("vec_id"),
          element_at(col("embedding"), 1).as("dim0"),
          size(col("embedding")).cast("long").as("n_dims"))
        .orderBy("vec_id")),

    // ---- Text analysis: corpus vocabulary (token frequency)
    "t_vocab" -> ((s, dir) =>
      Tables.documents(s, dir)
        .select(explode(split(lower(col("text")), "\\s+")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word").asc)
        .limit(50)),

    // ---- Text analysis: BPE merge learning (Sennrich et al., ACL 2016).
    // The corpus is touched ONCE (word counts); each of the 6 merge
    // rounds is a vocab-sized adjacent-pair aggregation + a 1-row argmax
    // collect. Oracle replays every argmax and literal-replace merge in
    // unrolled SQL — an iterative learned tokenizer, hash-exact.
    "t_bpe_learn" -> ((s, dir) =>
      Bpe.learnMergeTable(Tables.documents(s, dir), "text", nMerges = 6)
        .orderBy("rank")),

    // ---- The learned subword vocabulary with corpus frequencies: the
    // merges come from learnMerges (6 rounds) and are then applied to
    // the word table — so the oracle replays LEARNING and APPLICATION
    // in one statement. Top-50 by weighted count, ties by subword.
    "t_bpe_vocab" -> ((s, dir) => {
      val words = Bpe.wordCounts(Tables.documents(s, dir), "text")
      val merges = Bpe.learnMerges(words, nMerges = 6).map(m => (m.left, m.right))
      words.select(
          explode(Bpe.symbolArray(
            Bpe.applyMergesToWord(col("word"), merges))).as("subword"),
          col("cnt"))
        .groupBy("subword").agg(sum("cnt").as("n"))
        .orderBy(col("n").desc, col("subword").asc)
        .limit(50)
    }),

    // ---- BPE tokenization under a fixed merge chain: pure per-row
    // expression (no shuffle) — the "apply the learned tokenizer at
    // 100 TB" pass; rank order matters (later merges consume earlier
    // fusions) and the oracle applies the identical replace chain
    "t_bpe_apply" -> ((s, dir) =>
      Bpe.tokenize(Tables.documents(s, dir), "doc_id", "text", FixedBpeMerges)
        .orderBy("doc_id")),

    // ---- Tokenizer fertility: per-language tokens/word and
    // chars/token under the fixed merge chain — the "is this tokenizer
    // fair to each language" audit every multilingual pipeline runs
    // (Rust et al. 2021, arXiv:2012.15613). Per-row token counts ride
    // the scan; one ≤|langs|-group aggregation; every ratio is one
    // division of two exact BIGINT sums.
    "t_bpe_fertility" -> ((s, dir) =>
      Tables.documents(s, dir).select(col("lang"),
          size(Bpe.tokens(col("text"), FixedBpeMerges)).cast("long").as("__t"),
          size(array_remove(split(lower(col("text")), "\\s+"), ""))
            .cast("long").as("__w"),
          length(col("text")).cast("long").as("__c"))
        .groupBy("lang")
        .agg(sum("__t").as("n_tokens"), sum("__w").as("n_words"),
          sum("__c").as("n_chars"))
        .select(col("lang"), col("n_tokens"), col("n_words"),
          when(col("n_words") > 0,
            col("n_tokens").cast("double") / col("n_words").cast("double"))
            .otherwise(lit(0.0)).as("fertility"),
          when(col("n_tokens") > 0,
            col("n_chars").cast("double") / col("n_tokens").cast("double"))
            .otherwise(lit(0.0)).as("chars_per_token"))
        .orderBy("lang")),

    // ---- Shard-export manifest: deterministic hash shards + per-shard
    // row/byte totals, id ranges, and an order-independent exact-sum
    // content checksum — the trainer-facing integrity record of an
    // export. One bounded aggregation, nothing driver-side.
    "export_shards" -> ((s, dir) =>
      Export.manifest(Tables.documents(s, dir), "doc_id", "text",
        col("n_chars"), nShards = 8).orderBy("shard")),

    // ---- WebDataset tar-shard layout: per-document (shard, member
    // name, byte size, ustar header offset) — the seek index a tar
    // trainer uses; exact 512-byte block arithmetic over ONE per-shard
    // window cumsum, and the byte layout writeTarShards then emits
    // (ExportSpec round-trips the actual tars through an independent
    // reader AND the system tar binary)
    "export_tar" -> ((s, dir) =>
      Export.tarShardPlan(Tables.documents(s, dir), "doc_id", "text",
        nShards = 8).orderBy("shard", "doc_id")),

    // ---- Byte-level BPE (GPT-2 family): regex pre-tokenizer (leading
    // space attaches to the following word; lookahead-free so the
    // oracle's RE2-class regex agrees), UTF-8 bytes as hex-pair
    // symbols, merges never cross pre-token boundaries, case
    // preserved. Learning replayed in unrolled SQL over the identical
    // construction — the same delimited-symbol argmax/replace chain as
    // t_bpe_learn, one alphabet lower.
    "t_bpe_bytes_learn" -> ((s, dir) =>
      ByteBpe.learnMergeTable(Tables.documents(s, dir), "text", nMerges = 6)
        .orderBy("rank")),

    // ---- Byte-level tokenization under a fixed byte-merge chain
    // (th, the, " the", in, er as byte pairs): pure per-row expression,
    // token count + hex-stream md5 per document
    "t_bpe_bytes_apply" -> ((s, dir) =>
      ByteBpe.tokenize(Tables.documents(s, dir), "doc_id", "text",
        FixedByteBpeMerges).orderBy("doc_id")),

    // ---- Collocation mining (Mikolov et al. 2013 §4): δ-discounted
    // phrase scores over exact adjacent-pair and unigram counts — the
    // score is one IEEE division of exact integers, so the full ranked
    // table replays bit-for-bit
    "t_phrases" -> ((s, dir) =>
      Phrases.collocations(Tables.documents(s, dir), "text",
          delta = 5L, minCount = 10L)
        .orderBy(col("score").desc, col("a").asc, col("b").asc)
        .limit(50)),

    // ---- GloVe windowed co-occurrence (Pennington et al. 2014 §3):
    // 1/distance-weighted pair counts over ±5 windows, the embedding-
    // training prestep; harmonic-weight sums routed through
    // DECIMAL(38,18) so the matrix is exact and order-independent
    "t_cooc" -> ((s, dir) =>
      Phrases.cooccurrence(Tables.documents(s, dir), "text", window = 5)
        .orderBy(col("x").desc, col("a").asc, col("b").asc)
        .limit(100)),

    // ---- PPMI matrix (Levy & Goldberg 2014 — what SGNS implicitly
    // factorizes): clamp-at-0 log-ratio of the decimal-exact
    // co-occurrence mass against its marginals
    "t_cooc_ppmi" -> ((s, dir) =>
      Phrases.cooccurrencePpmi(Tables.documents(s, dir), "text", window = 5)
        .orderBy(col("ppmi").desc, col("a").asc, col("b").asc)
        .limit(100)),

    // ---- Phrase rewrite: the top-8 learned phrases join their
    // occurrences with '_' via the delimited replace chain (rank
    // order, whole words as symbols — the Bpe apply discipline); the
    // oracle re-learns the ranking AND replays the 8-round chain
    "t_phrases_apply" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val phr = Phrases.topPhrases(docs, "text", k = 8,
        delta = 5L, minCount = 10L)
      Phrases.applyPhrases(docs, "doc_id", "text", phr).orderBy("doc_id")
    }),

    // ---- word2vec's multi-pass phrase learning (Mikolov'13 §4 "we ran
    // 2-4 passes"): the second learn runs over the FIRST pass's
    // rewritten corpus, so fused bigrams become atoms and (a_b, c)
    // trigram phrases can emerge on corpora with recurring trigram
    // collocations (this synthetic corpus yields fresh pass-2 bigrams
    // only — 325 merges across 226 docs at sf0.01); the oracle replays
    // both passes with prefix-disjoint CTE chains
    "t_phrases_trigram" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val p1 = Phrases.topPhrases(docs, "text", k = 8,
        delta = 5L, minCount = 10L)
      val r1 = Phrases.applyPhrases(docs, "doc_id", "text", p1)
        .select(col("doc_id"), col("text_phr").as("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val p2 = Phrases.topPhrases(r1, "text", k = 8,
        delta = 5L, minCount = 10L)
      Phrases.applyPhrases(r1, "doc_id", "text", p2).orderBy("doc_id")
    }),

    // ---- Text analysis: TF-IDF top terms per document (ln is bitwise-
    // identical across libm/DuckDB on these values — verified). Per-doc
    // top-3 via the bounded-heap TopTerms aggregator: map-side partial
    // aggregation trims every partition to 3 terms per doc before the
    // shuffle — the rank window this replaces shuffled the full
    // (doc, word) matrix on doc_id.
    "t_tfidf" -> ((s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
      val toks = docs.select(col("doc_id"),
          explode(split(lower(col("text")), "\\s+")).as("word"))
        .filter(col("word") =!= "")
      val tf = toks.groupBy("doc_id", "word").agg(count(lit(1)).as("tf"))
      val dfreq = toks.groupBy("word").agg(countDistinct(col("doc_id")).as("df"))
      val n = docs.agg(countDistinct(col("doc_id")).as("n_docs"))
      tf.join(dfreq, "word").crossJoin(broadcast(n))
        .withColumn("tfidf", col("tf") * graft.expressions.FloatKernels.ln(
          col("n_docs").cast("double") / col("df").cast("double")))
        .select(col("doc_id"), col("word"), col("tf"), col("tfidf"))
        .as[(Long, String, Long, Double)]
        .groupByKey(_._1)
        .mapValues(t => (t._2, t._3, t._4))
        .agg(graft.operators.TopK.topTerms(3))
        .flatMap { case (docId, terms) =>
          terms.iterator.zipWithIndex.map { case ((w, tfv, score), i) =>
            (docId, w, tfv, score, (i + 1).toLong) } }
        .toDF("doc_id", "word", "tf", "tfidf", "rank")
        .orderBy("doc_id", "rank")
    }),

    // ---- Keyword search: BM25 top-k (the hybrid companion surface —
    // exact-integer stats, libm-exact ln, ordered score fold)
    "t_bm25" -> ((s, dir) =>
      TextSearch.bm25TopK(Tables.documents(s, dir), "doc_id", "text",
        BmTerms, 20, Bm25K1, Bm25B)),

    // ---- Hybrid search: BM25 top-C and cosine top-C fused by
    // reciprocal rank (RRF) — the standard keyword+vector read path
    "hybrid_rrf" -> ((s, dir) => {
      val bmTop = TextSearch.bm25TopK(Tables.documents(s, dir), "doc_id",
        "text", BmTerms, HybridC, Bm25K1, Bm25B)
      val cosTop = withQuery(s, dir)
        .filter(norm(col("embedding")) > 0)
        .select(col("vec_id").as("doc_id"),
          cosine(col("embedding"), col("qe")).as("score"))
        .orderBy(col("score").desc, col("doc_id").asc)
        .limit(HybridC)
      TextSearch.rrfFuse(bmTop, cosTop, "doc_id", 10, RrfK)
    }),

    // ---- Text analysis: CCNet-style bigram-LM scoring — train add-one
    // smoothed bigram/unigram counts on the corpus, score each doc by
    // mean negative log-prob (sequential in-order fold; libm-exact ln)
    "t_lm_score" -> ((s, dir) =>
      LmScore.selfScore(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")),

    // ---- Stupid Backoff trigram self-score (Brants et al. 2007 — the
    // smoothing designed for distributed web-scale LMs): singleton
    // trigrams pruned so all three tiers fire; every tier one exact-int
    // division, libm-exact ln, token-order fold
    "t_lm_backoff" -> ((s, dir) =>
      LmScore.backoffSelfScore(Tables.documents(s, dir), "doc_id", "text",
        trigramMinCount = 2L).orderBy("doc_id")),

    // ---- CCNet head/middle/tail bucketing (Wenzek et al. 2020 §4.3):
    // per-LANGUAGE exact tercile cutoffs over the bigram-LM self-score —
    // six bounded radix passes for the cutoffs, a |langs|-row broadcast
    // join for the labels; docs with no score label 'unscored'
    "t_ccnet_buckets" -> ((s, dir) =>
      LmScore.perplexityBuckets(Tables.documents(s, dir), "doc_id", "text",
        "lang").orderBy("doc_id")),

    // ---- Unicode NFC normalization (the mojibake/encoding-repair
    // curation pass): the ASCII corpus is already normalized, so the
    // query PLANTS decomposed sequences deterministically (e +
    // combining acute U+0301) with the same non-regex replace in both
    // engines — the codegen kernel (JDK Normalizer, no-alloc fast path
    // for already-normal text) then has real composition work that the
    // DuckDB nfc_normalize (utf8proc) oracle checks byte-for-byte;
    // both implement the same normative Unicode algorithm
    "t_normalize" -> ((s, dir) =>
      Tables.documents(s, dir)
        .withColumn("t2", expr(
          "replace(text, ' merge ', ' café ﬁle merge ')"))
        .select(col("doc_id"),
          length(col("t2")).cast("long").as("len_raw"),
          length(graft.expressions.TextKernels.unicodeNormalize(col("t2"),
            "NFC")).cast("long").as("len_nfc"),
          md5(graft.expressions.TextKernels.unicodeNormalize(col("t2"),
            "NFC")).as("nfc_md5"))
        .orderBy("doc_id")),

    // ---- Curation: markup strip + HTML entity decode (the
    // crawl-ingest extraction front that runs before any quality
    // rule). The synthetic corpus is plain text, so the query
    // manufactures the marked-up twin deterministically IN the query
    // (the corpus_diff / t_normalize precedent): wrap in
    // html/head/title/style/body, plant a comment and a script block
    // keyed by lang/n_chars, and entity-encode three vocabulary
    // words. The oracle replays the same construction and the same
    // RE2∩Java regex chain in SQL; raw-text round-trip equality is
    // CurationOpsSpec's job. Pure per-row codegen scan, no shuffle.
    "t_html_strip" -> ((s, dir) => {
      val enc = replace(replace(replace(col("text"),
        lit(" a "), lit(" &amp; ")),
        lit(" the "), lit(" &quot;the&quot; ")),
        lit(" fast "), lit("&nbsp;fast&nbsp;"))
      val html = concat(
        lit("<html><head><title>doc "), col("doc_id").cast("string"),
        lit(" ("), col("source"),
        lit(")</title><style type=\"text/css\">p{margin:0}</style>" +
          "</head><body><h1 class=\"t\">"), col("source"),
        lit("</h1><!-- lang="), col("lang"),
        lit(" --><script>var n="), col("n_chars").cast("string"),
        lit(";</script><p>"), enc, lit("</p></body></html>"))
      Tables.documents(s, dir)
        .select(col("doc_id"),
          Curation.htmlTitle(html).as("title"),
          Curation.htmlStrip(html).as("clean"))
        .orderBy("doc_id")
    }),

    // ---- Text analysis: exact quarter-quantiles of doc length per lang
    // (quarter fractions over ints interpolate exactly in both engines)
    "t_quantiles" -> ((s, dir) =>
      Tables.documents(s, dir)
        .groupBy("lang")
        .agg(expr("percentile(n_chars, 0.25)").as("p25"),
          expr("percentile(n_chars, 0.5)").as("p50"),
          expr("percentile(n_chars, 0.75)").as("p75"),
          count(lit(1)).as("n"))
        .orderBy("lang")),

    // ---- Robust statistics: per-group median absolute deviation —
    // the outlier-resistant spread a curation pipeline uses where a
    // stddev would chase heavy tails. Two exact interpolated medians
    // (percentile ≡ quantile_cont, the t_quantiles pairing); the
    // per-group median broadcasts back as a dim join
    "q_mad" -> ((s, dir) => {
      val med = Tables.documents(s, dir).groupBy("lang")
        .agg(expr("percentile(n_chars, 0.5)").as("med"))
      Tables.documents(s, dir).join(broadcast(med), Seq("lang"))
        .groupBy("lang")
        .agg(expr("percentile(abs(n_chars - med), 0.5)").as("mad"),
          count(lit(1)).as("n"))
        .orderBy("lang")
    }),

    // ---- Flagship curation pipeline: the training-data path end-to-end
    // — language ID + quality gate + exact-dup keep-first + MinHash-LSH
    // near-dup removal, composed with semi/anti joins. Oracle = the same
    // component oracles composed as subqueries. The LSH hot-bucket
    // guard stays ON (mirrored in the oracle's bucket-size cutoff), so
    // the showcase pipeline runs the same bounded-fan-out configuration
    // it would at 100×.
    // ---- Mixture flagship: the multilingual rebalancing recipe end to
    // end — temperature-balance the languages (quotas ∝ √n_s flatten
    // the head), fractionally epoch-upsample the tail (1.5 epochs of
    // everything but en, the deterministic salted-hash half-copy), then
    // the per-language mixture manifest a training-data pipeline logs
    // (rows with copies, distinct docs, char mass). Every stage is the
    // already-oracle'd operator, so the whole composition replays
    // bit-exactly.
    "pipeline_mixture" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val selected = Sampling.temperatureSample(docs, "lang", "doc_id", 300L)
      // epochs: 1.0 for the head language, 1.5 for every tail language —
      // derived from the corpus (bounded: one distinct over the lang
      // column) so a regenerated testdata with extra languages keeps
      // matching the oracle's CASE lang WHEN 'en' … ELSE … semantics
      val langs = docs.select("lang").distinct().collect()
        .map(_.getString(0)).filter(_ != null)
      val epochs = langs.map(l => l -> (if (l == "en") 1.0 else 1.5)).toMap
      val mixed = Sampling.upsample(selected, "lang", "doc_id", epochs)
      mixed.groupBy("lang").agg(
          count(lit(1)).as("n_rows"),
          countDistinct(col("doc_id")).as("n_docs"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy("lang")
    }),

    "pipeline_curate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val keepers = docs.groupBy(md5(col("text")))
        .agg(min(col("doc_id")).as("keep_id"))
        .select(col("keep_id"))
      val nearDupLosers = Dedup.minhashLshPairs(docs, "doc_id", "text",
        numHashes = 8, bands = 4, shingle = 3,
        maxBucket = DedupMaxBucket).select(col("b"))
      // lang/quality are per-row scalars — computed inline, not joined
      // back (two fewer shuffles than the component-per-join shape; the
      // oracle composes the same component SQL as subqueries either way)
      docs
        .withColumn("lang_pred", TextFunctions.langId(col("text")))
        .withColumn("quality", TextFunctions.qualityScore(col("text")))
        .filter(col("lang_pred") === "en" && col("quality") >= 0.5)
        .join(keepers, col("doc_id") === col("keep_id"), "left_semi")
        .join(nearDupLosers, col("doc_id") === col("b"), "left_anti")
        .select("doc_id", "lang_pred", "quality")
        .orderBy("doc_id")
    }),

    // ---- Multimodal REAL decode: build PCM8 WAV containers from doc
    // text bytes, parse them back with the pure-JVM RIFF codec, emit
    // signal stats. The oracle recomputes the stats straight from the
    // characters — pinning header round-trip, sample extraction, and
    // the rms arithmetic (integer Σ sample², then one sqrt/div).
    "mm_wav_decode" -> ((s, dir) => {
      import s.implicits._
      val wavs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, t) =>
          (id, MediaCodec.encodeWav(t.getBytes("UTF-8"), sampleRate = 8000))
        }.toDF("doc_id", "media")
      Multimodal.audioFeatures(wavs, "doc_id", "media").orderBy("doc_id")
    }),

    // ---- Multimodal VAD: frame-level energy + silence trimming over
    // the same text→PCM fixture (32-sample frames, mean-square
    // threshold 2000 — the corpus's frame mean-squares span 49..5088,
    // so voiced and silent frames both occur) — the exact-integer
    // Σs² > thr·n verdict, first/last-voiced trim window, and kept-range
    // stats all replay in the oracle from ord(char)−128
    "mm_audio_vad" -> ((s, dir) => {
      import s.implicits._
      val wavs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, t) =>
          (id, MediaCodec.encodeWav(t.getBytes("UTF-8"), sampleRate = 8000))
        }.toDF("doc_id", "media")
      Multimodal.audioVad(wavs, "doc_id", "media",
        frameLen = 32, meanSqThreshold = 2000L).orderBy("doc_id")
    }),

    // ---- Multimodal REAL JPEG decode: per-doc block-constant grayscale
    // JPEGs — encoded AND decoded distributed through the JDK's
    // javax.imageio (a real compressed codec, no stub). At quality 1.0
    // the quant tables are all ones and each 8×8 block is DC-only, so
    // the round-trip is bit-exact (pinned in MultimodalSpec) and the
    // oracle recomputes width/height/lum_sum/mean_channel in closed
    // form from (doc_id, block grid) — hash-checking that the codec
    // really ran and extracted the right pixels, not just the header.
    "mm_jpeg_decode" -> ((s, dir) => {
      import s.implicits._
      val jpegs = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .map { id =>
          val w = (24 + id % 41).toInt
          val h = (16 + id % 29).toInt
          val rgb = new Array[Byte](3 * w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = ((id * 31 + (x / 8) * 7 + (y / 8) * 13) % 256).toByte
              val p = 3 * (y * w + x)
              rgb(p) = v; rgb(p + 1) = v; rgb(p + 2) = v
              x += 1
            }
            y += 1
          }
          (id, MediaCodec.encodeJpeg(w, h, rgb, quality = 1.0f))
        }.toDF("doc_id", "media")
      Multimodal.imageStats(jpegs, "doc_id", "media").orderBy("doc_id")
    }),

    // ---- Image quality metrics over the same bit-exact JPEG fixture:
    // exact-integer contrast sums + 4-neighbor Laplacian magnitude (the
    // variance-of-Laplacian blur detector's core) — nonzero exactly at
    // the 8×8 block boundaries of the fixture, so the oracle's
    // closed-form replay checks the real decoded pixel NEIGHBORHOODS,
    // not just totals
    "mm_image_quality" -> ((s, dir) => {
      import s.implicits._
      val jpegs = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .map { id =>
          val w = (24 + id % 41).toInt
          val h = (16 + id % 29).toInt
          val rgb = new Array[Byte](3 * w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val v = ((id * 31 + (x / 8) * 7 + (y / 8) * 13) % 256).toByte
              val p = 3 * (y * w + x)
              rgb(p) = v; rgb(p + 1) = v; rgb(p + 2) = v
              x += 1
            }
            y += 1
          }
          (id, MediaCodec.encodeJpeg(w, h, rgb, quality = 1.0f))
        }.toDF("doc_id", "media")
      Multimodal.imageQuality(jpegs, "doc_id", "media").orderBy("doc_id")
    }),

    // ---- Multimodal REAL PNG decode: full-color per-pixel pattern.
    // PNG is lossless, so unlike the JPEG query the fixture needs no
    // structural constraint — three independent channel formulas prove
    // full-RGB fidelity through encode → distributed decode.
    "mm_png_decode" -> ((s, dir) =>
      Multimodal.imageStats(pngFixture(s, dir), "doc_id", "media")
        .orderBy("doc_id")),

    // ---- Multimodal REAL resize: decode the PNG fixture and
    // nearest-neighbor resample to 16×12; the oracle replays the exact
    // index mapping (sx = ⌊x·w/16⌋, sy = ⌊y·h/12⌋) in closed form, so
    // the resample arithmetic — not just the dims — is hash-checked
    "mm_resize" -> ((s, dir) =>
      Multimodal.imageResizeStats(pngFixture(s, dir), "doc_id", "media",
          dstW = 16, dstH = 12)
        .orderBy("doc_id")),

    // ---- Multimodal REAL perceptual hash: PNG-encoded grouped images
    // → distributed decode → 9×7 nearest resample → 56-bit dHash. The
    // oracle replays decode + resample + gradient-compare in closed
    // form (same dx·w//9 index mapping as mm_resize), so the whole
    // perceptual-hash arithmetic is hash-checked bit-for-bit.
    "mm_dhash" -> ((s, dir) =>
      Multimodal.imageDHash(dhashFixture(s, dir), "doc_id", "media")
        .orderBy("doc_id")),

    // ---- Image near-dup dedup: dHash + banded Hamming pairs. Groups
    // of visually-near-identical images (one perturbed pixel apart)
    // land within Hamming ≤ 2; candidate generation is the pigeonhole
    // band join (4 bands × 14 bits, complete for maxDist 3 by
    // construction), never all-pairs — the oracle checks the exact
    // pair set plus distances against its own all-pairs join.
    "dedup_image_neardup" -> ((s, dir) =>
      Dedup.hammingNearDupPairs(
        Multimodal.imageDHash(dhashFixture(s, dir), "doc_id", "media"),
        "doc_id", "dhash", maxDist = 3, hashBits = 56, nBlocks = 4)
        .orderBy("a", "b")),

    // ---- Incremental image dedup: new batch (doc_id ≡ 0 mod 7) vs the
    // already-ingested corpus, cross-side pairs only — the streaming
    // flush screen at per-batch cost. Same blocked screen; the oracle
    // is the honest cross join between the two sides.
    "dedup_image_incremental" -> ((s, dir) => {
      val hashes = Multimodal.imageDHash(dhashFixture(s, dir), "doc_id", "media")
      Dedup.hammingNearDupPairsAgainst(
        hashes.filter(col("doc_id") % 7 === 0),
        hashes.filter(col("doc_id") % 7 =!= 0),
        "doc_id", "dhash", maxDist = 3, hashBits = 56, nBlocks = 4)
        .orderBy("new_id", "old_id")
    }),

    // ---- Multimodal REAL MP3 container parse: spec-exact CBR frame
    // streams (headers + frame-length hops are real MPEG-1 Layer III;
    // bodies carry no audio) walked distributed; the oracle recomputes
    // frame length 144·bitrate/rate and duration n·1152·1000/44100 in
    // closed form — sample DECODE stays out of scope (no JDK MP3
    // decoder), frame-level parsing is the real pipeline need
    "mm_mp3_frames" -> ((s, dir) => {
      import s.implicits._
      val mp3s = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .map { id =>
          (id, MediaCodec.buildMp3(
            nFrames = (3 + id % 9).toInt, bitrateIdx = (1 + id % 14).toInt))
        }.toDF("doc_id", "media")
      Multimodal.mp3Stats(mp3s, "doc_id", "media")
        .select("doc_id", "n_frames", "bitrate_kbps", "n_samples",
          "duration_ms", "total_bytes")
        .orderBy("doc_id")
    }),

    // ---- Multimodal REAL H.264 Annex-B NAL scan: SPS+PPS + GOPs of
    // IDR/non-IDR slices, start codes scanned distributed — the
    // keyframe indexing video sharding needs before any pixel decode
    "mm_h264_nals" -> ((s, dir) => {
      import s.implicits._
      val streams = Tables.documents(s, dir).select(col("doc_id")).as[Long]
        .map { id =>
          (id, MediaCodec.buildH264Stream(
            gops = (1 + id % 5).toInt, gopLen = (2 + id % 4).toInt))
        }.toDF("doc_id", "media")
      Multimodal.h264Stats(streams, "doc_id", "media").orderBy("doc_id")
    }),

    // ---- Multimodal: frame sampling over binary payloads
    "mm_frame_sample" -> ((s, dir) =>
      Multimodal.sampleFrames(
        Multimodal.asMediaTable(Tables.documents(s, dir), "doc_id", "text"),
        "doc_id", "media", strideBytes = 64)
        .select(col("doc_id"), col("frame_no").cast("long").as("frame_no"),
          col("byte_offset"))
        .orderBy("doc_id", "frame_no")),

    // ---- PII detection + redaction. Synthetic PII is salted into each
    // doc deterministically (both engines build the same string) so the
    // regex machinery is exercised on every row; patterns are restricted
    // to Java-regex ∩ RE2 syntax so the oracle runs identical strings.
    "t_pii" -> ((s, dir) => {
      val salted = piiSalted(col("text"), col("doc_id"))
      val sig = graft.functions.PiiFunctions.piiSignals(salted)
      Tables.documents(s, dir).select(col("doc_id"),
          sig("n_emails").as("n_emails"), sig("n_phones").as("n_phones"),
          sig("n_ipv4").as("n_ipv4"),
          md5(graft.functions.PiiFunctions.redactPii(salted)).as("redacted_md5"))
        .orderBy("doc_id")
    }),

    // ---- Benchmark-contamination screen: corpus docs sharing ≥2 word
    // 3-grams with the held-out benchmark slice (doc_id % 50 == 0).
    // Benchmark gram set broadcast; corpus never self-joined.
    "contamination" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      Contamination.overlap(docs.filter(col("doc_id") % 50 =!= 0),
          docs.filter(col("doc_id") % 50 === 0), "doc_id", "text",
          n = 3, minShared = 2)
        .orderBy("doc_id")
    }),

    // ---- Bloom-screened blocklist subtraction: EXACT corpus − blocklist
    // by content hash. The bitmap (one small-side aggregation) rides the
    // corpus scan as a codegen filter; definite-negatives bypass the
    // join entirely, only the fpp sliver pays the exact verify anti-join
    // — so the result hash-matches the plain anti-join oracle even with
    // a probabilistic screen in the middle.
    "bloom_blocklist" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val blocklist = docs.filter(col("doc_id") % 7 === 0)
        .select(md5(col("text")).as("bad_md5"))
      // expectedKeys is a static ESTIMATE (table stats / KMV at scale),
      // not a count() — sizing must not cost an extra blocklist scan.
      // Over- or under-estimating only moves the fpp; exactness is the
      // verify join's guarantee regardless (Bloom.subtractByKey doc).
      Bloom.subtractByKey(docs, md5(col("text")), blocklist, col("bad_md5"),
          expectedKeys = 1 << 17, fpp = 0.01)
        .select("doc_id", "source")
        .orderBy("doc_id")
    }),

    // ---- Snapshot diff (dataset versioning): the delta report between
    // two corpus generations — the "new" side is derived from the old
    // with deterministic churn (removals %13, edits %7, additions
    // shifted past the id range), so both engines diff identical
    // snapshots; payloads collapse to md5 map-side and ONE id-equi
    // full-outer join carries ~50 B/row regardless of document size
    "corpus_diff" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val newSnap = docs.filter(col("doc_id") % 13 =!= 0)
        .withColumn("text", when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" [edited]"))).otherwise(col("text")))
        .unionByName(docs.filter(col("doc_id") % 31 === 0)
          .withColumn("doc_id", col("doc_id") + 10000000L))
      Crud.snapshotDiff(docs, newSnap, "doc_id", "text")
        .orderBy("doc_id")
    }),

    // ---- Context-window chunking: 64-token windows, 16-token overlap
    "chunk_docs" -> ((s, dir) =>
      Chunker.chunk(Tables.documents(s, dir), "doc_id", "text",
          chunkTokens = 64, overlap = 16)
        .select(col("doc_id"), col("chunk_id"),
          md5(col("chunk_text")).as("chunk_md5"), col("n_chunk_tokens"))
        .orderBy("doc_id", "chunk_id")),

    // ---- Sentence-boundary chunking (the RAG chunker that never
    // splits a sentence): the corpus text carries no punctuation, so
    // the query first derives boundaries deterministically (the same
    // non-regex replace in both engines) — then bins whole sentences
    // by capacity-binned cumulative token count. Chunks may exceed
    // capacity by at most one sentence, the boundary-respecting trade.
    "chunk_sentences" -> ((s, dir) =>
      Chunker.sentenceChunks(
        Tables.documents(s, dir).withColumn("text",
          expr("replace(text, ' merge ', ' merge. ')")),
        "doc_id", "text", capacityTokens = 48)
        .select(col("doc_id"), col("chunk_id"), col("n_sentences"),
          col("n_chunk_tokens"), md5(col("chunk_text")).as("chunk_md5"))
        .orderBy("doc_id", "chunk_id")),

    // ---- Concat-and-slice sequence packing into 2048-token windows —
    // distributed prefix sum (no single-reducer global window); the
    // oracle is the equivalent SQL window cumsum.
    "pack_offsets" -> ((s, dir) =>
      Chunker.packOffsets(
        Tables.documents(s, dir).select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).as("n_tok")),
        "doc_id", "n_tok", capacity = 2048, numPartitions = 8)
        .orderBy("doc_id")),

    // ---- Curriculum ordering (Bengio et al. 2009, ICML: train
    // easy→hard): difficulty stages by a data-independent token-count
    // threshold, a DETERMINISTIC within-stage shuffle, and the loader
    // windows packed in that order. The shuffle is a 40-bit
    // bit-reversal permutation of doc_id — a true bijection (no hash
    // ties to break, no global row_number window, which would be a
    // single-reducer sort), scattering adjacent ids across the stage
    // the way a low-discrepancy sequence does. The total order
    // (stage · 2^40 + bitrev) materializes ONLY through packOffsets'
    // two-pass distributed prefix sum, so nothing here is a scale
    // killer; the oracle replays the permutation bit for bit.
    "pipeline_curriculum" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).as("n_tok"))
      val stage = when(col("n_tok") < 40L, 0L)
        .when(col("n_tok") < 80L, 1L).otherwise(2L)
      val rev = (0 until 40).map(i =>
          shiftleft(shiftright(col("doc_id"), i).bitwiseAND(lit(1L)), 39 - i))
        .reduce(_ + _)
      val keyed = docs.withColumn("stage", stage)
        .withColumn("ord", col("stage") * lit(1L << 40) + rev)
      Chunker.packOffsets(keyed, "ord", "n_tok", capacity = 2048,
          numPartitions = 8)
        .select(col("doc_id"), col("stage"), col("ord"),
          col("pack_id"), col("pack_offset"))
        .orderBy("doc_id")
    }),

    // ---- Full sequence-packing plan: one row per (document, training
    // window) overlap, with in-document slice offsets and in-window
    // placement — what a training loader consumes to assemble
    // fixed-length samples with document-boundary attention masks.
    // Window fan-out is closed-form on top of the distributed prefix
    // sum; the oracle replays it with a window cumsum + generate_series.
    "pack_windows" -> ((s, dir) =>
      Chunker.packWindows(
        Tables.documents(s, dir).select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).as("n_tok")),
        "doc_id", "n_tok", capacity = 2048, numPartitions = 8)
        .select(col("doc_id"), col("n_tok"), col("win_id"),
          col("win_offset"), col("slice_start"), col("slice_len"))
        .orderBy("doc_id", "win_id")),

    // ---- Third flagship composition: tokenizer-aware packing — BPE
    // token counts (fixed chain, per-row) feed the packWindows loader
    // plan, so window boundaries fall on REAL subword counts instead of
    // whitespace proxies. Oracle composes the BPE replace-chain count
    // with the window-tiling replay; still one prefix-sum shuffle total.
    // ---- Fourth flagship: the published-pipeline line-level curation
    // chain — Gopher gate (Rae'21) → C4 line rules (Raffel'20) →
    // corpus-global line dedup (RefinedWeb) → sharded export manifest.
    // The per-row gates ride the scan; corpus-wide work is ONE
    // line-content aggregation plus the bounded manifest rollup — and
    // every stage's oracle composes into one statement.
    "pipeline_line_curate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val gated = docs.filter(Curation.gopherPass(col("text"),
        minWords = 30L, maxWords = 90L, minStopHits = 1L))
      val cleaned = Curation.c4CleanLines(gated, "doc_id",
          Curation.wordWindows(col("text"), 8), minWords = 5,
          requirePunct = false)
        .filter(!col("doc_dropped") && col("n_kept") > 0)
        .select(col("doc_id"), col("text_clean"))
      val deduped = Curation.globalLineDedup(cleaned, "doc_id",
          split(col("text_clean"), "\n"))
        .filter(col("n_kept") > 0)
      Export.manifest(deduped, "doc_id", "text_dedup",
        length(col("text_dedup")), nShards = 4).orderBy("shard")
    }),

    // ---- Fifth flagship: the round's new operators composed — Gopher
    // gate → ExactSubstr span dedup (global-first-occurrence spans
    // removed) → phrase mining learned ON the deduped survivors and
    // applied as the '_'-joining rewrite → sharded export manifest.
    // Every stage oracle is parameterized and composed into one
    // statement; corpus-wide work = the span-dedup gram aggregation,
    // two phrase-count aggregations, and the bounded manifest rollup.
    "pipeline_span_curate" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val gated = docs.filter(Curation.gopherPass(col("text"),
        minWords = 30L, maxWords = 90L, minStopHits = 1L))
      // persist the curated intermediate: phrase learning reads it
      // twice (unigram + pair counts) and the rewrite + manifest again
      // — without this the multi-shuffle span-dedup DAG re-plans 4×
      val deduped = Curation.exactSpanDedup(gated, "doc_id", "text", 5)
        .filter(col("text_dedup") =!= "")
        .select(col("doc_id"), col("text_dedup").as("text"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val phr = Phrases.topPhrases(deduped, "text", k = 5,
        delta = 5L, minCount = 10L)
      val rewritten = Phrases.applyPhrases(deduped, "doc_id", "text", phr)
      Export.manifest(rewritten, "doc_id", "text_phr",
        length(col("text_phr")), nShards = 4).orderBy("shard")
    }),

    // ---- Dataset audit: cross-source passage-overlap matrix — for
    // every source pair, the count of distinct 4-word windows present
    // in BOTH plus the Jaccard of the two window vocabularies: the
    // provenance/contamination report a multi-source corpus assembly
    // reads before mixing (which crawls duplicate which, where one
    // dump is another filtered). Scale shape: ONE (source, window)
    // distinct aggregation over the corpus; per-window source sets are
    // bounded by |sources|, so pair fan-out is ≤ C(|sources|, 2) per
    // window — never doc-pair work — and the final joins touch
    // |sources|-row tables only.
    "corpus_overlap" -> ((s, dir) => {
      val win = Tables.documents(s, dir)
        .select(col("source"),
          explode(Curation.wordWindows(col("text"), 4)).as("w"))
        .distinct()
      val bySrc = win.groupBy("w")
        .agg(sort_array(collect_set(col("source"))).as("ss"))
        .filter(size(col("ss")) > 1)
      val pairs = bySrc
        .select(col("ss"), posexplode(col("ss")).as(Seq("i", "sa")))
        .select(col("sa"),
          explode(slice(col("ss"), col("i") + 2, size(col("ss")))).as("sb"))
      val sizes = win.groupBy("source").agg(count(lit(1)).as("nw"))
      pairs.groupBy("sa", "sb").agg(count(lit(1)).as("n_shared"))
        .join(sizes.select(col("source").as("sa"), col("nw").as("na")), "sa")
        .join(sizes.select(col("source").as("sb"), col("nw").as("nb")), "sb")
        .withColumn("jaccard",
          col("n_shared") / (col("na") + col("nb") - col("n_shared")))
        .select("sa", "sb", "n_shared", "na", "nb", "jaccard")
        .orderBy("sa", "sb")
    }),

    // ---- Dataset-card flagship: the per-language statistics block a
    // corpus release ships (HF dataset card / Dolma-style datasheet) in
    // ONE composed statement — doc/char/token mass, exact-dup count,
    // Gopher pass count, distinct sources, PII email mass, and EXACT
    // length percentiles. Two bounded aggregations over one corpus scan
    // each (the distinct pairs expand map-side), six radix passes for
    // the exact cutoffs, a |langs|-row join to stitch — nothing
    // corpus-shuffled beyond the lang groupBy.
    "pipeline_datacard" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val pass = Curation.gopherPass(col("text"), minWords = 30L,
        maxWords = 90L, minStopHits = 1L)
      val base = docs.groupBy("lang").agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(TextFunctions.tokenCount(col("text"))).as("sum_tokens"),
        (count(lit(1)) - countDistinct(md5(col("text")))).as("n_dup_docs"),
        sum(when(pass, 1L).otherwise(0L)).as("n_gopher_pass"),
        countDistinct(col("source")).as("n_sources"),
        sum(regexp_count(col("text"),
          lit(graft.functions.PiiFunctions.EmailRe)).cast("long"))
          .as("n_pii_emails"))
      val cuts = Sketch.exactQuantilesDiscGrouped(docs, col("lang"),
          col("n_chars"), Seq(0.5, 0.9))
        .select(col("g").as("lang"), col("q0").as("p50_chars"),
          col("q1").as("p90_chars"))
      base.join(cuts, Seq("lang")).orderBy("lang")
    }),

    // ---- RAG retrieval flagship — the reference's CORE serving shape
    // (embed + store + /search, api/app.py) composed at passage level,
    // end to end in ONE plan: context-window chunking (64-token windows,
    // 16 overlap) → md5-count hashing embedder per chunk → exact cosine
    // top-k over the chunk vectors (TakeOrderedAndProject — per-partition
    // heap, no corpus shuffle) → hydrate the hits with chunk text + doc
    // metadata through two 10-row broadcast joins. Integer-exact count
    // embeddings make the entire path oracle-checkable (the
    // e1_embed_oracle / e2_embed_search construction); the chunk id
    // tie-break is the doc:chunk string, compared identically (binary
    // collation) in both engines.
    "pipeline_rag" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val chunks = Chunker.chunk(docs, "doc_id", "text",
          chunkTokens = 64, overlap = 16)
        .filter(col("n_chunk_tokens") > 0)
        .select(col("doc_id"), col("chunk_id"),
          concat_ws(":", col("doc_id"), col("chunk_id")).as("cid"),
          col("chunk_text"))
      val emb = HashingEmbedder.embedMd5Counts(chunks, "cid", "chunk_text",
        dim = 64)
      val q = HashingEmbedder.md5CountsLocal(EmbedQueryText, 64).map(_.toFloat)
      Search.knnCosine(emb, "cid", "embedding", q.toSeq, 10)
        .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
        .select(col("doc_id"), col("chunk_id"), col("source"),
          md5(col("chunk_text")).as("chunk_md5"), col("dist"))
        .orderBy(col("dist").asc, col("doc_id").asc, col("chunk_id").asc)
    }),

    "pipeline_tokenize_pack" -> ((s, dir) => {
      val counted = Bpe.tokenize(Tables.documents(s, dir), "doc_id", "text",
          FixedBpeMerges)
        .select(col("doc_id"), col("n_bpe_tokens").as("n_tok"))
      Chunker.packWindows(counted, "doc_id", "n_tok", capacity = 1024,
          numPartitions = 8)
        .select(col("doc_id"), col("n_tok"), col("win_id"),
          col("win_offset"), col("slice_start"), col("slice_len"))
        .orderBy("doc_id", "win_id")
    }),

    // ---- B9 with a fixed deterministic codebook: the k-means path is
    // rows-only (b9_pq_encode), but the encode ARITHMETIC (per-chunk
    // strict-argmin over double-fold distances) is oracle-exact here —
    // the codebook values are embedded in the generated SQL as exact
    // double literals.
    "b9_pq_encode_fixed" -> ((s, dir) =>
      Pq.encode(Tables.embeddings(s, dir), "embedding", fixedPqCodebook)
        .select(col("vec_id"),
          concat_ws("-", col("pq_code").cast("array<string>")).as("code"))
        .orderBy("vec_id")),

    // ---- ADC top-k with the fixed codebook — oracle recomputes the
    // distance table from the query vector with the identical operation
    // sequence, so the full PQ search path hash-matches.
    // ---- O6 compression tier 3: SQ8 scalar quantization — per-dim
    // exact min/max grid (order-free training: no sample, no seed),
    // closed-form encode, full-precision-query ADC. Fully oracle-exact
    // INCLUDING training, unlike the k-means tiers (their training is
    // iterative; their fixed-codebook twins pin the search arithmetic).
    "o6_sq8_encode" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val m = Sq.train(emb, "embedding")
      Sq.encode(emb, "embedding", m)
        .select(col("vec_id"),
          concat_ws("-", col("sq_code").cast("array<string>")).as("code"))
        .orderBy("vec_id")
    }),

    "o6_sq8_adc_topk" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") === QueryVecId)
        .select("embedding").head.getSeq[Float](0).toSeq
      val m = Sq.train(emb, "embedding")
      Sq.adcSearch(Sq.encode(emb, "embedding", m), "vec_id", "sq_code", m, q, k = 10)
        .select("vec_id", "dist")
    }),

    // ---- O6 tier: 1-bit binary quantization. Train-free (the code
    // column IS the index); encode + Hamming are integer arithmetic, so
    // all three stages are fully oracle-checked — including the
    // screen-then-rerank shape every BQ deployment runs.
    "o6_bq_encode" -> ((s, dir) =>
      Bq.encode(Tables.embeddings(s, dir), "embedding")
        .select(col("vec_id"),
          concat_ws("-", col("bq_code").cast("array<string>")).as("code"))
        .orderBy("vec_id")),

    "o6_bq_hamming" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") === QueryVecId)
        .select("embedding").head.getSeq[Float](0).toSeq
      Bq.hammingSearch(Bq.encode(emb, "embedding"), "vec_id", "bq_code",
          q, k = 10)
        .select("vec_id", "ham")
    }),

    // ---- O7 composition on the BQ tier: metadata filter BEFORE the
    // Hamming screen + rerank (exclusion contract: non-matching rows
    // can never appear; window is filled from the filtered subset)
    // ---- Centered BQ on a NON-centered corpus — the configuration
    // zero-threshold BQ is blind on (all-positive embeddings pack one
    // constant code; ScaleProbe bq_recall_sweep measured 0/10 recall at
    // every rerank window). The corpus shifts +5 in-query so every
    // component is positive; Bq.trainThresholds (per-dim range
    // midpoints, order-free exact like SQ8's grid) re-centers the bits,
    // and BOTH the training and the screen+rerank replay in SQL.
    "o6_bq_centered" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir).select(col("vec_id"),
        transform(col("embedding"), v => v + lit(5.0f)).as("embedding"))
      val q = emb.filter(col("vec_id") === QueryVecId)
        .select("embedding").head.getSeq[Float](0).toSeq
      val th = Bq.trainThresholds(emb, "embedding").toSeq
      Bq.rerankSearch(Bq.encode(emb, "embedding", thresholds = th),
          "vec_id", "bq_code", "embedding", q, k = 10, rerank = 30,
          thresholds = th)
        .select(col("vec_id"), col("dist"))
    }),

    "o7_bq_filtered" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") === QueryVecId)
        .select("embedding").head.getSeq[Float](0).toSeq
      Bq.rerankSearch(Bq.encode(emb, "embedding"), "vec_id", "bq_code",
          "embedding", q, k = 10, rerank = 30,
          filter = Some(col("label") === 3))
        .select(col("vec_id"), col("label").cast("long").as("label"),
          col("dist"))
    }),

    "o6_bq_rerank" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") === QueryVecId)
        .select("embedding").head.getSeq[Float](0).toSeq
      Bq.rerankSearch(Bq.encode(emb, "embedding"), "vec_id", "bq_code",
          "embedding", q, k = 10, rerank = 30)
        .select("vec_id", "dist")
    }),

    "o6_pq_adc_fixed" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") === QueryVecId)
        .select("embedding").head.getSeq[Float](0).toSeq
      Pq.adcSearch(Pq.encode(emb, "embedding", fixedPqCodebook), "vec_id",
          "pq_code", fixedPqCodebook, q, k = 10)
        .select("vec_id", "dist")
        .orderBy(col("dist").asc, col("vec_id").asc)
    }),

    // ---- PQ two-stage: ADC top-30 shortlist → exact L2 rerank to
    // top-10 (the deployment shape that closes the quantization error
    // on the final ranking; Bq.rerankSearch / IvfPq-rerank's sibling).
    // Fixed codebook, so the shortlist boundary AND both distance
    // stages replay in SQL.
    "o6_pq_adc_rerank_fixed" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") === QueryVecId)
        .select("embedding").head.getSeq[Float](0).toSeq
      Pq.adcRerankSearch(Pq.encode(emb, "embedding", fixedPqCodebook),
          "vec_id", "pq_code", "embedding", fixedPqCodebook, q,
          k = 10, rerank = 30)
        .select("vec_id", "dist")
    }),

    // ---- O6 with fixed deterministic centroids: the k-means path is
    // rows-only (clustering isn't SQL-expressible), but the SEARCH
    // semantics — assign to nearest centroid, rank centroids to the
    // query, prune to n_probe clusters, exact (dist, id) top-k on the
    // survivors — are oracle-exact here, centroids embedded in the
    // generated SQL as exact double literals.
    "o6_ivf_fixed" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") === QueryVecId)
        .select("embedding").head.getSeq[Float](0).toSeq
      val model = Ivf.Model(fixedIvfCentroids, "embedding")
      Ivf.search(Ivf.assign(emb, model), model, "vec_id", q, nProbe = 2, topK = 10)
        .select("vec_id", "dist")
    }),

    // ---- IVF-PQ composite (FAISS-IVFPQ shape): coarse assign → residual
    // PQ encode → probe 2 clusters → per-cluster ADC tables → top-k.
    // Fixed centroids + fixed codebook make the whole path oracle-exact:
    // residual float rounding, per-chunk argmin encode, table lookups,
    // the (dist, id) tie-break — every stage hash-checked.
    "o6_ivfpq_fixed" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") === QueryVecId)
        .select("embedding").head.getSeq[Float](0).toSeq
      val model = IvfPq.Model(Ivf.Model(fixedIvfCentroids, "embedding"), fixedPqCodebook)
      IvfPq.search(IvfPq.encode(emb, "embedding", model), model, "vec_id",
        q, nProbe = 2, topK = 10).select("vec_id", "dist")
    }),

    // ---- IVF-PQ two-stage deployment: ADC shortlist (30) → exact
    // rerank. Also oracle-exact with the fixed model — pins the
    // shortlist boundary AND the exact re-scoring.
    "o6_ivfpq_rerank_fixed" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") === QueryVecId)
        .select("embedding").head.getSeq[Float](0).toSeq
      val model = IvfPq.Model(Ivf.Model(fixedIvfCentroids, "embedding"), fixedPqCodebook)
      IvfPq.search(IvfPq.encode(emb, "embedding", model), model, "vec_id",
        q, nProbe = 2, topK = 10, rerank = 30).select("vec_id", "dist")
    }),

    // ---- O7 composition on the compressed tiers (the VectorStore
    // dispatch semantics, VectorStore.searchAdc/searchSq/searchIvfPq:
    // the metadata predicate composes BELOW the ADC ranking — excluded
    // rows can never appear and the top-k window fills from the
    // filtered subset). Fixed codebook/centroids make each path
    // oracle-exact end to end.
    "o7_pq_filtered" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") === QueryVecId)
        .select("embedding").head.getSeq[Float](0).toSeq
      Pq.adcSearch(
          Pq.encode(emb.filter(col("label") === 3), "embedding", fixedPqCodebook),
          "vec_id", "pq_code", fixedPqCodebook, q, k = 10)
        .select(col("vec_id"), col("label").cast("long").as("label"),
          col("dist"))
    }),

    // SQ8 grid trained on the FULL corpus (the persisted-model shape:
    // the store's grid predates any request filter), filter applied to
    // the scanned rows
    "o7_sq8_filtered" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") === QueryVecId)
        .select("embedding").head.getSeq[Float](0).toSeq
      val m = Sq.train(emb, "embedding")
      Sq.adcSearch(Sq.encode(emb.filter(col("label") === 3), "embedding", m),
          "vec_id", "sq_code", m, q, k = 10)
        .select(col("vec_id"), col("label").cast("long").as("label"),
          col("dist"))
    }),

    // IVF-PQ: the predicate rides WITH the partition-pruned scan
    // (IvfPq.search composes it after probe pruning, before the ADC
    // rank — same rows out as filtering the corpus up front)
    "o7_ivfpq_filtered" -> ((s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val q = emb.filter(col("vec_id") === QueryVecId)
        .select("embedding").head.getSeq[Float](0).toSeq
      val model = IvfPq.Model(Ivf.Model(fixedIvfCentroids, "embedding"), fixedPqCodebook)
      IvfPq.search(IvfPq.encode(emb, "embedding", model), model, "vec_id",
          q, nProbe = 2, topK = 10, filter = Some(col("label") === 3))
        .select(col("vec_id"), col("label").cast("long").as("label"),
          col("dist"))
    }),

    // ---- Second flagship: the full training-export path end-to-end —
    // language/quality gate + exact-dup keep-first (pipeline_curate's
    // core) → benchmark decontamination → PII redaction → concat-and-
    // slice packing into 2048-token windows. Every stage is a component
    // with its own oracle; the composed SQL is their composition.
    "pipeline_export" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val keepers = docs.groupBy(md5(col("text")))
        .agg(min(col("doc_id")).as("keep_id")).select("keep_id")
      val gated = docs
        .withColumn("lang_pred", TextFunctions.langId(col("text")))
        .withColumn("quality", TextFunctions.qualityScore(col("text")))
        .filter(col("lang_pred") === "en" && col("quality") >= 0.5)
        .join(keepers, col("doc_id") === col("keep_id"), "left_semi")
        .filter(col("doc_id") % 50 =!= 0) // never train on the eval slice
      // contamination is screened on the RAW docs, not on `gated`:
      // removal is by doc_id, so extra flagged ids that gating would
      // drop anyway are harmless — and the gating lineage then feeds
      // ONLY the anti-join, running once instead of once per
      // decontaminate input reference
      val dirty = Contamination.overlap(docs,
        docs.filter(col("doc_id") % 50 === 0), "doc_id", "text",
        n = 3, minShared = 2).select("doc_id")
      val clean = gated.join(dirty, Seq("doc_id"), "left_anti")
      val redacted = clean.select(col("doc_id"),
        graft.functions.PiiFunctions.redactPii(col("text")).as("rtext"))
      // the md5 rides through packOffsets as payload — no join-back, so
      // the gating/decontamination/redaction lineage runs exactly once
      Chunker.packOffsets(
          redacted.select(col("doc_id"),
            TextFunctions.tokenCount(col("rtext")).as("n_tok"),
            md5(col("rtext")).as("text_md5")),
          "doc_id", "n_tok", capacity = 2048, numPartitions = 8)
        .select(col("doc_id"), col("n_tok"), col("pack_id"),
          col("pack_offset"), col("text_md5"))
        .orderBy("doc_id")
    }),

    // ---- JSONL export round-trip: the training-data sink format. Write
    // the docs as JSON lines, read them back with the same schema, and
    // prove content fidelity against the plain-table oracle.
    "export_jsonl" -> ((s, dir) => {
      val out = s"/tmp/graft_export_jsonl_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
      val docs = Tables.documents(s, dir)
        .select("doc_id", "text", "lang", "source", "n_chars")
      docs.write.mode("overwrite").json(out)
      s.read.schema(docs.schema).json(out)
        .select(col("doc_id"), md5(col("text")).as("text_md5"),
          col("lang"), col("source"), col("n_chars"))
        .orderBy("doc_id")
    }),

    // ---- JSONL INGEST round-trip (the READ front door — real corpora
    // arrive as jsonl.gz, not parquet): write the docs as gzipped JSON
    // lines, plant three corrupt lines (broken syntax / missing
    // required key / un-coercible id type), read back through
    // Tables.documentsJsonl. The oracle is the plain documents table —
    // so the gate proves gz-transparent parsing is content-exact AND
    // every planted line landed in quarantine, never in the corpus
    // (a quarantine miscount fails the query loudly).
    "ingest_jsonl" -> ((s, dir) => {
      val out = s"/tmp/graft_ingest_jsonl_${dir.replaceAll("[^a-zA-Z0-9]", "_")}" +
        s"_${ProcessHandle.current().pid()}"
      import s.implicits._
      Tables.documents(s, dir)
        .select("doc_id", "text", "lang", "source", "n_chars")
        .toJSON.write.mode("overwrite")
        .option("compression", "gzip").text(s"$out/in")
      Seq("{this is not json",
          """{"text": "valid json, but no doc_id"}""",
          """{"doc_id": "not-a-number", "text": "id will not coerce"}""")
        .toDF("value").write.mode("append").text(s"$out/in")
      val good = Tables.documentsJsonl(s, s"$out/in",
        quarantineDir = Some(s"$out/bad"))
      val quarantined = s.read.text(s"$out/bad").count()
      require(quarantined == 3,
        s"expected 3 quarantined lines, got $quarantined")
      good.select(col("doc_id"), md5(col("text")).as("text_md5"),
          col("lang"), col("source"), col("n_chars"))
        .orderBy("doc_id")
    }),

    // ---- CSV ingest round-trip: same quarantine contract as
    // ingest_jsonl over to_csv lines (headerless, schema-positional).
    // Planted corrupt lines: empty required field, uncoercible id,
    // broken quoting.
    "ingest_csv" -> ((s, dir) => {
      val out = s"/tmp/graft_ingest_csv_${dir.replaceAll("[^a-zA-Z0-9]", "_")}" +
        s"_${ProcessHandle.current().pid()}"
      import s.implicits._
      Tables.documents(s, dir)
        .select(to_csv(struct(col("doc_id"), col("text"), col("lang"),
          col("source"), col("n_chars"))).as("value"))
        .write.mode("overwrite").option("compression", "gzip").text(s"$out/in")
      Seq(""",text with empty id,en,web,5""",
          """not-a-number,uncoercible id,en,web,5""",
          ",,,,")
        .toDF("value").write.mode("append").text(s"$out/in")
      val good = Tables.readCsvLines(s, s"$out/in",
        quarantineDir = Some(s"$out/bad"))
      val quarantined = s.read.text(s"$out/bad").count()
      require(quarantined == 3,
        s"expected 3 quarantined lines, got $quarantined")
      good.select(col("doc_id"), md5(col("text")).as("text_md5"),
          col("lang"), col("source"), col("n_chars"))
        .orderBy("doc_id")
    }),

    // ---- WARC ingest: the crawl-corpus front door (Common Crawl ships
    // .warc.gz). The corpus is synthesized as per-partition gzipped
    // WARC segment files — one gzip member per record, a warcinfo
    // header record, and planted garbage between members to exercise
    // the lenient marker resync — then read back through Warc.read;
    // the oracle is the plain documents table (payload md5 + UTF-8
    // byte length), so parse fidelity is hash-gated.
    "ingest_warc" -> ((s, dir) => {
      import s.implicits._
      val out = s"/tmp/graft_ingest_warc_${dir.replaceAll("[^a-zA-Z0-9]", "_")}" +
        s"_${ProcessHandle.current().pid()}"
      val root = new java.io.File(out)
      if (root.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(root)
      }
      root.mkdirs()
      // segment writer: local-FS fixture generation (the READ direction
      // is the product; local[*] tasks share the driver's filesystem)
      Tables.documents(s, dir).select(col("doc_id"), col("text"))
        .as[(Long, String)].repartition(2)
        .mapPartitions { rows =>
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val bos = new java.io.ByteArrayOutputStream()
          bos.write(graft.sources.Warc.gzipMember(
            graft.sources.Warc.recordBytes("warcinfo", "urn:graft:warcinfo",
              "", "graft synthetic crawl".getBytes("UTF-8"),
              "application/warc-fields")))
          var c = 0L
          rows.foreach { case (id, text) =>
            if (c == 0) // malformed member: header line without a colon
              bos.write(graft.sources.Warc.gzipMember(
                "WARC/1.0\r\nbroken header no colon\r\n\r\n".getBytes("UTF-8")))
            bos.write(graft.sources.Warc.gzipMember(
              graft.sources.Warc.recordBytes("resource", s"urn:graft:doc:$id",
                s"graft://documents/$id", text.getBytes("UTF-8"))))
            c += 1
          }
          val f = new java.io.File(out, f"seg-$pid%05d.warc.gz")
          val fo = new java.io.FileOutputStream(f)
          try fo.write(bos.toByteArray) finally fo.close()
          Iterator.single(c)
        }.collect()
      graft.sources.Warc.read(s, out)
        .filter(col("warc_type") === "resource")
        .select(regexp_extract(col("target_uri"), "([0-9]+)$", 1)
            .cast("long").as("doc_id"),
          md5(col("payload")).as("text_md5"),
          col("content_length").as("n_bytes"))
        .orderBy("doc_id")
    }),

    // ---- SQL-first ingest pipeline flagship: the curation front end
    // in ONE SQL statement over a jsonl.gz corpus — schema-validated
    // read → Gopher quality gate → exact dedup (keep-first) →
    // deterministic leakage-stable split — composed from the table
    // functions via TABLE(...) arguments, no temp views, no Scala.
    // Catalyst plans the whole statement as one query (the gate's
    // filter sits directly on the JSON scan). Oracle = the identical
    // pipeline in DuckDB over the plain documents table.
    "pipeline_sql_ingest" -> ((s, dir) => {
      val out = s"/tmp/graft_sqlingest_${dir.replaceAll("[^a-zA-Z0-9]", "_")}" +
        s"_${ProcessHandle.current().pid()}"
      Tables.documents(s, dir)
        .select("doc_id", "text", "lang", "source", "n_chars")
        .toJSON.write.mode("overwrite")
        .option("compression", "gzip").text(s"$out/in")
      GraftTableFunctions.register(s) // idempotent on a live session
      s.sql(
        s"""SELECT split, count(*) AS n,
           |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
           |FROM hash_split(
           |  TABLE(SELECT * FROM dedup_exact(
           |    TABLE(SELECT * FROM quality_gate(
           |      TABLE(SELECT * FROM read_jsonl('$out/in')),
           |      'text', 30, 90, 1)),
           |    'doc_id', 'text')),
           |  'doc_id', 'train:0.75,val:0.125,test:0.125')
           |GROUP BY split ORDER BY split""".stripMargin)
    })
  )

  /** Shared PNG fixture for `mm_png_decode` / `mm_resize`: per-doc dims
    * (20+id%37 × 14+id%23) with three independent per-pixel channel
    * formulas — ONE definition on the engine side, mirrored once by
    * [[pngChannelSumSql]] on the oracle side, so a fixture edit can't
    * drift between the two queries and masquerade as a codec bug. */
  private def pngFixture(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .map { id =>
        val w = (20 + id % 37).toInt
        val h = (14 + id % 23).toInt
        val rgb = new Array[Byte](3 * w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = 3 * (y * w + x)
            rgb(p) = ((id * 31 + x * 7 + y * 13) % 256).toByte
            rgb(p + 1) = ((id * 17 + x * 5 + y * 11 + 85) % 256).toByte
            rgb(p + 2) = ((id * 23 + x * 3 + y * 19 + 170) % 256).toByte
            x += 1
          }
          y += 1
        }
        (id, MediaCodec.encodePng(w, h, rgb))
      }.toDF("doc_id", "media")
  }

  /** Shared grayscale PNG fixture for `mm_dhash` / `dedup_image_neardup`:
    * 97 groups of visually-near-identical images. The group id (doc_id
    * mod 97) fixes the dims (20+gid%13 × 16+gid%11) and the base pixel
    * pattern (gid·37 + x·53 + y·41 mod 256, grayscale r=g=b); each doc
    * additionally perturbs ONE group-chosen pixel (gid%w, gid%h) by
    * (doc_id%5)·40 — a perturbed sample pixel affects at most its two
    * adjacent horizontal gradient comparisons, so within-group dHashes
    * sit within Hamming distance 2 by construction and the near-dup
    * query is guaranteed a non-trivial pair set. x·53 keeps the
    * gradient wrapping mod 256 frequently, so hashes are bit-diverse
    * across groups rather than near-constant. */
  private def dhashFixture(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir).select(col("doc_id")).as[Long]
      .map { id =>
        val gid = id % 97
        val w = (20 + gid % 13).toInt
        val h = (16 + gid % 11).toInt
        val px = (gid % w).toInt
        val py = (gid % h).toInt
        val rgb = new Array[Byte](3 * w * h)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val base = (gid * 37 + x * 53 + y * 41) % 256
            val v =
              (if (x == px && y == py) (base + (id % 5) * 40) % 256 else base).toByte
            val p = 3 * (y * w + x)
            rgb(p) = v; rgb(p + 1) = v; rgb(p + 2) = v
            x += 1
          }
          y += 1
        }
        (id, MediaCodec.encodePng(w, h, rgb))
      }.toDF("doc_id", "media")
  }

  /** Oracle-side md5 SimHash fingerprint (the [[Dedup.simhashMd5Hex]]
    * construction: bit i of the sign-sum is bit (i mod 4) of hex nibble
    * (i div 4) of md5(token)), as a DuckDB CTE chain ending in
    * `fp(doc_id, simhash)` — shared by the `dedup_simhash` and
    * `dedup_simhash_neardup` oracles. */
  private val simhashOracleCtes: String = simhashCtes(distinct = true)

  /** tf-weighted twin: the token multiset instead of the set. */
  private val simhashWeightedOracleCtes: String = simhashCtes(distinct = false)

  private def simhashCtes(distinct: Boolean): String = {
    val w = if (distinct) "list_distinct(string_split_regex(lower(text), '\\s+'))"
            else "string_split_regex(lower(text), '\\s+')"
    s"""t AS (
      |  SELECT doc_id, $w AS w
      |  FROM documents),
      |h AS (SELECT doc_id, list_transform(w, x -> md5(x)) AS hs FROM t),
      |c AS (SELECT doc_id, list_transform(generate_series(0, 63), i ->
      |  2 * len(list_filter(hs, hx ->
      |    ((strpos('0123456789abcdef', substr(hx, i // 4 + 1, 1)) - 1) >> (i % 4)) & 1 = 1))
      |  - len(hs)) AS cnt FROM h),
      |n AS (SELECT doc_id, list_transform(generate_series(0, 15), j ->
      |    (CASE WHEN cnt[4*j+1] > 0 THEN 1 ELSE 0 END)
      |  + (CASE WHEN cnt[4*j+2] > 0 THEN 2 ELSE 0 END)
      |  + (CASE WHEN cnt[4*j+3] > 0 THEN 4 ELSE 0 END)
      |  + (CASE WHEN cnt[4*j+4] > 0 THEN 8 ELSE 0 END)) AS nibs FROM c),
      |fp AS (SELECT doc_id, array_to_string(list_transform(nibs,
      |  nb -> substr('0123456789abcdef', nb + 1, 1)), '') AS simhash FROM n)""".stripMargin
  }

  /** Oracle-side twin of [[dhashFixture]] + the 9×7 resample + the
    * gradient hash, as a DuckDB CTE chain ending in
    * `hashes(doc_id, dhash)` — shared by the `mm_dhash` and
    * `dedup_image_neardup` oracles so fixture edits cannot drift
    * between them. Sampled luminance at thumbnail (dx, dy) reads source
    * (dx·w//9, dy·h//7); bit dy·8+dx is set when the right neighbor is
    * strictly brighter; the 56-bit value is assembled as an exact
    * BIGINT sum of powers of two (top bit 55 — never the sign bit). */
  private val dhashOracleCtes: String =
    """dims AS (
      |  SELECT doc_id, doc_id % 97 AS gid,
      |    20 + (doc_id % 97) % 13 AS w, 16 + (doc_id % 97) % 11 AS h
      |  FROM documents),
      |samp AS (
      |  SELECT doc_id, dx, dy,
      |    CASE WHEN (dx * w // 9) = gid % w AND (dy * h // 7) = gid % h
      |      THEN (gid*37 + (dx*w//9)*53 + (dy*h//7)*41 + (doc_id % 5) * 40) % 256
      |      ELSE (gid*37 + (dx*w//9)*53 + (dy*h//7)*41) % 256 END AS v
      |  FROM dims,
      |    unnest(generate_series(0, 8)) AS tx(dx),
      |    unnest(generate_series(0, 6)) AS ty(dy)),
      |bits AS (
      |  SELECT s0.doc_id,
      |    CASE WHEN s1.v > s0.v THEN (1::BIGINT << (s0.dy * 8 + s0.dx))
      |      ELSE 0 END AS b
      |  FROM samp s0
      |  JOIN samp s1 ON s1.doc_id = s0.doc_id AND s1.dy = s0.dy
      |    AND s1.dx = s0.dx + 1
      |  WHERE s0.dx < 8),
      |hashes AS (
      |  SELECT doc_id, CAST(sum(b) AS BIGINT) AS dhash FROM bits
      |  GROUP BY doc_id)""".stripMargin

  /** Oracle-side twin of [[pngFixture]]'s channel formulas: the summed
    * R+G+B value at source coordinates (`x`, `y`) as a SQL expression —
    * parameterized on the coordinate expressions so the decode oracle
    * passes raw (x, y) and the resize oracle passes the nearest-neighbor
    * mapping, both from this single definition. */
  private def pngChannelSumSql(x: String, y: String): String =
    s"""(doc_id * 31 + ($x) * 7 + ($y) * 13) % 256
       |    + (doc_id * 17 + ($x) * 5 + ($y) * 11 + 85) % 256
       |    + (doc_id * 23 + ($x) * 3 + ($y) * 19 + 170) % 256""".stripMargin

  /** Deterministic PII salt appended to each doc (Spark side; the
    * oracle builds the identical string in SQL). */
  private def piiSalted(text: Column, docId: Column): Column =
    concat(text, lit(" contact user"), docId.cast("string"),
      lit("@example.com or +1-555-"),
      lpad((docId % 10000).cast("string"), 4, "0"),
      lit(" from 10."), (docId % 256).cast("string"), lit(".0.1"))

  /** Fixed deterministic PQ codebook (8 chunks × 4 centroids × subdim 8)
    * for the oracle-exact encode/ADC twins: seeded uniform floats,
    * embedded in the generated SQL as exact double literals
    * (Float→Double widening is exact and Double.toString round-trips),
    * so both engines run the identical argmin arithmetic. */
  private[graft] lazy val fixedPqCodebook: Pq.Codebook = {
    val rnd = new java.util.Random(20260812L)
    Pq.Codebook(Array.fill(8)(Array.fill(4)(Array.fill(8)(
      rnd.nextFloat() * 2f - 1f))))
  }

  /** Squared L2 from the embedding's chunk-c slice to fixed centroid j —
    * the same double fold as NearestCentroidFloat (x − cent, left to
    * right). */
  private def pqDistSql(c: Int, j: Int): String = {
    val cb = fixedPqCodebook
    ("0.0" +: (0 until cb.subDim).map { d =>
      val cent = cb.centroids(c)(j)(d).toDouble.toString
      val x = s"(CAST(embedding[${c * cb.subDim + d + 1}] AS DOUBLE) - $cent)"
      s"$x * $x"
    }).mkString(" + ")
  }

  /** First-match strict-argmin over the 4 fixed centroids of chunk c —
    * the CASE ladder picks the earliest index attaining the minimum,
    * matching the kernel's `s < bestD` replace rule. */
  private def pqCodeSql(c: Int): String = {
    val ds = (0 until fixedPqCodebook.k).map(j => s"(${pqDistSql(c, j)})")
    s"""CASE WHEN ${ds(0)} <= ${ds(1)} AND ${ds(0)} <= ${ds(2)} AND ${ds(0)} <= ${ds(3)} THEN 0
       |WHEN ${ds(1)} <= ${ds(2)} AND ${ds(1)} <= ${ds(3)} THEN 1
       |WHEN ${ds(2)} <= ${ds(3)} THEN 2 ELSE 3 END""".stripMargin
  }

  /** ADC table cell (c, j): squared L2 from the query's chunk-c slice to
    * fixed centroid j — the same chain Pq.adcDistanceColumn computes
    * driver-side ((cent − q), left-to-right 0.0-seeded sum). */
  private def adcTableSql(c: Int, j: Int): String = {
    val cb = fixedPqCodebook
    ("0.0" +: (0 until cb.subDim).map { d =>
      val cent = cb.centroids(c)(j)(d).toDouble.toString
      val t = s"($cent - CAST(q.qe[${c * cb.subDim + d + 1}] AS DOUBLE))"
      s"$t * $t"
    }).mkString(" + ")
  }

  /** Fixed deterministic IVF centroids (8 × dim) for the oracle-exact
    * search twin — same literal-embedding contract as
    * [[fixedPqCodebook]]. */
  private[graft] lazy val fixedIvfCentroids: Array[Array[Float]] = {
    val rnd = new java.util.Random(11047L)
    Array.fill(8)(Array.fill(OracleSql.Dim)(rnd.nextFloat() * 2f - 1f))
  }

  /** Fixed deterministic two-level quantizer (3 supers with 2/3/2
    * children, global ids 0..6) for the hierarchical-assignment oracle
    * twin — same literal-embedding contract as [[fixedIvfCentroids]]. */
  private[graft] lazy val fixedHierModel: graft.operators.Ivf.HierModel = {
    val rnd = new java.util.Random(22093L)
    def v() = Array.fill(OracleSql.Dim)(rnd.nextFloat() * 2f - 1f)
    val supers = Array.fill(3)(v())
    val children = Array(Array.fill(2)(v()), Array.fill(3)(v()), Array.fill(2)(v()))
    graft.operators.Ivf.HierModel(supers, children, "embedding")
  }

  /** IVF-PQ fixed-model oracle: the full composite path in SQL —
    * assignment argmin (list_min position ≡ lowest-index tie-break),
    * residual = double-subtract rounded to REAL (≡ the engine's float
    * zip_with subtraction, exact by the 2p+2 double-rounding theorem),
    * per-chunk encode argmin over residual slices, per-cluster ADC
    * tables from the query residuals, 0.0-seeded left-fold sums
    * everywhere, (dist, id) top-k; `rerank` > 0 adds the ADC-shortlist →
    * exact-L2 rerank stage. Centroid/codebook literals are exact double
    * strings of the float values. */
  private def ivfPqFixedSql(rerank: Int, filterLabel: Option[Int] = None): String = {
    import OracleSql.{Dim, l2}
    // filtered variant (o7_ivfpq_filtered): the engine composes the
    // predicate after probe pruning; per-row encode/assign are
    // unaffected by other rows, so filtering the corpus up front is
    // row-for-row identical — and the label column rides through
    val labelCol = filterLabel.map(_ => "label, ").getOrElse("")
    val whereLabel = filterLabel.map(l => s" WHERE label = $l").getOrElse("")
    val cb = fixedPqCodebook
    def arr(xs: Seq[String]) = xs.mkString("[", ", ", "]")
    val il = arr(fixedIvfCentroids.toSeq.map(c =>
      arr(c.toSeq.map(_.toDouble.toString))))
    val pl = arr(cb.centroids.toSeq.map(ch =>
      arr(ch.toSeq.map(ct => arr(ct.toSeq.map(_.toDouble.toString))))))
    val lv = (0 until fixedIvfCentroids.length)
      .map(j => s"(${ivfAssignDistSql(j)})").mkString(", ")
    val cdist = fixedIvfCentroids.indices
      .map(j => s"SELECT $j AS j, (${ivfQueryDistSql(j)}) AS d FROM q")
      .mkString(" UNION ALL ")
    val resElems = arr((1 to Dim).map(i =>
      s"CAST(CAST(embedding[$i] AS DOUBLE) - il[cid + 1][$i] AS REAL)"))
    val chunkCols = (0 until cb.chunks).map { ch =>
      val ds = (0 until cb.k).map { j =>
        ("0.0" +: (0 until cb.subDim).map { d =>
          val x = s"(CAST(r[${ch * cb.subDim + d + 1}] AS DOUBLE) - " +
            s"pl[${ch + 1}][${j + 1}][${d + 1}])"
          s"$x * $x"
        }).mkString(" + ")
      }
      s"list_value(${ds.map(x => s"($x)").mkString(", ")}) AS lv$ch, " +
        s"(list_position(lv$ch, list_min(lv$ch)) - 1) AS c$ch"
    }.mkString(",\n    ")
    val codeList = arr((0 until cb.chunks).map(ch => s"c$ch"))
    val qrs = s"list_transform(range(1, ${fixedIvfCentroids.length + 1}), " +
      s"cl -> list_transform(range(1, ${Dim + 1}), " +
      s"i -> CAST(CAST(qe[i] AS DOUBLE) - il[cl][i] AS REAL)))"
    val cells = (0 until cb.chunks).map { ch =>
      "(" + ("0.0" +: (0 until cb.subDim).map { d =>
        val x = s"(pl[${ch + 1}][code[${ch + 1}] + 1][${d + 1}] - " +
          s"CAST(qrs[cid + 1][${ch * cb.subDim + d + 1}] AS DOUBLE))"
        s"$x * $x"
      }).mkString(" + ") + ")"
    }
    val adcDist = s"sqrt(${("0.0" +: cells).mkString(" + ")})"
    val tail =
      if (rerank == 0)
        s"""SELECT vec_id, ${filterLabel.map(_ =>
             "CAST(label AS BIGINT) AS label, ").getOrElse("")}dist FROM scored
           |ORDER BY dist ASC, vec_id ASC LIMIT 10""".stripMargin
      else
        s""", short AS (SELECT vec_id FROM scored
           |  ORDER BY dist ASC, vec_id ASC LIMIT $rerank)
           |SELECT e.vec_id AS vec_id, ${l2("e.embedding", "q.qe")} AS dist
           |FROM embeddings e JOIN short s ON e.vec_id = s.vec_id CROSS JOIN q
           |ORDER BY dist ASC, vec_id ASC LIMIT 10""".stripMargin
    s"""${OracleSql.queryCte(QueryVecId)},
       |consts AS (SELECT $il AS il, $pl AS pl),
       |enc AS (SELECT vec_id, ${labelCol}embedding,
       |  (list_position(lvv, list_min(lvv)) - 1) AS cid
       |  FROM (SELECT vec_id, ${labelCol}embedding, list_value($lv) AS lvv
       |        FROM embeddings$whereLabel)),
       |res AS (SELECT vec_id, ${labelCol}cid, $resElems AS r FROM enc, consts),
       |coded AS (SELECT vec_id, ${labelCol}cid,
       |    $chunkCols,
       |    $codeList AS code
       |  FROM res, consts),
       |cdist AS ($cdist),
       |probe AS (SELECT j FROM cdist ORDER BY d ASC, j ASC LIMIT 2),
       |qrt AS (SELECT $qrs AS qrs FROM q, consts),
       |scored AS (
       |  SELECT cd.vec_id, ${filterLabel.map(_ => "cd.label, ").getOrElse("")}$adcDist AS dist
       |  FROM coded cd, qrt, consts
       |  WHERE cd.cid IN (SELECT j FROM probe))
       |$tail""".stripMargin
  }

  /** Row-to-centroid-j squared L2 (assignment side: x − cent, the
    * NearestCentroidFloat fold). */
  private def ivfAssignDistSql(j: Int): String =
    ("0.0" +: (0 until OracleSql.Dim).map { d =>
      val cent = fixedIvfCentroids(j)(d).toDouble.toString
      val x = s"(CAST(embedding[${d + 1}] AS DOUBLE) - $cent)"
      s"$x * $x"
    }).mkString(" + ")

  /** Query-to-centroid-j squared L2 (probe side: cent − q, the
    * Ivf.probeClusters driver fold). */
  private def ivfQueryDistSql(j: Int): String =
    ("0.0" +: (0 until OracleSql.Dim).map { d =>
      val cent = fixedIvfCentroids(j)(d).toDouble.toString
      val t = s"($cent - CAST(q.qe[${d + 1}] AS DOUBLE))"
      s"$t * $t"
    }).mkString(" + ")

  /** PII-redaction SQL over column expression `c` — identical pattern
    * strings and application order as PiiFunctions.redactPii. */
  private def redactSql(c: String): String = {
    import graft.functions.PiiFunctions.{EmailRe, PhoneRe, Ipv4Re}
    s"regexp_replace(regexp_replace(regexp_replace($c, " +
      s"'$EmailRe', '[EMAIL]', 'g'), '$PhoneRe', '[PHONE]', 'g'), " +
      s"'$Ipv4Re', '[IP]', 'g')"
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  /** BM25 oracle CTE chain — mirrors [[TextSearch.bm25Scored]] clause by
    * clause: exact-BIGINT tf/df/dl/N/Σdl, libm ln, and the same
    * left-to-right `0.0 + term0 + term1 + …` score fold (doubles
    * interpolate from the shared constants, so both engines parse the
    * identical IEEE-754 literals). Yields CTE `bm25_scored(doc_id,
    * score)`. */
  private def bm25OracleCtes: String = {
    val toksOf = "string_split_regex(lower(text), '\\s+')"
    val dlOf = s"len(list_filter($toksOf, x -> x <> ''))"
    val tfCols = BmTerms.indices.map(i =>
      s"CAST(SUM(CASE WHEN w = '${BmTerms(i)}' THEN 1 ELSE 0 END) AS BIGINT) AS tf$i")
      .mkString(", ")
    val dfCols = BmTerms.indices.map(i =>
      s"CAST(SUM(CASE WHEN tf$i > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df$i")
      .mkString(", ")
    val inList = BmTerms.map(t => s"'$t'").mkString(", ")
    val avgdl = "CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE)"
    val contribs = BmTerms.indices.map { i =>
      val tfD = s"CAST(tf$i AS DOUBLE)"
      val dfD = s"CAST(df$i AS DOUBLE)"
      val idf = s"ln((CAST(n_docs AS DOUBLE) - $dfD + 0.5) / ($dfD + 0.5) + 1.0)"
      s"$idf * ($tfD * ${Bm25K1 + 1.0}) / ($tfD + $Bm25K1 * " +
        s"(1.0 - $Bm25B + $Bm25B * CAST(dl AS DOUBLE) / ($avgdl)))"
    }
    val score = ("0.0" +: contribs).mkString(" + ")
    s"""bm25_tok AS (
       |  SELECT doc_id, $dlOf AS dl, unnest($toksOf) AS w FROM documents),
       |bm25_tf AS (
       |  SELECT doc_id, CAST(min(dl) AS BIGINT) AS dl, $tfCols
       |  FROM bm25_tok WHERE w IN ($inList) GROUP BY doc_id),
       |bm25_corpus AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(SUM($dlOf) AS BIGINT) AS total_tokens FROM documents),
       |bm25_dfs AS (SELECT $dfCols FROM bm25_tf),
       |bm25_scored AS (
       |  SELECT doc_id, $score AS score
       |  FROM bm25_tf CROSS JOIN bm25_corpus CROSS JOIN bm25_dfs)""".stripMargin
  }

  def oracleSql: Map[String, String] = {
    import OracleSql._
    val cte = queryCte(QueryVecId)
    Map(
      "o1_l2_distance" ->
        s"""$cte SELECT e.vec_id AS vec_id, ${l2("e.embedding", "q.qe")} AS dist
           |FROM embeddings e CROSS JOIN q ORDER BY vec_id""".stripMargin,

      "o2_knn_exact" ->
        s"""$cte SELECT e.vec_id AS vec_id, ${l2("e.embedding", "q.qe")} AS dist
           |FROM embeddings e CROSS JOIN q ORDER BY dist ASC, vec_id ASC LIMIT 10""".stripMargin,

      // banded LSH at 16×8 bits + 2-bit multi-probe achieves full
      // top-10 recall on this data, so the exact-kNN SQL is its oracle
      "o3_lsh_search" ->
        s"""$cte SELECT e.vec_id AS vec_id, ${l2("e.embedding", "q.qe")} AS dist
           |FROM embeddings e CROSS JOIN q ORDER BY dist ASC, vec_id ASC LIMIT 10""".stripMargin,

      // the persisted-signature path probes the same buckets -> same
      // candidate set -> the same exact-kNN oracle
      "o3_lsh_persisted" ->
        s"""$cte SELECT e.vec_id AS vec_id, ${l2("e.embedding", "q.qe")} AS dist
           |FROM embeddings e CROSS JOIN q ORDER BY dist ASC, vec_id ASC LIMIT 10""".stripMargin,

      "o2_knn_cosine" ->
        s"""$cte SELECT e.vec_id AS vec_id, ${cosineDistance("e.embedding", "q.qe")} AS dist
           |FROM embeddings e CROSS JOIN q ORDER BY dist ASC, vec_id ASC LIMIT 10""".stripMargin,

      "o2_knn_mmr" -> mmrSql(30, 8),

      "e_retrieval_eval" ->
        s"""WITH a AS (SELECT vec_id AS anchor_id, embedding AS ae
           |           FROM embeddings WHERE vec_id <= 2),
           |sc AS (
           |  SELECT a.anchor_id, e.vec_id AS vec_id,
           |    ${OracleSql.cosineSim("e.embedding", "a.ae")} AS csim,
           |    ${OracleSql.dot("e.embedding", "a.ae")} AS dsim
           |  FROM embeddings e CROSS JOIN a WHERE e.vec_id <> a.anchor_id),
           |tr AS (SELECT anchor_id, vec_id FROM (
           |  SELECT anchor_id, vec_id, row_number() OVER
           |    (PARTITION BY anchor_id ORDER BY csim DESC, vec_id ASC) AS rk
           |  FROM sc) WHERE rk <= 10),
           |re AS (SELECT anchor_id, vec_id, rk AS rrank FROM (
           |  SELECT anchor_id, vec_id, row_number() OVER
           |    (PARTITION BY anchor_id ORDER BY dsim DESC, vec_id ASC) AS rk
           |  FROM sc) WHERE rk <= 10)
           |SELECT re.anchor_id AS anchor_id,
           |  CAST(SUM(CASE WHEN tr.vec_id IS NOT NULL THEN 1 ELSE 0 END)
           |    AS DOUBLE) / 10 AS recall_at_10,
           |  COALESCE(MAX(CASE WHEN tr.vec_id IS NOT NULL
           |    THEN CAST(1 AS DOUBLE) / rrank END),
           |    CAST(0 AS DOUBLE)) AS mrr_at_10
           |FROM re LEFT JOIN tr
           |  ON re.anchor_id = tr.anchor_id AND re.vec_id = tr.vec_id
           |GROUP BY re.anchor_id ORDER BY anchor_id""".stripMargin,

      "sample_hard_negatives" ->
        s"""WITH a AS (SELECT vec_id AS anchor_id, embedding AS ae,
           |             label AS alabel
           |           FROM embeddings WHERE vec_id <= 2),
           |d AS (
           |  SELECT a.anchor_id, e.vec_id AS vec_id,
           |    CAST(e.label AS BIGINT) AS label,
           |    ${OracleSql.cosineSim("e.embedding", "a.ae")} AS sim
           |  FROM embeddings e CROSS JOIN a WHERE e.label <> a.alabel),
           |r AS (
           |  SELECT anchor_id, vec_id, label, sim, CAST(row_number() OVER
           |    (PARTITION BY anchor_id ORDER BY sim DESC, vec_id ASC)
           |    AS BIGINT) AS rank
           |  FROM d)
           |SELECT anchor_id, vec_id, label, sim, rank FROM r WHERE rank <= 5
           |ORDER BY anchor_id, rank""".stripMargin,

      // 16-dim prefix funnel, then the full-dim rerank of the 50
      // survivors — both stages exact, ties (dist, vec_id)
      "o6_matryoshka_rerank" ->
        s"""$cte, pre AS (
           |  SELECT e.vec_id AS vec_id, e.embedding AS embedding, q.qe AS qe,
           |    ${l2("e.embedding", "q.qe", 16)} AS pdist
           |  FROM embeddings e CROSS JOIN q
           |  ORDER BY pdist ASC, vec_id ASC LIMIT 50)
           |SELECT vec_id, pdist, ${l2("embedding", "qe")} AS dist
           |FROM pre ORDER BY dist ASC, vec_id ASC LIMIT 10""".stripMargin,

      "o2_knn_dot" ->
        s"""$cte SELECT e.vec_id AS vec_id, ${dot("e.embedding", "q.qe")} AS score
           |FROM embeddings e CROSS JOIN q ORDER BY score DESC, vec_id ASC LIMIT 10""".stripMargin,

      "o2_knn_grouped" ->
        s"""$cte, d AS (
           |  SELECT e.vec_id AS vec_id, CAST(e.label AS BIGINT) AS label,
           |    ${l2("e.embedding", "q.qe")} AS dist
           |  FROM embeddings e CROSS JOIN q),
           |r AS (
           |  SELECT vec_id, label, dist, CAST(row_number() OVER
           |    (PARTITION BY label ORDER BY dist ASC, vec_id ASC) AS BIGINT) AS rank
           |  FROM d)
           |SELECT vec_id, label, dist, rank FROM r WHERE rank <= 3
           |ORDER BY label, rank""".stripMargin,

      "o2_range_search" ->
        s"""$cte SELECT e.vec_id AS vec_id, ${l2("e.embedding", "q.qe")} AS dist
           |FROM embeddings e CROSS JOIN q
           |WHERE ${l2("e.embedding", "q.qe")} <= 1.3
           |ORDER BY dist ASC, vec_id ASC""".stripMargin,

      "o7_knn_filtered" ->
        s"""$cte SELECT e.vec_id AS vec_id, CAST(e.label AS BIGINT) AS label,
           |${l2("e.embedding", "q.qe")} AS dist
           |FROM embeddings e CROSS JOIN q WHERE e.label = 3
           |ORDER BY dist ASC, vec_id ASC LIMIT 10""".stripMargin,

      // filtered HNSW/LSH both reduce to exact filtered kNN at these
      // settings (exhaustive beam / near-total bucket coverage)
      "o7_hnsw_filtered" ->
        s"""$cte SELECT e.vec_id AS vec_id, ${l2("e.embedding", "q.qe")} AS dist
           |FROM embeddings e CROSS JOIN q WHERE e.label = 3
           |ORDER BY dist ASC, vec_id ASC LIMIT 10""".stripMargin,

      "o7_lsh_filtered" ->
        s"""$cte SELECT e.vec_id AS vec_id, CAST(e.label AS BIGINT) AS label,
           |${l2("e.embedding", "q.qe")} AS dist
           |FROM embeddings e CROSS JOIN q WHERE e.label = 3
           |ORDER BY dist ASC, vec_id ASC LIMIT 10""".stripMargin,

      "o7_metadata_filter" ->
        """SELECT doc_id, lang, source FROM documents
          |WHERE lang = 'en' AND source = 'src3' ORDER BY doc_id""".stripMargin,

      "o7_metadata_json_filter" ->
        """WITH nodes AS (SELECT vec_id AS id,
          |'{"label":' || label || ',"lens":[' || (vec_id % 5) || ',' ||
          |((vec_id + 2) % 5) || '],"src":"s' || (vec_id % 3) || '"}' AS metadata_json
          |FROM embeddings)
          |SELECT id, metadata_json FROM nodes
          |WHERE json_extract_string(metadata_json, '$.label') = '3'
          |AND json_extract_string(metadata_json, '$.lens[1]') = '2'
          |AND json_extract_string(metadata_json, '$.src') = 's1'
          |ORDER BY id""".stripMargin,

      "o8_filter_empty" ->
        "SELECT doc_id, lang FROM documents WHERE lang = 'xx' ORDER BY doc_id",

      "s2_point_lookup" ->
        """SELECT vec_id, CAST(label AS BIGINT) AS label,
          |CAST(array_length(embedding) AS BIGINT) AS dim
          |FROM embeddings WHERE vec_id = 42""".stripMargin,

      "s4_size" -> "SELECT count(*) AS n FROM embeddings",

      "b7_cluster_stats" ->
        """SELECT min(c) AS min_size, max(c) AS max_size, avg(c) AS avg_size,
          |CAST(sum(c) AS BIGINT) AS total
          |FROM (SELECT count(*) AS c FROM embeddings GROUP BY label) t""".stripMargin,

      "q6_forecast_revenue" ->
        s"""SELECT ${decSum("l_extendedprice * l_discount", 4)} AS revenue
           |FROM lineitem
           |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           |  AND l_shipdate < TIMESTAMP '1997-01-01'
           |  AND l_discount BETWEEN CAST('0.05' AS DOUBLE) AND CAST('0.07' AS DOUBLE)
           |  AND l_quantity < 24""".stripMargin,

      "q19_promo_revenue" ->
        s"""SELECT ${decSum("l_extendedprice * (1 - l_discount)", 6)} AS revenue
           |FROM lineitem JOIN part ON l_partkey = p_partkey
           |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           |       AND l_quantity BETWEEN 1 AND 11)
           |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           |       AND l_quantity BETWEEN 10 AND 20)
           |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,

      "q4_order_priority" ->
        """SELECT o_orderpriority, count(*) AS order_count
          |FROM orders
          |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          |  AND o_orderdate < TIMESTAMP '1996-07-01'
          |  AND EXISTS (SELECT 1 FROM lineitem
          |              WHERE l_orderkey = o_orderkey
          |                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

      "q18_large_orders" ->
        s"""WITH big AS (
           |  SELECT l_orderkey, ${decSum("l_quantity")} AS total_qty
           |  FROM lineitem GROUP BY l_orderkey
           |  HAVING ${decSum("l_quantity")} > 300)
           |SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
           |       total_qty
           |FROM orders JOIN big ON o_orderkey = l_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,

      "q21_waiting_supplier" ->
        """WITH late AS (
          |  SELECT l_orderkey AS lo, l_suppkey AS ls
          |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          |  WHERE o_orderstatus = 'F'
          |    AND l_shipdate > o_orderdate + INTERVAL 90 DAY),
          |w AS (
          |  SELECT lo, ls FROM late l1
          |  WHERE EXISTS (SELECT 1 FROM lineitem l2
          |                WHERE l2.l_orderkey = l1.lo AND l2.l_suppkey <> l1.ls)
          |    AND NOT EXISTS (SELECT 1 FROM late l3
          |                    WHERE l3.lo = l1.lo AND l3.ls <> l1.ls))
          |SELECT s_name, numwait FROM (
          |  SELECT ls, count(*) AS numwait FROM w GROUP BY ls
          |) JOIN supplier ON ls = s_suppkey
          |ORDER BY numwait DESC, s_name ASC LIMIT 20""".stripMargin,

      "q1_pricing_summary" ->
        s"""SELECT l_returnflag, l_linestatus,
           |${decSum("l_quantity")} AS sum_qty,
           |${decSum("l_extendedprice")} AS sum_base_price,
           |${decSum("l_extendedprice * (1 - l_discount)", 6)} AS sum_disc_price,
           |${decSum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 6)} AS sum_charge,
           |${decSum("l_quantity")} / count(*) AS avg_qty,
           |${decSum("l_extendedprice")} / count(*) AS avg_price,
           |${decSum("l_discount")} / count(*) AS avg_disc,
           |count(*) AS count_order
           |FROM lineitem GROUP BY l_returnflag, l_linestatus
           |ORDER BY l_returnflag, l_linestatus""".stripMargin,

      "q3_top_revenue" ->
        s"""SELECT l_orderkey,
           |${decSum("l_extendedprice * (1 - l_discount)", 6)} AS revenue
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |WHERE c_mktsegment = 'BUILDING'
           |AND o_orderdate < TIMESTAMP '1998-06-01'
           |AND l_shipdate > TIMESTAMP '1998-06-01'
           |GROUP BY l_orderkey
           |ORDER BY revenue DESC, l_orderkey ASC LIMIT 10""".stripMargin,

      "q_window_rank" ->
        """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
          |SELECT o_custkey, o_orderkey, o_totalprice,
          |CAST(row_number() OVER (PARTITION BY o_custkey
          |ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
          |FROM orders) t WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

      "sketch_kmv" ->
        s"""WITH hsrc AS (
           |  SELECT md5(CAST(l_orderkey AS VARCHAR)) AS m FROM lineitem),
           |h AS (SELECT DISTINCT ($mdValue) AS hv FROM hsrc),
           |km AS (SELECT hv FROM h ORDER BY hv LIMIT 256),
           |ag AS (SELECT max(hv) AS hk, count(*) AS n FROM km),
           |ex AS (SELECT count(DISTINCT l_orderkey) AS exact_distinct FROM lineitem)
           |SELECT CASE WHEN n < 256 THEN CAST(n AS DOUBLE)
           |    ELSE CAST(255 AS DOUBLE) /
           |      (CAST(hk AS DOUBLE) / CAST(4294967296 AS DOUBLE)) END
           |    AS est_distinct,
           |  CAST(ex.exact_distinct AS BIGINT) AS exact_distinct
           |FROM ag CROSS JOIN ex""".stripMargin,

      // grouped KMV: per-group k-th-minimum estimate replayed per group
      "sketch_kmv_grouped" ->
        s"""WITH h AS (
           |  SELECT event_type, ($mdValue) AS hv FROM (
           |    SELECT DISTINCT event_type, user_id,
           |      md5(CAST(user_id AS VARCHAR)) AS m
           |    FROM events WHERE user_id IS NOT NULL) t),
           |km AS (SELECT event_type, hv,
           |    row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
           |  FROM (SELECT DISTINCT event_type, hv FROM h) d),
           |ag AS (SELECT event_type, max(hv) AS hk, count(*) AS n
           |  FROM km WHERE rn <= 64 GROUP BY event_type),
           |ex AS (SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT)
           |    AS exact_users
           |  FROM events WHERE user_id IS NOT NULL GROUP BY event_type)
           |SELECT a.event_type,
           |  CASE WHEN a.n < 64 THEN CAST(a.n AS DOUBLE)
           |    ELSE CAST(63 AS DOUBLE) /
           |      (CAST(a.hk AS DOUBLE) / CAST(4294967296 AS DOUBLE)) END
           |    AS est_users,
           |  ex.exact_users
           |FROM ag a JOIN ex ON a.event_type = ex.event_type
           |ORDER BY a.event_type""".stripMargin,

      // KMV set ops: union sketch = k smallest of the two k-truncated
      // sketches' union (exactly the engine's mergeSketches), ρ̂ =
      // union-sketch members present in BOTH sketches / |U|
      "sketch_kmv_setops" ->
        s"""WITH ea AS (SELECT DISTINCT user_id FROM events
           |  WHERE user_id IS NOT NULL AND event_type IN ('click', 'view')),
           |eb AS (SELECT DISTINCT user_id FROM events
           |  WHERE user_id IS NOT NULL AND event_type IN ('view', 'purchase')),
           |ha AS (SELECT DISTINCT ($mdValue) AS hv FROM
           |  (SELECT md5(CAST(user_id AS VARCHAR)) AS m FROM ea) t),
           |hb AS (SELECT DISTINCT ($mdValue) AS hv FROM
           |  (SELECT md5(CAST(user_id AS VARCHAR)) AS m FROM eb) t),
           |ka AS (SELECT hv FROM ha ORDER BY hv LIMIT 256),
           |kb AS (SELECT hv FROM hb ORDER BY hv LIMIT 256),
           |u AS (SELECT hv FROM
           |  (SELECT hv FROM ka UNION SELECT hv FROM kb) t
           |  ORDER BY hv LIMIT 256),
           |ag AS (SELECT max(hv) AS hk, count(*) AS n FROM u),
           |nb AS (SELECT count(*) AS c FROM u
           |  WHERE hv IN (SELECT hv FROM ka) AND hv IN (SELECT hv FROM kb)),
           |es AS (SELECT
           |    CASE WHEN n < 256 THEN CAST(n AS DOUBLE)
           |      ELSE CAST(255 AS DOUBLE) /
           |        (CAST(hk AS DOUBLE) / CAST(4294967296 AS DOUBLE)) END
           |      AS est_union,
           |    CASE WHEN n = 0 THEN CAST('0.0' AS DOUBLE)
           |      ELSE CAST(c AS DOUBLE) / CAST(n AS DOUBLE) END AS jaccard
           |  FROM ag CROSS JOIN nb)
           |SELECT est_union, jaccard, jaccard * est_union AS est_intersection
           |FROM es""".stripMargin,

      "sketch_hll" ->
        s"""WITH ${hllSql("events", "user_id", None)}
           |SELECT est_distinct, v_empty, s_scaled FROM hll""".stripMargin,

      // streaming twin: register-max folding is idempotent exact union,
      // so the stream-maintained state ≡ the batch sketch verbatim
      "b10_stream_hll" ->
        s"""WITH ${hllSql("events", "user_id", None)}
           |SELECT est_distinct, v_empty, s_scaled FROM hll""".stripMargin,

      "sketch_hll_grouped" ->
        s"""WITH ${hllSql("events", "user_id", Some("event_type"))}
           |SELECT event_type, est_distinct, v_empty, s_scaled FROM hll
           |ORDER BY event_type""".stripMargin,

      // trailing-window union: hourly registers + window max + the
      // identical estimate chain — exact because register max is exact
      "events_sliding_uniques" -> slidingHllSql(6),

      // merge ≡ union is exact (register max is associative/idempotent),
      // so the two-shard merged sketch replays as one sketch of all rows
      "sketch_hll_union" ->
        s"""WITH ${hllSql("events", "user_id", None)}
           |SELECT est_distinct, v_empty, s_scaled FROM hll""".stripMargin,

      "sketch_cms" ->
        s"""WITH ${cmsSql("events", "user_id")}
           |SELECT CAST(row AS INT) AS row, CAST(bucket AS INT) AS bucket, c
           |FROM cms_reg ORDER BY row, bucket""".stripMargin,

      "sketch_cms_estimate" ->
        s"""WITH ${cmsSql("events", "user_id")},
           |keys AS (SELECT CAST(unnest(range(0, 8)) AS VARCHAR) AS item),
           |kb AS (SELECT item, row, ($hash32Sql) % 256 AS bucket FROM (
           |  SELECT k.item AS item, r.row AS row,
           |    md5(concat(CAST(r.row AS VARCHAR), '|', k.item)) AS m
           |  FROM keys k CROSS JOIN cms_rows r) t),
           |est AS (SELECT kb.item AS item,
           |    CAST(min(coalesce(cms_reg.c, 0)) AS BIGINT) AS est_cnt
           |  FROM kb LEFT JOIN cms_reg
           |    ON kb.row = cms_reg.row AND kb.bucket = cms_reg.bucket
           |  GROUP BY 1),
           |exact AS (SELECT CAST(user_id AS VARCHAR) AS item,
           |    CAST(count(*) AS BIGINT) AS exact_cnt
           |  FROM events WHERE user_id IS NOT NULL GROUP BY 1)
           |SELECT e.item, e.est_cnt,
           |  coalesce(x.exact_cnt, CAST(0 AS BIGINT)) AS exact_cnt
           |FROM est e LEFT JOIN exact x USING (item) ORDER BY item""".stripMargin,

      // merge ≡ union is exact (registers are sums), so the two-shard
      // merged sketch replays as one sketch of all rows
      "sketch_cms_union" ->
        s"""WITH ${cmsSql("events", "user_id")}
           |SELECT CAST(row AS INT) AS row, CAST(bucket AS INT) AS bucket, c
           |FROM cms_reg ORDER BY row, bucket""".stripMargin,

      "t_classifier_score" ->
        classifierSql(ClassifierDim, classifierWeights, bias = 0.1),

      "t_classifier_train" ->
        classifierTrainSql(ClassifierDim, ClassifierTrainIters, ClassifierTrainLr),

      "t_classifier_train_score" ->
        classifierTrainScoreSql(ClassifierDim, ClassifierTrainIters,
          ClassifierTrainLr),

      // stored-model scoring ≡ fresh-model scoring (exact double
      // round-trip through parquet), so the oracle is the same replay
      "t_classifier_stored_score" ->
        classifierTrainScoreSql(ClassifierDim, ClassifierTrainIters,
          ClassifierTrainLr),

      "t_calibration" ->
        calibrationSql(ClassifierDim, ClassifierTrainIters,
          ClassifierTrainLr),

      // (label, dim) exact integer-grid means (2^-20 quantization — see
      // the query comment for why decimal casts are a half-up-vs-half-
      // even trap on float32 data), pairwise ascending-dim list_reduce
      // distance folds, nearest by (d2, label)
      "e_label_margins" ->
        """WITH e AS (
          |  SELECT label, generate_subscripts(embedding, 1) - 1 AS dim,
          |    unnest(embedding) AS v
          |  FROM embeddings),
          |m AS (
          |  SELECT label, dim,
          |    CAST(sum(CAST(round(CAST(v AS DOUBLE) * 1048576.0) AS BIGINT))
          |        AS DOUBLE) / 1048576.0
          |      / CAST(count(*) AS DOUBLE) AS m
          |  FROM e GROUP BY label, dim),
          |nv AS (SELECT label, CAST(count(*) AS BIGINT) AS n_vecs
          |  FROM embeddings GROUP BY label),
          |p AS (
          |  SELECT a.label AS la, b.label AS lb,
          |    list_reduce(list_prepend(CAST('0.0' AS DOUBLE),
          |      list((a.m - b.m) * (a.m - b.m) ORDER BY a.dim)),
          |      (x, y) -> x + y) AS d2
          |  FROM m a JOIN m b ON a.dim = b.dim AND a.label <> b.label
          |  GROUP BY a.label, b.label),
          |sel AS (SELECT la, lb, d2,
          |  row_number() OVER (PARTITION BY la ORDER BY d2, lb) AS rn FROM p)
          |SELECT nv.label, nv.n_vecs, sel.lb AS nearest_label,
          |  sqrt(sel.d2) AS margin
          |FROM nv JOIN sel ON nv.label = sel.la AND sel.rn = 1
          |ORDER BY nv.label""".stripMargin,

      "layout_zorder" -> {
        val interleave = (0 until 16).flatMap(j => Seq(
          s"(((b0 >> $j) & 1) << ${2 * j})",
          s"(((b1 >> $j) & 1) << ${2 * j + 1})")).mkString(" + ")
        s"""WITH mm AS (SELECT
           |  min(o_custkey) AS mn0, max(o_custkey) AS mx0,
           |  min(date_diff('day', DATE '1970-01-01', o_orderdate)) AS mn1,
           |  max(date_diff('day', DATE '1970-01-01', o_orderdate)) AS mx1
           |  FROM orders),
           |b AS (SELECT o_orderkey,
           |  ((o_custkey - mn0) * 65536) // (mx0 - mn0 + 1) AS b0,
           |  ((date_diff('day', DATE '1970-01-01', o_orderdate) - mn1) * 65536)
           |    // (mx1 - mn1 + 1) AS b1
           |  FROM orders CROSS JOIN mm)
           |SELECT o_orderkey, $interleave AS zval FROM b
           |ORDER BY o_orderkey""".stripMargin
      },

      "layout_bucketed_join" ->
        s"""SELECT o_orderpriority, count(*) AS n,
           |${decSum("l_quantity")} AS sum_qty
           |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
           |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

      "t_dsir_weight" ->
        s"""WITH ${dsirCtes(DsirDim)}
           |SELECT doc_id, dsir_logw FROM ds_scored ORDER BY doc_id""".stripMargin,

      "sample_dsir" ->
        s"""WITH ${dsirCtes(DsirDim)},
           |ds_u AS (
           |  SELECT doc_id, dsir_logw,
           |    CAST(concat('0x', left(md5(concat('dsir', CAST(doc_id AS VARCHAR))), 8))
           |      AS UBIGINT) / 4294967296.0 AS u
           |  FROM ds_scored)
           |SELECT doc_id, dsir_logw FROM (
           |  SELECT doc_id, dsir_logw, dsir_logw + (-ln(-ln(u))) AS dsir_key
           |  FROM ds_u ORDER BY dsir_key DESC, doc_id ASC LIMIT 100)
           |ORDER BY doc_id""".stripMargin,

      // exact heavy hitters: the engine's MG-candidates + exact-verify
      // composition provably equals this plain HAVING query (the MG
      // membership guarantee), so the sketch pipeline is oracle-exact
      "sketch_heavy_hitters" ->
        """WITH w AS (
          |  SELECT unnest(string_split_regex(lower(text), '\s+')) AS word
          |  FROM documents),
          |v AS (SELECT word FROM w WHERE word <> ''),
          |n AS (SELECT count(*) AS n FROM v)
          |SELECT word AS item, count(*) AS cnt
          |FROM v CROSS JOIN n
          |GROUP BY word, n.n
          |HAVING count(*) > CAST(n.n AS DOUBLE) / 41
          |ORDER BY cnt DESC, item ASC""".stripMargin,

      // per-group twin: the grouped MG composition equals the per-group
      // HAVING query by the same membership guarantee, applied per lang
      "sketch_heavy_hitters_grouped" ->
        """WITH w AS (
          |  SELECT lang, unnest(string_split_regex(lower(text), '\s+')) AS word
          |  FROM documents WHERE lang IS NOT NULL),
          |v AS (SELECT lang, word FROM w WHERE word <> ''),
          |ng AS (SELECT lang, count(*) AS n FROM v GROUP BY lang)
          |SELECT v.lang, word AS item, count(*) AS cnt
          |FROM v JOIN ng ON v.lang = ng.lang
          |GROUP BY v.lang, word, ng.n
          |HAVING count(*) > CAST(ng.n AS DOUBLE) / 41
          |ORDER BY v.lang ASC, cnt DESC, item ASC""".stripMargin,

      "q5_local_supplier" ->
        s"""SELECT n_name,
           |${decSum("l_extendedprice * (1 - l_discount)", 6)} AS revenue
           |FROM lineitem
           |JOIN orders ON l_orderkey = o_orderkey
           |JOIN customer ON o_custkey = c_custkey
           |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
           |JOIN nation ON s_nationkey = n_nationkey
           |JOIN region ON n_regionkey = r_regionkey
           |WHERE r_name = 'ASIA'
           |GROUP BY n_name
           |ORDER BY revenue DESC, n_name ASC""".stripMargin,

      "q_outer_join" ->
        s"""WITH l AS (
           |  SELECT c_custkey AS k, c_acctbal FROM customer WHERE c_custkey % 3 = 0),
           |r AS (
           |  SELECT o_custkey AS k2, count(*) AS n_orders,
           |    ${decSum("o_totalprice")} AS sum_price
           |  FROM orders WHERE o_custkey % 5 = 0 GROUP BY 1)
           |SELECT coalesce(l.k, r.k2) AS custkey, c_acctbal, n_orders, sum_price
           |FROM l FULL OUTER JOIN r ON l.k = r.k2
           |ORDER BY custkey""".stripMargin,

      "q_window_funcs" ->
        """SELECT o_custkey, o_orderkey,
          |lag(o_totalprice, 1) OVER w AS prev_price,
          |lead(o_totalprice, 1) OVER w AS next_price,
          |CAST(ntile(4) OVER w AS BIGINT) AS quartile,
          |percent_rank() OVER w AS pct_rank,
          |cume_dist() OVER w AS cume,
          |first_value(o_totalprice) OVER w AS first_price
          |FROM orders
          |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey ASC)
          |ORDER BY o_custkey, o_orderkey""".stripMargin,

      "events_hourly" ->
        s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS h,
           |event_type, count(*) AS n, ${decSum("value")} AS sum_value
           |FROM events GROUP BY 1, 2 ORDER BY h, event_type""".stripMargin,

      "events_anomaly" ->
        """WITH hourly AS (
          |  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS h,
          |    event_type, count(*) AS n
          |  FROM events GROUP BY 1, 2),
          |st AS (
          |  SELECT event_type AS t, count(*) AS hours,
          |    sum(n) AS s1, sum(n * n) AS s2
          |  FROM hourly GROUP BY event_type)
          |SELECT h, event_type, n,
          |  (CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(hours AS DOUBLE))
          |    / sqrt(CAST(s2 AS DOUBLE) / CAST(hours AS DOUBLE)
          |      - (CAST(s1 AS DOUBLE) / CAST(hours AS DOUBLE))
          |        * (CAST(s1 AS DOUBLE) / CAST(hours AS DOUBLE))) AS z
          |FROM hourly JOIN st ON event_type = t
          |WHERE s2 * hours <> s1 * s1
          |  AND abs((CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(hours AS DOUBLE))
          |    / sqrt(CAST(s2 AS DOUBLE) / CAST(hours AS DOUBLE)
          |      - (CAST(s1 AS DOUBLE) / CAST(hours AS DOUBLE))
          |        * (CAST(s1 AS DOUBLE) / CAST(hours AS DOUBLE)))) > 2.0
          |ORDER BY h, event_type""".stripMargin,

      // funnel twin: per-step filtered min chained through the
      // previous step's completion set; epoch-micros comparison
      "events_funnel" -> funnelOracleSql,

      "b10_stream_funnel" -> funnelOracleSql,

      // DAU/WAU twin: deduped (user, day) pairs fan to window-end days
      "events_active_users" ->
        """WITH ud AS (
          |  SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events),
          |dau AS (SELECT d AS day, CAST(count(DISTINCT u) AS BIGINT) AS dau
          |  FROM ud GROUP BY 1),
          |wau AS (SELECT d + CAST(k AS INT) AS day,
          |    CAST(count(DISTINCT u) AS BIGINT) AS wau
          |  FROM ud, unnest(generate_series(0, 6)) AS t(k) GROUP BY 1)
          |SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau.dau, wau.wau
          |FROM dau JOIN wau ON dau.day = wau.day
          |ORDER BY day""".stripMargin,

      // retention twin: first-seen day cohort × day offset, exact
      // distinct-user counts
      "events_retention" ->
        """WITH fs AS (
          |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort
          |  FROM events GROUP BY user_id)
          |SELECT strftime(fs.cohort, '%Y-%m-%d') AS cohort,
          |  CAST(CAST(e.ts AS DATE) - fs.cohort AS INT) AS day_offset,
          |  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
          |FROM events e JOIN fs ON e.user_id = fs.user_id
          |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

      "events_gapfill" ->
        s"""WITH hh AS (
           |  SELECT event_type, date_trunc('hour', ts) AS h,
           |    ${decSum("value")} AS v
           |  FROM events GROUP BY 1, 2),
           |b AS (SELECT min(h) AS mn, max(h) AS mx FROM hh),
           |grid AS (
           |  SELECT t.event_type, g.h
           |  FROM (SELECT DISTINCT event_type FROM hh) t
           |  CROSS JOIN (SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h
           |              FROM b) g),
           |j AS (
           |  SELECT grid.event_type, grid.h, hh.v
           |  FROM grid LEFT JOIN hh
           |    ON grid.event_type = hh.event_type AND grid.h = hh.h)
           |SELECT event_type, strftime(h, '%Y-%m-%d %H:%M:%S') AS h,
           |  last_value(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY h
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
           |  CAST(CASE WHEN v IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_gap
           |FROM j ORDER BY event_type, h""".stripMargin,

      "events_json_extract" ->
        """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          |FROM events ORDER BY event_id""".stripMargin,

      "t_token_stats" ->
        """SELECT doc_id, n_chars, CAST(length(text) AS BIGINT) AS len,
          |CAST(array_length(string_split(text, ' ')) AS BIGINT) AS n_tokens
          |FROM documents ORDER BY doc_id""".stripMargin,

      "t_ttr" ->
        """SELECT doc_id,
          |CAST(array_length(string_split(text, ' ')) AS BIGINT) AS n_words,
          |CAST(array_length(list_distinct(string_split(text, ' ')))
          |  AS BIGINT) AS n_distinct,
          |CAST(array_length(list_distinct(string_split(text, ' ')))
          |  AS DOUBLE) / array_length(string_split(text, ' ')) AS ttr
          |FROM documents ORDER BY doc_id""".stripMargin,

      "dedup_exact" ->
        """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_copies
          |FROM documents GROUP BY 1 ORDER BY text_hash""".stripMargin,

      "q2_knn_hydrated" ->
        s"""$cte, topk AS (
           |SELECT e.vec_id AS vec_id, ${l2("e.embedding", "q.qe")} AS dist
           |FROM embeddings e CROSS JOIN q ORDER BY dist ASC, vec_id ASC LIMIT 10)
           |SELECT t.vec_id, t.dist, d.lang FROM topk t
           |LEFT JOIN documents d ON t.vec_id = d.doc_id
           |ORDER BY t.dist ASC, t.vec_id ASC""".stripMargin,

      "dedup_minhash_lsh" -> minhashLshSql,

      // the stream-maintained pair table replays the one-shot batch
      // screen exactly (each pair emitted by exactly one flush)
      "b10_stream_neardup" -> minhashLshSql,

      // same signature/banding construction as minhashLshSql, split
      // into sides; a bucket is kept when it holds >= 1 doc of each
      // side and <= maxBucket docs total (the engine's cross-side
      // bucket guard); only (new, old) cross pairs are emitted
      "dedup_incremental" ->
        s"""WITH toks AS (
           |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS ts FROM documents),
           |ws AS (
           |  SELECT doc_id, list_distinct(list_transform(
           |    generate_series(1, greatest(len(ts)-2, 1)),
           |    i -> concat_ws(' ', ts[i], ts[i+1], ts[i+2]))) AS w FROM toks),
           |sig AS (
           |  SELECT doc_id, list_transform(generate_series(0, 7),
           |    s -> list_min(list_transform(w,
           |      t -> substr(md5(concat(CAST(s // 4 AS VARCHAR), '|', t)),
           |                  (s % 4) * 8 + 1, 8)))) AS mh FROM ws),
           |bands AS (
           |  SELECT doc_id, doc_id % 7 = 0 AS is_new, u.band_id,
           |    md5(array_to_string(mh[u.band_id*2+1 : u.band_id*2+2], '|')) AS bh
           |  FROM sig, unnest(generate_series(0, 3)) AS u(band_id)),
           |keepb AS (
           |  SELECT band_id, bh FROM bands GROUP BY band_id, bh
           |  HAVING count(DISTINCT CASE WHEN is_new THEN doc_id END) >= 1
           |    AND count(DISTINCT CASE WHEN NOT is_new THEN doc_id END) >= 1
           |    AND count(DISTINCT doc_id) <= $DedupMaxBucket),
           |pairs AS (
           |  SELECT DISTINCT x.doc_id AS new_id, y.doc_id AS old_id
           |  FROM bands x JOIN bands y
           |  ON x.band_id = y.band_id AND x.bh = y.bh
           |    AND x.is_new AND NOT y.is_new AND x.doc_id <> y.doc_id
           |  JOIN keepb k ON x.band_id = k.band_id AND x.bh = k.bh)
           |SELECT new_id, old_id FROM pairs ORDER BY new_id, old_id""".stripMargin,

      // triangle twin: id-ordered 3-way join counts each triangle once,
      // ≡ the engine's degree-oriented wedge construction
      "graph_triangles" ->
        s"""WITH $jaccardCtes,
           |tg_e AS MATERIALIZED (SELECT a, b FROM jpairs),
           |tg_tri AS (
           |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
           |  FROM tg_e e1
           |  JOIN tg_e e2 ON e2.a = e1.a AND e2.b > e1.b
           |  JOIN tg_e e3 ON e3.a = e1.b AND e3.b = e2.b),
           |tg_deg AS (SELECT id, CAST(count(*) AS BIGINT) AS deg FROM (
           |  SELECT a AS id FROM tg_e UNION ALL SELECT b AS id FROM tg_e) u
           |  GROUP BY id),
           |tg_cnt AS (SELECT id, CAST(count(*) AS BIGINT) AS n_tri FROM (
           |  SELECT x AS id FROM tg_tri UNION ALL SELECT y AS id FROM tg_tri
           |  UNION ALL SELECT z AS id FROM tg_tri) c GROUP BY id)
           |SELECT d.id AS doc_id, d.deg,
           |  CAST(coalesce(c.n_tri, 0) AS BIGINT) AS n_tri,
           |  CASE WHEN d.deg >= 2 THEN
           |    CAST(2 * coalesce(c.n_tri, 0) AS DOUBLE)
           |      / CAST(d.deg * (d.deg - 1) AS DOUBLE)
           |  ELSE CAST(0 AS DOUBLE) END AS coeff
           |FROM tg_deg d LEFT JOIN tg_cnt c ON d.id = c.id
           |ORDER BY doc_id""".stripMargin,

      "dedup_ngram_jaccard" ->
        s"""WITH $jaccardCtes
           |SELECT a, b, jaccard FROM jpairs ORDER BY a, b""".stripMargin,

      "graph_pagerank" -> pagerankSql,

      "t_profile" -> profileSql,

      // the quantile sketch is a pure function of the input multiset —
      // the oracle rebuilds it (k hash-smallest rows per group) and
      // takes the identical interpolated quantiles over the sample
      "sketch_kll" ->
        """WITH ranked AS (
          |  SELECT lang AS g, CAST(n_chars AS DOUBLE) AS v,
          |    row_number() OVER (PARTITION BY lang
          |      ORDER BY md5(CAST(doc_id AS VARCHAR)), CAST(n_chars AS DOUBLE)) AS rn
          |  FROM documents)
          |SELECT g AS lang, count(*) AS n_sample,
          |  quantile_cont(v, 0.5) AS p50, quantile_cont(v, 0.9) AS p90,
          |  quantile_cont(v, 0.99) AS p99
          |FROM ranked WHERE rn <= 256 GROUP BY g ORDER BY lang""".stripMargin,

      // delta-log upsert + tombstones: the merged stream state must
      // equal the plain update/delete SQL over the same corpus
      "b10_stream_tombstone" ->
        """SELECT doc_id,
          |  CASE WHEN doc_id % 7 = 0 THEN upper(lang) ELSE lang END AS lang
          |FROM documents WHERE doc_id % 5 <> 0 ORDER BY doc_id""".stripMargin,

      // streaming fold ≡ batch sketch (idempotent union merge): same
      // oracle as sketch_kll
      "b10_stream_kll" ->
        """WITH ranked AS (
          |  SELECT lang AS g, CAST(n_chars AS DOUBLE) AS v,
          |    row_number() OVER (PARTITION BY lang
          |      ORDER BY md5(CAST(doc_id AS VARCHAR)), CAST(n_chars AS DOUBLE)) AS rn
          |  FROM documents)
          |SELECT g AS lang, count(*) AS n_sample,
          |  quantile_cont(v, 0.5) AS p50, quantile_cont(v, 0.9) AS p90,
          |  quantile_cont(v, 0.99) AS p99
          |FROM ranked WHERE rn <= 256 GROUP BY g ORDER BY lang""".stripMargin,

      "sketch_quantile" ->
        """WITH smp AS (
          |  SELECT o_totalprice FROM orders
          |  WHERE CAST(concat('0x', left(md5(CAST(o_orderkey AS VARCHAR)), 8)) AS UBIGINT)
          |    / 4294967296.0 < 0.1),
          |ex AS (SELECT quantile_cont(o_totalprice, 0.5) AS exact_p50 FROM orders)
          |SELECT quantile_cont(o_totalprice, 0.25) AS q0,
          |  quantile_cont(o_totalprice, 0.5) AS q1,
          |  quantile_cont(o_totalprice, 0.75) AS q2,
          |  quantile_cont(o_totalprice, 0.95) AS q3,
          |  ex.exact_p50 AS exact_p50
          |FROM smp CROSS JOIN ex
          |GROUP BY ex.exact_p50""".stripMargin,

      // exact-selection twin: the engine's radix bisection returns the
      // max(1, ceil(p*n))-th smallest element — an actual input value,
      // so a row_number order-statistic replay is bit-exact with no
      // interpolation semantics to match. ceil(p*n) computed in DOUBLE
      // on both sides (same IEEE product, same ceil).
      "sketch_quantile_exact" ->
        """WITH r AS (
          |  SELECT CAST(n_chars AS DOUBLE) AS v,
          |    row_number() OVER (ORDER BY CAST(n_chars AS DOUBLE)) AS rn,
          |    count(*) OVER () AS n
          |  FROM documents WHERE n_chars IS NOT NULL)
          |SELECT max(n) AS n_rows,
          |  max(CASE WHEN rn = greatest(1, CAST(ceil(CAST('0.01' AS DOUBLE) * n) AS BIGINT)) THEN v END) AS q0,
          |  max(CASE WHEN rn = greatest(1, CAST(ceil(CAST('0.25' AS DOUBLE) * n) AS BIGINT)) THEN v END) AS q1,
          |  max(CASE WHEN rn = greatest(1, CAST(ceil(CAST('0.5' AS DOUBLE) * n) AS BIGINT)) THEN v END) AS q2,
          |  max(CASE WHEN rn = greatest(1, CAST(ceil(CAST('0.9' AS DOUBLE) * n) AS BIGINT)) THEN v END) AS q3,
          |  max(CASE WHEN rn = greatest(1, CAST(ceil(CAST('0.99' AS DOUBLE) * n) AS BIGINT)) THEN v END) AS q4
          |FROM r""".stripMargin,

      "sketch_quantile_exact_grouped" ->
        """WITH r AS (
          |  SELECT lang, CAST(n_chars AS DOUBLE) AS v,
          |    row_number() OVER (PARTITION BY lang ORDER BY CAST(n_chars AS DOUBLE)) AS rn,
          |    count(*) OVER (PARTITION BY lang) AS n
          |  FROM documents WHERE n_chars IS NOT NULL AND lang IS NOT NULL)
          |SELECT lang, max(n) AS n_rows,
          |  max(CASE WHEN rn = greatest(1, CAST(ceil(CAST('0.5' AS DOUBLE) * n) AS BIGINT)) THEN v END) AS p50,
          |  max(CASE WHEN rn = greatest(1, CAST(ceil(CAST('0.9' AS DOUBLE) * n) AS BIGINT)) THEN v END) AS p90,
          |  max(CASE WHEN rn = greatest(1, CAST(ceil(CAST('0.99' AS DOUBLE) * n) AS BIGINT)) THEN v END) AS p99
          |FROM r GROUP BY lang ORDER BY lang""".stripMargin,

      "dedup_editdist" ->
        """WITH grams0 AS (
          |  SELECT doc_id, unnest(list_distinct(list_transform(
          |    generate_series(1, greatest(length(lower(text)) - 4, 1)),
          |    i -> substr(lower(text), i, 5)))) AS g
          |  FROM documents),
          |keepg AS (SELECT g FROM grams0 GROUP BY g
          |          HAVING count(DISTINCT doc_id) <= 100),
          |grams AS (SELECT grams0.doc_id, grams0.g
          |          FROM grams0 JOIN keepg ON grams0.g = keepg.g),
          |sz AS (SELECT doc_id, count(*) AS s FROM grams GROUP BY doc_id),
          |inter AS (
          |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
          |  FROM grams x JOIN grams y ON x.g = y.g AND x.doc_id < y.doc_id
          |  GROUP BY 1, 2),
          |pairs AS (
          |  SELECT a, b
          |  FROM inter JOIN sz sa ON a = sa.doc_id JOIN sz sb ON b = sb.doc_id
          |  WHERE CAST(i AS DOUBLE) / CAST(sa.s + sb.s - i AS DOUBLE) >= 0.3)
          |SELECT p.a AS a, p.b AS b,
          |  CAST(levenshtein(ta.text, tb.text) AS BIGINT) AS edit_dist
          |FROM pairs p
          |JOIN documents ta ON p.a = ta.doc_id
          |JOIN documents tb ON p.b = tb.doc_id
          |WHERE levenshtein(ta.text, tb.text) <= 5
          |ORDER BY a, b""".stripMargin,

      // winnowing: md5 per char-40-gram position, min per 10-hash
      // window, distinct per doc, bucket-join on shared fingerprints
      "dedup_shared_passage" ->
        """WITH h AS (
          |  SELECT doc_id,
          |    CASE WHEN length(lower(text)) >= 40 THEN
          |      list_transform(generate_series(1, length(lower(text)) - 39),
          |        i -> md5(substr(lower(text), i, 40)))
          |    ELSE CAST([] AS VARCHAR[]) END AS hs
          |  FROM documents),
          |fp AS (
          |  SELECT doc_id, unnest(list_distinct(
          |    CASE WHEN len(hs) = 0 THEN CAST([] AS VARCHAR[])
          |    ELSE list_transform(generate_series(1, greatest(len(hs) - 9, 1)),
          |      j -> list_min(list_slice(hs, j, j + 9))) END)) AS f
          |  FROM h),
          |keep AS (SELECT f FROM fp GROUP BY f
          |         HAVING count(*) BETWEEN 2 AND 10000),
          |k AS (SELECT fp.doc_id, fp.f FROM fp JOIN keep ON fp.f = keep.f)
          |SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS n_shared
          |FROM k x JOIN k y ON x.f = y.f AND x.doc_id < y.doc_id
          |GROUP BY 1, 2 ORDER BY a, b""".stripMargin,

      // same pair CTE as dedup_ngram_jaccard, then min-label reachability:
      // walk enumerates (node, label) states with label < node (the seed is
      // (node, node)); the global component min always propagates because
      // every node on a path from the min has a larger id than the min, so
      // the w.comp < e.dst guard never blocks it — it only prunes labels
      // that could never win the MIN
      "dedup_clusters" ->
        s"""$clustersCtes
           |SELECT id, min(comp) AS comp FROM walk GROUP BY id ORDER BY id""".stripMargin,

      // cluster components + per-cluster best-quality survivor (ties →
      // lowest id); quality doubles are bit-identical (t_quality), so
      // the window order and the loser set agree across engines
      "dedup_cluster_best" ->
        s"""$clustersCtes,
           |comps AS (SELECT id, min(comp) AS comp FROM walk GROUP BY id),
           |quals AS (SELECT doc_id, quality FROM ($qualitySql)),
           |ranked AS (
           |  SELECT c.id, CAST(row_number() OVER (PARTITION BY c.comp
           |    ORDER BY q.quality DESC, c.id ASC) AS BIGINT) AS rn
           |  FROM comps c JOIN quals q ON c.id = q.doc_id),
           |losers AS (SELECT id FROM ranked WHERE rn <> 1)
           |SELECT d.doc_id, q.quality FROM documents d
           |JOIN quals q ON d.doc_id = q.doc_id
           |WHERE d.doc_id NOT IN (SELECT id FROM losers)
           |ORDER BY d.doc_id""".stripMargin,

      // composition of the three oracles above over ONE shared
      // clusters/quality replay: keep = NOT IN losers, split = the
      // same md5-uniform over the coalesced cluster key
      "pipeline_dedup_full" ->
        s"""$clustersCtes,
           |comps AS (SELECT id, min(comp) AS comp FROM walk GROUP BY id),
           |quals AS (SELECT doc_id, quality FROM ($qualitySql)),
           |ranked AS (
           |  SELECT c.id, CAST(row_number() OVER (PARTITION BY c.comp
           |    ORDER BY q.quality DESC, c.id ASC) AS BIGINT) AS rn
           |  FROM comps c JOIN quals q ON c.id = q.doc_id),
           |losers AS (SELECT id FROM ranked WHERE rn <> 1),
           |keyed AS (
           |  SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS k
           |  FROM documents d LEFT JOIN comps c ON d.doc_id = c.id),
           |h AS (SELECT doc_id, k,
           |  CAST(concat('0x', left(md5(CAST(k AS VARCHAR)), 8)) AS UBIGINT)
           |    / 4294967296.0 AS u FROM keyed)
           |SELECT h.doc_id, CAST(h.k AS BIGINT) AS comp, q.quality,
           |  h.doc_id NOT IN (SELECT id FROM losers) AS keep,
           |  CASE WHEN u < 0.75 THEN 'train'
           |       WHEN u < 0.875 THEN 'val'
           |       ELSE 'test' END AS split
           |FROM h JOIN quals q ON h.doc_id = q.doc_id
           |ORDER BY h.doc_id""".stripMargin,

      // segment doc-frequency ≥ 390 → boilerplate; survivors re-joined
      // in original position order (string_agg ORDER BY ≡ the engine's
      // array_sort over (pos, seg) structs)
      "dedup_boilerplate" ->
        """WITH segs AS (
          |  SELECT doc_id, unnest(string_split(text, ' ')) AS seg,
          |         generate_subscripts(string_split(text, ' '), 1) AS pos
          |  FROM documents),
          |s2 AS (SELECT * FROM segs WHERE seg <> ''),
          |boiler AS (
          |  SELECT seg FROM s2 GROUP BY seg HAVING count(DISTINCT doc_id) >= 390),
          |kept AS (
          |  SELECT s2.* FROM s2 LEFT JOIN boiler b ON s2.seg = b.seg
          |  WHERE b.seg IS NULL),
          |reb AS (
          |  SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS text_clean,
          |         CAST(count(*) AS BIGINT) AS n_kept
          |  FROM kept GROUP BY doc_id),
          |tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_all
          |        FROM s2 GROUP BY doc_id)
          |SELECT d.doc_id,
          |  coalesce(reb.text_clean, '') AS text_clean,
          |  coalesce(reb.n_kept, 0) AS n_kept,
          |  coalesce(tot.n_all, 0) - coalesce(reb.n_kept, 0) AS n_removed
          |FROM documents d LEFT JOIN reb ON d.doc_id = reb.doc_id
          |LEFT JOIN tot ON d.doc_id = tot.doc_id
          |ORDER BY d.doc_id""".stripMargin,

      // SemDeDup: assignment argmin → within-cluster pairs → recursive
      // component walk → keeper = (cos_centroid asc, id asc) first.
      // Centroid literals are exact double strings of the float values,
      // so the centroid-cosine arithmetic is bit-identical
      "dedup_semantic" -> {
        val lv = (0 until 8).map(j => s"(${ivfAssignDistSql(j)})").mkString(", ")
        // per-element STRING cast: a bare decimal literal parses as
        // DECIMAL(38) (the cosine products overflow it), and DuckDB's
        // decimal→double conversion is not correctly rounded (measured
        // 1-ulp error) — CAST('…' AS DOUBLE) goes through strtod and is
        // exact. The distance-only oracles get away with bare literals
        // because argmin/float-rounding absorb the ulp; a double output
        // column does not.
        val il = fixedIvfCentroids.map(c =>
          c.map(v => s"CAST('${v.toDouble.toString}' AS DOUBLE)")
            .mkString("[", ", ", "]"))
          .mkString("[", ", ", "]")
        val dotc = ("0.0" +: (1 to OracleSql.Dim).map(i =>
          s"CAST(l.embedding[$i] AS DOUBLE) * l.il[l.cid + 1][$i]")).mkString(" + ")
        val cnorm = "sqrt(" + ("0.0" +: (1 to OracleSql.Dim).map(i =>
          s"l.il[l.cid + 1][$i] * l.il[l.cid + 1][$i]")).mkString(" + ") + ")"
        s"""WITH RECURSIVE enc AS (
           |  SELECT vec_id, embedding, (list_position(lv, list_min(lv)) - 1) AS cid
           |  FROM (SELECT vec_id, embedding, list_value($lv) AS lv FROM embeddings)),
           |prs AS (
           |  SELECT x.vec_id AS a, y.vec_id AS b
           |  FROM enc x JOIN enc y ON x.cid = y.cid AND x.vec_id < y.vec_id
           |  WHERE ${norm("x.embedding")} > 0 AND ${norm("y.embedding")} > 0
           |    AND ${cosineSim("x.embedding", "y.embedding")} >= 0.45),
           |edges AS (
           |  SELECT a AS src, b AS dst FROM prs
           |  UNION SELECT b AS src, a AS dst FROM prs),
           |walk(id, comp) AS (
           |  SELECT src, src FROM edges
           |  UNION
           |  SELECT e.dst, w.comp FROM walk w
           |  JOIN edges e ON e.src = w.id WHERE w.comp < e.dst),
           |comps AS (SELECT id, min(comp) AS comp FROM walk GROUP BY id),
           |cl AS (SELECT e.vec_id, e.cid, e.embedding, $il AS il FROM enc e),
           |scored AS (
           |  SELECT c.id, c.comp, l.cid,
           |    ($dotc) / ((${norm("l.embedding")}) * ($cnorm)) AS cosc
           |  FROM comps c JOIN cl l ON c.id = l.vec_id),
           |ranked AS (
           |  SELECT id, comp, cid, cosc,
           |    row_number() OVER (PARTITION BY comp ORDER BY cosc ASC, id ASC) AS rn,
           |    first_value(id) OVER (PARTITION BY comp ORDER BY cosc ASC, id ASC)
           |      AS keep_id
           |  FROM scored)
           |SELECT id AS vec_id, keep_id, CAST(cid AS BIGINT) AS cluster_id,
           |  cosc AS cos_centroid
           |FROM ranked WHERE rn <> 1 ORDER BY vec_id""".stripMargin
      },

      "ann_cosine_neardup" ->
        s"""SELECT x.vec_id AS a, y.vec_id AS b,
           |${cosineSim("x.embedding", "y.embedding")} AS cos_sim
           |FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id
           |WHERE ${norm("x.embedding")} > 0 AND ${norm("y.embedding")} > 0
           |AND ${cosineSim("x.embedding", "y.embedding")} >= 0.45
           |ORDER BY a, b""".stripMargin,

      // 32×4-bit banded LSH recovers the complete exact pair set at this
      // threshold on this data — same oracle as the brute-force query
      "ann_cosine_neardup_lsh" ->
        s"""SELECT x.vec_id AS a, y.vec_id AS b,
           |${cosineSim("x.embedding", "y.embedding")} AS cos_sim
           |FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id
           |WHERE ${norm("x.embedding")} > 0 AND ${norm("y.embedding")} > 0
           |AND ${cosineSim("x.embedding", "y.embedding")} >= 0.45
           |ORDER BY a, b""".stripMargin,

      "dedup_simhash" ->
        s"""WITH $simhashOracleCtes
          |SELECT doc_id, simhash FROM fp ORDER BY doc_id""".stripMargin,

      "dedup_simhash_weighted" ->
        s"""WITH $simhashWeightedOracleCtes
          |SELECT doc_id, simhash FROM fp ORDER BY doc_id""".stripMargin,

      // fingerprint CTE shared with dedup_simhash; first 14 hex chars
      // = 56 fingerprint bits (non-negative long range), then the
      // honest all-pairs join the engine's blocked screen must equal
      "dedup_simhash_neardup" ->
        s"""WITH $simhashOracleCtes,
          |hv AS (SELECT doc_id,
          |  CAST(CAST(concat('0x', left(simhash, 14)) AS UBIGINT) AS BIGINT) AS h
          |  FROM fp)
          |SELECT ha.doc_id AS a, hb.doc_id AS b,
          |  CAST(bit_count(xor(ha.h, hb.h)) AS BIGINT) AS hamming
          |FROM hv ha JOIN hv hb ON ha.doc_id < hb.doc_id
          |WHERE bit_count(xor(ha.h, hb.h)) <= 3
          |ORDER BY a, b""".stripMargin,

      "q_salted_agg" ->
        s"""SELECT user_id, count(*) AS n_events, ${decSum("value")} AS sum_value
           |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

      "q10_returned" ->
        s"""SELECT c.c_custkey, c.c_name, n.n_name,
           |  ${decSum("l.l_extendedprice * (1 - l.l_discount)", 6)} AS revenue,
           |  CAST(count(*) AS BIGINT) AS n_items
           |FROM lineitem l
           |JOIN orders o ON l.l_orderkey = o.o_orderkey
           |JOIN customer c ON o.o_custkey = c.c_custkey
           |JOIN nation n ON c.c_nationkey = n.n_nationkey
           |WHERE l.l_returnflag = 'R'
           |  AND o.o_orderdate >= TIMESTAMP '1996-04-01'
           |  AND o.o_orderdate < TIMESTAMP '1996-07-01'
           |GROUP BY 1, 2, 3
           |ORDER BY revenue DESC, c.c_custkey ASC LIMIT 20""".stripMargin,

      // correlation twin: identical VARCHAR-routed decimal sufficient
      // sums, identical IEEE expression
      "q_corr" ->
        s"""WITH cc AS (
           |  SELECT l_returnflag,
           |    CAST(count(*) AS DOUBLE) AS nn,
           |    ${sparkDecSumToDouble("l_quantity")} AS sx,
           |    ${sparkDecSumToDouble("l_extendedprice")} AS sy,
           |    ${sparkDecSumToDouble("l_quantity * l_quantity")} AS sxx,
           |    ${sparkDecSumToDouble("l_extendedprice * l_extendedprice")} AS syy,
           |    ${sparkDecSumToDouble("l_quantity * l_extendedprice")} AS sxy
           |  FROM lineitem GROUP BY l_returnflag)
           |SELECT l_returnflag,
           |  (nn * sxy - sx * sy)
           |    / sqrt((nn * sxx - sx * sx) * (nn * syy - sy * sy)) AS corr,
           |  CAST(nn AS BIGINT) AS n
           |FROM cc ORDER BY l_returnflag""".stripMargin,

      // mode twin: row_number rank ≡ the engine's max(struct(cnt, −v))
      "q_mode" ->
        """WITH mc AS (
          |  SELECT l_returnflag, l_quantity, CAST(count(*) AS BIGINT) AS cnt
          |  FROM lineitem GROUP BY 1, 2)
          |SELECT l_returnflag, l_quantity AS mode_qty, cnt AS mode_cnt
          |FROM (SELECT l_returnflag, l_quantity, cnt,
          |    row_number() OVER (PARTITION BY l_returnflag
          |      ORDER BY cnt DESC, l_quantity ASC) AS rn
          |  FROM mc) r
          |WHERE rn = 1 ORDER BY l_returnflag""".stripMargin,

      // histogram twin: identical IEEE bin expression, clamped top bin
      "events_histogram" ->
        """WITH b AS (SELECT min(value) AS lo, max(value) AS hi FROM events)
          |SELECT CAST(least(CAST(19 AS DOUBLE),
          |    floor((e.value - b.lo) * CAST(20 AS DOUBLE) / (b.hi - b.lo)))
          |    AS BIGINT) AS bin,
          |  CAST(count(*) AS BIGINT) AS n
          |FROM events e CROSS JOIN b
          |GROUP BY 1 ORDER BY bin""".stripMargin,

      "q_moving_sum" ->
        """SELECT o_custkey, o_orderkey,
          |CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(28,2))) OVER (
          |  PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
          |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS mov_sum
          |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

      "q_range_join" ->
        s"""SELECT e.event_id, e.user_id, count(o.o_orderkey) AS n_orders,
           |coalesce(${decSum("o.o_totalprice")}, 0.0) AS sum_total
           |FROM events e LEFT JOIN orders o
           |  ON e.user_id = o.o_custkey
           |  AND epoch_us(o.o_orderdate) <= epoch_us(e.ts)
           |  AND epoch_us(o.o_orderdate) >= epoch_us(e.ts) - ${30L * 86400 * 1000000L}
           |GROUP BY e.event_id, e.user_id ORDER BY e.event_id""".stripMargin,

      "b10_stream_dedup" ->
        "SELECT count(DISTINCT user_id) AS n_users FROM events",

      "t_langid" -> langIdSql,

      "t_quality" -> qualitySql,

      // hash-uniform twin: first 8 md5 hex chars as u32 over 2^32, same
      // expression Sampling.hashUniform computes via conv(_,16,10)
      "sample_stratified" ->
        """SELECT doc_id, lang FROM (
          |  SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
          |    ORDER BY CAST(concat('0x', left(md5(CAST(doc_id AS VARCHAR)), 8)) AS UBIGINT),
          |      doc_id) AS rn
          |  FROM documents) t
          |WHERE rn <= 20 ORDER BY lang, doc_id""".stripMargin,

      "sample_temperature" ->
        """WITH c AS (SELECT lang, count(*) AS n FROM documents
          |  WHERE lang IS NOT NULL GROUP BY lang),
          |r AS (SELECT lang, n,
          |  CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS s0 FROM c),
          |r2 AS (SELECT lang, n,
          |  CASE WHEN (s0+1)*(s0+1) <= n THEN s0+1 ELSE s0 END AS s1 FROM r),
          |r3 AS (SELECT lang,
          |  CASE WHEN s1*s1 > n THEN s1-1 ELSE s1 END AS sq FROM r2),
          |q AS (SELECT lang,
          |  (sq * 200) // (SELECT sum(sq) FROM r3) AS quota FROM r3),
          |ranked AS (SELECT doc_id, lang, row_number() OVER (PARTITION BY lang
          |  ORDER BY CAST(concat('0x', left(md5(CAST(doc_id AS VARCHAR)), 8)) AS UBIGINT),
          |    doc_id) AS rn
          |  FROM documents WHERE lang IS NOT NULL)
          |SELECT ranked.doc_id, ranked.lang FROM ranked JOIN q USING (lang)
          |WHERE rn <= quota ORDER BY doc_id""".stripMargin,

      "sample_mixture" ->
        """SELECT doc_id, source FROM (
          |  SELECT doc_id, source, row_number() OVER (PARTITION BY source
          |    ORDER BY CAST(concat('0x', left(md5(CAST(doc_id AS VARCHAR)), 8)) AS UBIGINT),
          |      doc_id) AS rn
          |  FROM documents) t
          |WHERE rn <= CASE source WHEN 'src0' THEN 40 WHEN 'src1' THEN 10
          |  WHEN 'src2' THEN 5 WHEN 'src5' THEN 7 ELSE 0 END
          |ORDER BY source, doc_id""".stripMargin,

      // epoch upsampling: whole copies by source + one fractional copy
      // under the salted hash cut; copy indices materialize via
      // generate_series exactly like the engine's sequence-explode
      "sample_upsample" ->
        """WITH h AS (
          |  SELECT doc_id, source,
          |    CAST(concat('0x', left(md5(concat('up', CAST(doc_id AS VARCHAR))), 8))
          |      AS UBIGINT) / 4294967296.0 AS u
          |  FROM documents),
          |c AS (
          |  SELECT doc_id, source,
          |    (CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 0
          |      WHEN 'src2' THEN 1 ELSE 0 END)
          |    + (CASE WHEN u < (CASE source WHEN 'src0' THEN 0.25
          |        WHEN 'src1' THEN 0.5 WHEN 'src2' THEN 0.0 ELSE 0.0 END)
          |      THEN 1 ELSE 0 END) AS copies
          |  FROM h)
          |SELECT doc_id, source,
          |  CAST(unnest(generate_series(0, copies - 1)) AS BIGINT) AS epoch
          |FROM c WHERE copies > 0 ORDER BY doc_id, epoch""".stripMargin,

      "sample_hash_frac" ->
        """SELECT doc_id FROM documents
          |WHERE CAST(concat('0x', left(md5(CAST(doc_id AS VARCHAR)), 8)) AS UBIGINT)
          |  / 4294967296.0 < 0.25
          |ORDER BY doc_id""".stripMargin,

      "sample_weighted" ->
        """SELECT doc_id, (-ln(u)) / CAST(n_chars AS DOUBLE) AS es_key
          |FROM (
          |  SELECT doc_id, n_chars,
          |    CAST(concat('0x', left(md5(CAST(doc_id AS VARCHAR)), 8)) AS UBIGINT)
          |      / 4294967296.0 AS u
          |  FROM documents)
          |ORDER BY es_key ASC, doc_id ASC LIMIT 100""".stripMargin,

      "sample_weighted_grouped" ->
        """SELECT doc_id, lang, es_key FROM (
          |  SELECT doc_id, lang, (-ln(u)) / CAST(n_chars AS DOUBLE) AS es_key,
          |    row_number() OVER (PARTITION BY lang
          |      ORDER BY (-ln(u)) / CAST(n_chars AS DOUBLE) ASC, doc_id ASC) AS rn
          |  FROM (
          |    SELECT doc_id, lang, n_chars,
          |      CAST(concat('0x', left(md5(CAST(doc_id AS VARCHAR)), 8)) AS UBIGINT)
          |        / 4294967296.0 AS u
          |    FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0))
          |WHERE rn <= 20 ORDER BY doc_id""".stripMargin,

      "sample_hash_split" ->
        """SELECT split, count(*) AS n FROM (
          |  SELECT CASE WHEN u < 0.75 THEN 'train'
          |              WHEN u < 0.875 THEN 'val'
          |              ELSE 'test' END AS split
          |  FROM (SELECT CAST(concat('0x', left(md5(CAST(doc_id AS VARCHAR)), 8)) AS UBIGINT)
          |    / 4294967296.0 AS u FROM documents) h) s
          |GROUP BY split ORDER BY split""".stripMargin,

      // same clusters CTE as dedup_clusters, then the hash-split CASE
      // over the canonical (min-id) cluster member; unclustered docs
      // key on their own id — bitwise the sample_hash_split label
      "sample_split_cluster" ->
        s"""$clustersCtes,
           |comps AS (SELECT id, min(comp) AS comp FROM walk GROUP BY id),
           |keyed AS (
           |  SELECT d.doc_id, coalesce(c.comp, d.doc_id) AS k
           |  FROM documents d LEFT JOIN comps c ON d.doc_id = c.id),
           |h AS (SELECT doc_id,
           |  CAST(concat('0x', left(md5(CAST(k AS VARCHAR)), 8)) AS UBIGINT)
           |    / 4294967296.0 AS u FROM keyed)
           |SELECT doc_id, CASE WHEN u < 0.75 THEN 'train'
           |                    WHEN u < 0.875 THEN 'val'
           |                    ELSE 'test' END AS split
           |FROM h ORDER BY doc_id""".stripMargin,

      "sample_kcenter" -> kcenterSql(8),

      "sample_kcenter_cover" -> kcenterCoverSql(8),

      "sample_kcenter_cells" -> kcenterCellsSql(16),

      "sample_epoch_shuffle" ->
        """SELECT doc_id,
          |  md5(concat('3', '|', CAST(doc_id AS VARCHAR))) AS shuffle_key
          |FROM documents""".stripMargin,

      // word-level repetition twins of TextFunctions.repetitionSignals;
      // same tokenization as the jaccard grams (regex whitespace split on
      // lowered text), integer-count arithmetic cast to double at the end
      // per-(doc, code point) exact counts, ascending-code-point
      // list_reduce fold of c·ln(c) (binary collation ≡ code-point
      // order), then the fixed ln(n) − acc/n IEEE chain
      "t_entropy" ->
        """WITH e AS (
          |  SELECT doc_id, unnest(string_split(text, '')) AS ch
          |  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
          |c AS (
          |  SELECT doc_id, ch, CAST(count(*) AS DOUBLE) AS c
          |  FROM e GROUP BY doc_id, ch),
          |s AS (
          |  SELECT doc_id,
          |    list_reduce(list_prepend(CAST('0.0' AS DOUBLE),
          |      list(c * ln(c) ORDER BY ch)), (x, y) -> x + y) AS acc,
          |    CAST(sum(CAST(c AS BIGINT)) AS DOUBLE) AS n
          |  FROM c GROUP BY doc_id)
          |SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_cp,
          |  ln(s.n) - s.acc / s.n AS h_nats,
          |  (ln(s.n) - s.acc / s.n) / CAST('0.6931471805599453' AS DOUBLE)
          |    AS h_bits
          |FROM documents d JOIN s ON d.doc_id = s.doc_id
          |ORDER BY d.doc_id""".stripMargin,

      // URL canonicalization replay: identical planting CASE chains,
      // identical RE2∩Java patterns (each matches at most once, so
      // DuckDB's replace-first ≡ Spark's replace-all), and DuckDB's
      // regexp_extract returns '' on no match exactly like Spark's
      "t_url_canon" ->
        s"""WITH $urlCanonCtes
           |SELECT doc_id, url, canon,
           |  regexp_replace(regexp_extract(canon,
           |    '^[a-z][a-z0-9+.-]*://([^/?#]*).*$$', 1), ':[0-9]+$$', '')
           |    AS host
           |FROM urlc ORDER BY doc_id""".stripMargin,

      // URL dedup replay: the t_url_canon chain down to `canon`, then
      // min-doc_id-per-canon keep-first
      "dedup_url" ->
        s"""WITH $urlCanonCtes,
           |k AS (SELECT canon, min(doc_id) AS keep_id FROM urlc GROUP BY canon)
           |SELECT urlc.doc_id, urlc.canon FROM urlc
           |JOIN k ON urlc.doc_id = k.keep_id
           |ORDER BY urlc.doc_id""".stripMargin,

      // list_filter(contains) replays the automaton's distinct-match
      // set in the same pattern-list order; the filter and the joined
      // report replay the gate exactly
      "t_blocklist" ->
        s"""WITH m AS (SELECT doc_id,
          |  list_filter([${BlockPatterns.map(p => s"'$p'").mkString(", ")}],
          |    p -> contains(text, p)) AS hits
          |  FROM documents)
          |SELECT doc_id, CAST(len(hits) AS BIGINT) AS n_hits,
          |  array_to_string(hits, '|') AS matched
          |FROM m WHERE len(hits) > 0 ORDER BY doc_id""".stripMargin,

      // the word-bounded twin: identical normalization chain (regexp
      // collapse + end padding) on both engines, space-padded patterns
      "t_blocklist_words" ->
        s"""WITH nrm AS (SELECT doc_id,
          |  ' ' || regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')
          |    || ' ' AS t FROM documents),
          |m AS (SELECT doc_id,
          |  list_filter([${WordBlockPatterns.map(p => s"' $p '").mkString(", ")}],
          |    p -> contains(t, p)) AS hits FROM nrm)
          |SELECT doc_id, CAST(len(hits) AS BIGINT) AS n_hits,
          |  array_to_string(list_transform(hits, h -> trim(h)), '|') AS matched
          |FROM m WHERE len(hits) > 0 ORDER BY doc_id""".stripMargin,

      "t_repetition" ->
        """WITH toks AS (
          |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
          |    x -> x <> '') AS t FROM documents),
          |g AS (SELECT doc_id, t, len(t) AS n,
          |  CASE WHEN len(t) >= 2 THEN list_transform(
          |    generate_series(1, len(t)-1), i -> concat_ws(' ', t[i], t[i+1]))
          |  ELSE [] END AS bg,
          |  CASE WHEN len(t) >= 3 THEN list_transform(
          |    generate_series(1, len(t)-2), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
          |  ELSE [] END AS g3
          |  FROM toks)
          |SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
          |  CASE WHEN n > 0 THEN CAST(n - len(list_distinct(t)) AS DOUBLE)
          |    / CAST(n AS DOUBLE) ELSE 0.0 END AS dup_word_frac,
          |  CASE WHEN len(g3) > 0 THEN CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE)
          |    / CAST(len(g3) AS DOUBLE) ELSE 0.0 END AS dup_3gram_frac,
          |  CASE WHEN len(bg) > 0 THEN CAST(list_max(list_transform(list_distinct(bg),
          |    b -> len(list_filter(bg, x -> x = b)))) AS DOUBLE)
          |    / CAST(len(bg) AS DOUBLE) ELSE 0.0 END AS top_bigram_frac
          |FROM g ORDER BY doc_id""".stripMargin,

      // Gopher signal twins: every ratio is one division of two exact
      // integers (the list_sum word-length total included), so doubles
      // agree bitwise; threshold literals route through VARCHAR casts
      // (the OracleSql decimal-literal rule)
      "t_gopher_rules" -> s"${gopherRulesSql("documents")} ORDER BY doc_id",

      // C4 line-rule twin over the same 8-word windows (list_slice
      // clamps at the tail exactly as Spark's slice does)
      "t_c4_clean" -> s"${c4CleanSql("documents")} ORDER BY doc_id",

      // global line dedup twin: row_number over (doc_id, pos) ≡ the
      // engine's min(struct(id, pos)) winner — lexicographic first
      // occurrence either way
      "dedup_lines_global" ->
        s"""WITH ld_src AS (${wordWindowLinesSql("documents", 4)})
           |${lineDedupCoreSql("ld_src")} ORDER BY doc_id""".stripMargin,

      // ExactSubstr twin: row_number first occurrence ≡ the engine's
      // min(struct(id, start)); interval islands counted by lag-gap
      "dedup_span_exact" ->
        s"${spanDedupSql("documents", 5)} ORDER BY doc_id",

      "dedup_span_chars" ->
        s"${spanDedupCharsSql("documents", 30)} ORDER BY doc_id",

      // sharded ≡ unsharded row-for-row (every gram group lands in
      // exactly one shard), so the oracle is the identical replay
      "dedup_span_chars_sharded" ->
        s"${spanDedupCharsSql("documents", 30)} ORDER BY doc_id",

      "t_fingerprint" ->
        """SELECT doc_id, list_min(list_transform(
          |  generate_series(1, greatest(length(lower(text))-7, 1)),
          |  i -> md5(substr(lower(text), i, 8)))) AS fp
          |FROM documents ORDER BY doc_id""".stripMargin,

      "s1_upsert" ->
        """SELECT doc_id, text FROM (
          |  SELECT doc_id, 'UPDATED' AS text FROM documents WHERE doc_id < 10
          |  UNION ALL
          |  SELECT doc_id, text FROM documents
          |  WHERE doc_id NOT IN (SELECT doc_id FROM documents WHERE doc_id < 10)
          |) u WHERE doc_id < 20 ORDER BY doc_id""".stripMargin,

      "s5_delete_compact" ->
        """SELECT doc_id, lang FROM documents
          |WHERE doc_id NOT IN (0, 1, 2, 3, 4) ORDER BY doc_id""".stripMargin,

      "s6_next_id" ->
        "SELECT CAST(coalesce(max(vec_id) + 1, 0) AS BIGINT) AS next_id FROM embeddings",

      "s1_store_delta_roundtrip" ->
        """SELECT text AS content FROM documents
          |WHERE (doc_id < 200 AND NOT starts_with(text, 'a'))
          |   OR (doc_id >= 200 AND doc_id < 250)
          |ORDER BY content""".stripMargin,

      "o7_ivf_filtered" ->
        s"""$cte SELECT e.vec_id AS vec_id, CAST(e.label AS BIGINT) AS label,
           |${l2("e.embedding", "q.qe")} AS dist
           |FROM embeddings e CROSS JOIN q WHERE e.label = 3
           |ORDER BY dist ASC, vec_id ASC LIMIT 10""".stripMargin,

      "o6_ivf_exhaustive" ->
        s"""$cte SELECT e.vec_id AS vec_id, ${l2("e.embedding", "q.qe")} AS dist
           |FROM embeddings e CROSS JOIN q ORDER BY dist ASC, vec_id ASC LIMIT 10""".stripMargin,

      "o3_hnsw_store_exh" ->
        s"""$cte SELECT CAST(e.vec_id AS VARCHAR) AS content,
           |${l2("e.embedding", "q.qe")} AS dist
           |FROM embeddings e CROSS JOIN q
           |ORDER BY dist ASC, content ASC LIMIT 10""".stripMargin,

      "o6_hier_exhaustive" ->
        s"""$cte SELECT e.vec_id AS vec_id, ${l2("e.embedding", "q.qe")} AS dist
           |FROM embeddings e CROSS JOIN q ORDER BY dist ASC, vec_id ASC LIMIT 10""".stripMargin,

      "b4_hier_fixed" -> {
        val m = fixedHierModel
        def distSql(cent: Array[Float]): String =
          ("0.0" +: (0 until OracleSql.Dim).map { d =>
            val c = cent(d).toDouble.toString
            val x = s"(CAST(embedding[${d + 1}] AS DOUBLE) - $c)"
            s"$x * $x"
          }).mkString(" + ")
        val sv = m.supers.map(c => s"(${distSql(c)})").mkString(", ")
        val cvCols = m.children.indices.map { g =>
          val cv = m.children(g).map(c => s"(${distSql(c)})").mkString(", ")
          s"list_value($cv) AS cv$g"
        }.mkString(",\n  ")
        val cases = m.children.indices.map { g =>
          s"WHEN $g THEN ${m.offsets(g)} + (list_position(cv$g, list_min(cv$g)) - 1)"
        }.mkString(" ")
        s"""WITH base AS (SELECT vec_id, embedding, list_value($sv) AS sv
           |  FROM embeddings),
           |sup AS (SELECT vec_id, embedding,
           |  (list_position(sv, list_min(sv)) - 1) AS g FROM base),
           |ch AS (SELECT vec_id, g,
           |  $cvCols FROM sup)
           |SELECT vec_id, CAST(CASE g $cases END AS BIGINT) AS cluster_id
           |FROM ch ORDER BY vec_id""".stripMargin
      },

      "o2_knn_join_ivf" ->
        s"""WITH q AS (
           |  SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 3),
           |cand AS (
           |  SELECT q.query_id, e.vec_id AS neighbor_id,
           |  ${OracleSql.l2("e.embedding", "q.qe")} AS dist
           |  FROM embeddings e CROSS JOIN q),
           |r AS (
           |  SELECT query_id, neighbor_id, dist,
           |  CAST(row_number() OVER (PARTITION BY query_id
           |    ORDER BY dist ASC, neighbor_id ASC) AS BIGINT) AS rank
           |  FROM cand)
           |SELECT query_id, neighbor_id, dist, rank FROM r
           |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

      // the stream-maintained HNSW index searched with exhaustive ef
      // equals exact kNN (the o3_hnsw_exhaustive construction) — same
      // query set and contract as o2_knn_join
      "b10_stream_index_exh" ->
        s"""WITH q AS (
           |  SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 3),
           |cand AS (
           |  SELECT q.query_id, e.vec_id AS neighbor_id,
           |  ${OracleSql.l2("e.embedding", "q.qe")} AS dist
           |  FROM embeddings e CROSS JOIN q),
           |r AS (
           |  SELECT query_id, neighbor_id, dist,
           |  CAST(row_number() OVER (PARTITION BY query_id
           |    ORDER BY dist ASC, neighbor_id ASC) AS BIGINT) AS rank
           |  FROM cand)
           |SELECT query_id, neighbor_id, dist, rank FROM r
           |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

      "o2_knn_join" ->
        s"""WITH q AS (
           |  SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 3),
           |cand AS (
           |  SELECT q.query_id, e.vec_id AS neighbor_id,
           |  ${OracleSql.l2("e.embedding", "q.qe")} AS dist
           |  FROM embeddings e CROSS JOIN q),
           |r AS (
           |  SELECT query_id, neighbor_id, dist,
           |  CAST(row_number() OVER (PARTITION BY query_id
           |    ORDER BY dist ASC, neighbor_id ASC) AS BIGINT) AS rank
           |  FROM cand)
           |SELECT query_id, neighbor_id, dist, rank FROM r
           |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

      "s3_projection" ->
        """SELECT vec_id, embedding[1] AS dim0,
          |CAST(array_length(embedding) AS BIGINT) AS n_dims
          |FROM embeddings WHERE vec_id < 5 ORDER BY vec_id""".stripMargin,

      "t_vocab" ->
        """SELECT word, count(*) AS n FROM (
          |SELECT unnest(string_split_regex(lower(text), '\s+')) AS word
          |FROM documents) t WHERE word <> ''
          |GROUP BY word ORDER BY n DESC, word ASC LIMIT 50""".stripMargin,

      "t_bpe_learn" -> bpeLearnSql(6),

      "t_bpe_vocab" -> bpeVocabSql(6, 50),

      "t_bpe_apply" -> bpeApplySql(FixedBpeMerges),

      // fertility twin: same replace-chain token counts as t_bpe_apply,
      // aggregated per language — exact-BIGINT sums under one division
      "t_bpe_fertility" ->
        s"""WITH ${bpeStreamCtes(FixedBpeMerges)},
           |per AS (SELECT d.lang AS lang,
           |  CASE WHEN t = '' THEN 0 ELSE len(string_split(t, ' ')) END AS n_tok,
           |  len(list_filter(string_split_regex(lower(d.text), '\\s+'),
           |    x -> x <> '')) AS n_w,
           |  length(d.text) AS n_c
           |  FROM documents d JOIN bpe_t USING (doc_id))
           |SELECT lang, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           |  CAST(sum(n_w) AS BIGINT) AS n_words,
           |  CASE WHEN sum(n_w) > 0 THEN CAST(sum(n_tok) AS DOUBLE)
           |    / CAST(sum(n_w) AS DOUBLE) ELSE 0.0 END AS fertility,
           |  CASE WHEN sum(n_tok) > 0 THEN CAST(sum(n_c) AS DOUBLE)
           |    / CAST(sum(n_tok) AS DOUBLE) ELSE 0.0 END AS chars_per_token
           |FROM per GROUP BY lang ORDER BY lang""".stripMargin,

      // manifest twin: salted-hash shard, order-independent exact-sum
      // checksum — both spelled with the shared md5 nibble parse
      "export_shards" ->
        s"""WITH h AS (SELECT doc_id, n_chars,
           |  md5(concat('', '|', CAST(doc_id AS VARCHAR))) AS m FROM documents),
           |sh AS (SELECT doc_id, n_chars,
           |  CAST(($hash32Sql) % 8 AS INT) AS shard FROM h),
           |rh AS (SELECT s.shard, s.doc_id, s.n_chars,
           |  md5(concat(CAST(s.doc_id AS VARCHAR), '|', md5(d.text))) AS m
           |  FROM sh s JOIN documents d USING (doc_id))
           |SELECT shard, CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(sum(n_chars) AS BIGINT) AS total_bytes,
           |  min(doc_id) AS min_id, max(doc_id) AS max_id,
           |  CAST(sum($hash32Sql) AS BIGINT) AS content_sum
           |FROM rh GROUP BY shard ORDER BY shard""".stripMargin,

      // full-outer md5 diff against the deterministically-churned twin
      "corpus_diff" ->
        """WITH newsnap AS (
          |  SELECT doc_id,
          |    CASE WHEN doc_id % 7 = 0 THEN text || ' [edited]'
          |         ELSE text END AS text
          |  FROM documents WHERE doc_id % 13 <> 0
          |  UNION ALL
          |  SELECT doc_id + 10000000 AS doc_id, text
          |  FROM documents WHERE doc_id % 31 = 0),
          |o AS (SELECT doc_id, md5(text) AS old_md5 FROM documents),
          |n AS (SELECT doc_id, md5(text) AS new_md5 FROM newsnap),
          |j AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
          |    old_md5, new_md5,
          |    CASE WHEN old_md5 IS NULL THEN 'added'
          |         WHEN new_md5 IS NULL THEN 'removed'
          |         WHEN old_md5 <> new_md5 THEN 'changed'
          |         ELSE 'unchanged' END AS status
          |  FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
          |SELECT doc_id, status, old_md5, new_md5 FROM j
          |WHERE status <> 'unchanged' ORDER BY doc_id""".stripMargin,

      // tar layout twin: same salted-hash shard, then pure 512-byte
      // block arithmetic under a per-shard running sum (strlen = UTF-8
      // octet length, matching Spark's octet_length)
      "export_tar" ->
        s"""WITH h AS (SELECT doc_id,
           |  CAST(strlen(coalesce(text, '')) AS BIGINT) AS n_bytes,
           |  md5(concat('', '|', CAST(doc_id AS VARCHAR))) AS m FROM documents),
           |e AS (SELECT doc_id, n_bytes,
           |  CAST(($hash32Sql) % 8 AS INT) AS shard FROM h),
           |b AS (SELECT shard, doc_id, n_bytes,
           |  1 + (n_bytes + 511) // 512 AS blocks FROM e)
           |SELECT shard, doc_id,
           |  concat(CAST(doc_id AS VARCHAR), '.txt') AS name, n_bytes,
           |  CAST(512 * coalesce(sum(blocks) OVER (PARTITION BY shard
           |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
           |    AND 1 PRECEDING), 0) AS BIGINT) AS offset
           |FROM b ORDER BY shard, doc_id""".stripMargin,

      "t_bpe_bytes_learn" -> byteBpeLearnSql(6),

      "t_bpe_bytes_apply" -> byteBpeApplySql(FixedByteBpeMerges),

      // collocation twins: exact-count score division; rank LIMIT is a
      // total order on distinct (a, b) so the cut is unambiguous
      "t_phrases" ->
        s"""WITH ${phrasesScoreCtes("documents", 5, 10)}
           |SELECT a, b, pair_cnt, cnt_a, cnt_b, score FROM ph_sc
           |ORDER BY score DESC, a, b LIMIT 50""".stripMargin,

      "t_phrases_apply" -> phrasesApplySql(8, 5, 10),

      // two-pass twin: pass 2's CTE chain (p2_*) reads pass 1's ph_f
      // through a MATERIALIZED cut — without it the 24 pass-2 scalar
      // subqueries each re-expand the whole pass-1 chain (itself 24
      // subqueries deep) and DuckDB OOMs on the plan
      "t_phrases_trigram" ->
        s"""WITH ${phrasesApplyCtes(8, 5, 10, "documents", "ph")},
           |pp_src AS MATERIALIZED (SELECT doc_id, text_phr AS text FROM ph_f),
           |${phrasesApplyCtes(8, 5, 10, "pp_src", "p2")}
           |SELECT doc_id, text_phr, CAST(len(t) AS BIGINT) AS n_tokens,
           |  CAST(len(t) - (CASE WHEN text_phr = '' THEN 0
           |    ELSE len(string_split(text_phr, ' ')) END) AS BIGINT) AS n_merges
           |FROM p2_f ORDER BY doc_id""".stripMargin,

      // GloVe co-occurrence twin: both directed entries per position
      // pair, VARCHAR-routed decimal sums (the Spark cast-parity rule)
      "t_cooc" ->
        s"""WITH ${coocCtes("documents", 5)}
           |SELECT a, b, x FROM co_x
           |ORDER BY x DESC, a, b LIMIT 100""".stripMargin,

      // PPMI twin (Levy & Goldberg 2014): marginals and the total are
      // the same decimal-routed sums; the score is single IEEE
      // multiply/divide steps into the libm-exact ln, clamped at 0
      "t_cooc_ppmi" ->
        s"""WITH ${coocCtes("documents", 5)},
           |co_ma AS (SELECT a, ${sparkDecSumToDouble("x")} AS xa
           |  FROM co_x GROUP BY a),
           |co_n AS (SELECT ${sparkDecSumToDouble("x")} AS n FROM co_x)
           |SELECT cx.a, cx.b, cx.x,
           |  greatest(CAST(0 AS DOUBLE),
           |    ln((cx.x * co_n.n) / (ma.xa * mb.xa))) AS ppmi
           |FROM co_x cx
           |JOIN co_ma ma ON cx.a = ma.a
           |JOIN co_ma mb ON cx.b = mb.a
           |CROSS JOIN co_n
           |ORDER BY ppmi DESC, cx.a, cx.b LIMIT 100""".stripMargin,

      // four-stage composition: each stage's parameterized oracle
      // feeds the next as a CTE — gate → line rules → global line
      // dedup → manifest, one statement
      "pipeline_line_curate" ->
        s"""WITH plc_gate AS (
           |  SELECT d.doc_id, d.text FROM documents d
           |  JOIN (${gopherRulesSql("documents")}) g USING (doc_id)
           |  WHERE g.gopher_pass),
           |plc_c4 AS (${c4CleanSql("plc_gate")}),
           |plc_docs AS (SELECT doc_id, text_clean FROM plc_c4
           |  WHERE NOT doc_dropped AND n_kept > 0),
           |plc_ln AS (SELECT doc_id, string_split(text_clean, chr(10)) AS ls
           |  FROM plc_docs),
           |plc_dd AS (${lineDedupCoreSql("plc_ln")}),
           |plc_out AS (SELECT doc_id, text_dedup FROM plc_dd WHERE n_kept > 0),
           |plc_sh AS (SELECT doc_id, text_dedup,
           |  CAST(($hash32Sql) % 4 AS INT) AS shard FROM (
           |    SELECT doc_id, text_dedup,
           |      md5(concat('', '|', CAST(doc_id AS VARCHAR))) AS m
           |    FROM plc_out) h),
           |plc_rh AS (SELECT shard, doc_id, length(text_dedup) AS nb,
           |  md5(concat(CAST(doc_id AS VARCHAR), '|', md5(text_dedup))) AS m
           |  FROM plc_sh)
           |SELECT shard, CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(sum(nb) AS BIGINT) AS total_bytes,
           |  min(doc_id) AS min_id, max(doc_id) AS max_id,
           |  CAST(sum($hash32Sql) AS BIGINT) AS content_sum
           |FROM plc_rh GROUP BY shard ORDER BY shard""".stripMargin,

      "pipeline_tokenize_pack" -> bpeWindowsSql(FixedBpeMerges, 1024L),

      // fifth-flagship twin: gate → span dedup (nested WITH wrapped as
      // a CTE body) → phrase learn+apply over the survivors → the same
      // manifest rollup as export_shards
      "pipeline_span_curate" ->
        s"""WITH psc_gate AS (
           |  SELECT d.doc_id, d.text FROM documents d
           |  JOIN (${gopherRulesSql("documents")}) g USING (doc_id)
           |  WHERE g.gopher_pass),
           |psc_dd AS (${spanDedupSql("psc_gate", 5)}),
           |psc_docs AS (SELECT doc_id, text_dedup AS text FROM psc_dd
           |  WHERE text_dedup <> ''),
           |${phrasesApplyCtes(5, 5, 10, "psc_docs")},
           |psc_sh AS (SELECT doc_id, text_phr,
           |  CAST(($hash32Sql) % 4 AS INT) AS shard FROM (
           |    SELECT doc_id, text_phr,
           |      md5(concat('', '|', CAST(doc_id AS VARCHAR))) AS m
           |    FROM ph_f) h),
           |psc_rh AS (SELECT shard, doc_id, length(text_phr) AS nb,
           |  md5(concat(CAST(doc_id AS VARCHAR), '|', md5(text_phr))) AS m
           |  FROM psc_sh)
           |SELECT shard, CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(sum(nb) AS BIGINT) AS total_bytes,
           |  min(doc_id) AS min_id, max(doc_id) AS max_id,
           |  CAST(sum($hash32Sql) AS BIGINT) AS content_sum
           |FROM psc_rh GROUP BY shard ORDER BY shard""".stripMargin,

      "b10_stream_hourly" ->
        s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS h,
           |event_type, count(*) AS n, ${decSum("value")} AS sum_value
           |FROM events GROUP BY 1, 2 ORDER BY h, event_type""".stripMargin,

      "b10_stream_join" ->
        """SELECT v.event_id AS view_id, c.event_id AS click_id, v.user_id,
          |  epoch_us(c.ts) - epoch_us(v.ts) AS lag_us
          |FROM events v JOIN events c
          |  ON v.user_id = c.user_id
          |  AND v.event_type = 'view' AND c.event_type = 'click'
          |  AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 3600 SECONDS
          |ORDER BY view_id, click_id""".stripMargin,

      "q_asof_enrich" ->
        """WITH o AS (
          |  SELECT o_custkey AS k, o_orderdate AS t, max(o_orderkey) AS o_orderkey,
          |    arg_max(o_totalprice, o_orderkey) AS o_totalprice
          |  FROM orders GROUP BY 1, 2)
          |SELECT e.event_id, e.user_id, o.o_orderkey, o.o_totalprice
          |FROM events e ASOF LEFT JOIN o ON e.user_id = o.k AND o.t <= e.ts
          |ORDER BY e.event_id""".stripMargin,

      "q_rollup" ->
        s"""SELECT l_returnflag, l_linestatus,
           |${decSum("l_quantity")} AS sum_qty, count(*) AS n
           |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
           |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

      "q_cube" ->
        s"""SELECT l_returnflag, l_linestatus,
           |${decSum("l_extendedprice")} AS sum_price, count(*) AS n
           |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
           |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

      "q_pivot" ->
        s"""SELECT l_returnflag,
           |${decSum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_f,
           |${decSum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_o
           |FROM lineitem GROUP BY l_returnflag
           |ORDER BY l_returnflag""".stripMargin,

      "q_unpivot" ->
        s"""WITH a AS (
           |  SELECT l_returnflag,
           |    ${decSum("l_quantity")} AS sum_qty,
           |    ${decSum("l_extendedprice")} AS sum_base_price,
           |    ${decSum("l_discount")} AS sum_disc
           |  FROM lineitem GROUP BY l_returnflag)
           |SELECT l_returnflag, 'sum_qty' AS measure, sum_qty AS value FROM a
           |UNION ALL
           |SELECT l_returnflag, 'sum_base_price' AS measure, sum_base_price AS value FROM a
           |UNION ALL
           |SELECT l_returnflag, 'sum_disc' AS measure, sum_disc AS value FROM a
           |ORDER BY l_returnflag, measure""".stripMargin,

      "q_null_agg" ->
        s"""WITH o AS (
           |  SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL
           |    ELSE o_orderpriority END AS prio_n, o_custkey, o_totalprice
           |  FROM orders)
           |SELECT coalesce(prio_n, '<none>') AS prio_out,
           |count(*) AS n_rows, count(prio_n) AS n_nonnull,
           |count(DISTINCT o_custkey) AS n_cust,
           |${decSum("o_totalprice")} AS sum_price
           |FROM o GROUP BY prio_n ORDER BY prio_out""".stripMargin,

      "q_setops" ->
        """SELECT doc_id, 'both' AS tag FROM (
          |  (SELECT doc_id FROM documents WHERE lang = 'en')
          |  INTERSECT
          |  (SELECT doc_id FROM documents WHERE source = 'src0')) t1
          |UNION ALL
          |SELECT doc_id, 'en_only' AS tag FROM (
          |  (SELECT doc_id FROM documents WHERE lang = 'en')
          |  EXCEPT
          |  (SELECT doc_id FROM documents WHERE source = 'src0')) t2
          |ORDER BY tag, doc_id""".stripMargin,

      "q_distinct" ->
        """SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
          |count(DISTINCT l_suppkey) AS n_supps
          |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

      // change points via null-safe lag inequality, then the dating
      // window over the filtered change stream only
      "q_scd2" ->
        """WITH m AS (
          |  SELECT user_id, event_type, event_id, epoch_us(ts) AS us,
          |    lag(event_type) OVER (PARTITION BY user_id
          |      ORDER BY epoch_us(ts) ASC, event_id ASC) AS prev
          |  FROM events),
          |c AS (
          |  SELECT user_id, event_type, event_id, us FROM m
          |  WHERE prev IS DISTINCT FROM event_type)
          |SELECT user_id, event_type, CAST(us AS BIGINT) AS valid_from_us,
          |  CAST(lead(us) OVER (PARTITION BY user_id
          |    ORDER BY us ASC, event_id ASC) AS BIGINT) AS valid_to_us,
          |  lead(us) OVER (PARTITION BY user_id
          |    ORDER BY us ASC, event_id ASC) IS NULL AS is_current
          |FROM c ORDER BY user_id, valid_from_us""".stripMargin,

      "q_kanon_suppress" ->
        """WITH g AS (
          |  SELECT lang, source, count(*) AS n_docs,
          |    CAST(sum(n_chars) AS BIGINT) AS char_mass
          |  FROM documents GROUP BY lang, source)
          |SELECT
          |  CASE WHEN n_docs >= 10 THEN lang ELSE '__other__' END AS lang,
          |  CASE WHEN n_docs >= 10 THEN source ELSE '__other__' END AS source,
          |  CAST(sum(n_docs) AS BIGINT) AS n_docs,
          |  CAST(sum(char_mass) AS BIGINT) AS char_mass,
          |  CAST(count(*) AS BIGINT) AS n_groups
          |FROM g GROUP BY 1, 2 ORDER BY lang, source""".stripMargin,

      "events_sessionize" ->
        s"""WITH m AS (
           |  SELECT user_id, event_id, value, epoch_us(ts) AS us,
           |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
           |      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > ${8L * 3600 * 1000000}
           |      THEN 1 ELSE 0 END AS new_s
           |  FROM events
           |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC)),
           |s AS (
           |  SELECT user_id, event_id, value, us,
           |    CAST(sum(new_s) OVER (PARTITION BY user_id
           |      ORDER BY us ASC, event_id ASC) AS BIGINT) AS session_id
           |  FROM m)
           |SELECT user_id, session_id, count(*) AS n_events,
           |  CAST(min(us) AS BIGINT) AS start_us, CAST(max(us) AS BIGINT) AS end_us,
           |  ${decSum("value")} AS sum_value
           |FROM s GROUP BY user_id, session_id
           |ORDER BY user_id, session_id""".stripMargin,

      "e_pca_power" -> pcaPowerSql(64, 6),

      // sampled twin: the hashUniform('pca' ‖ vec_id) < 0.25 filter is
      // the same UBIGINT md5-prefix expression the sampling oracles use
      "e_pca_power_sampled" -> pcaPowerSql(64, 6,
        """(SELECT * FROM embeddings
          |  WHERE CAST(concat('0x', left(md5(concat('pca', CAST(vec_id AS VARCHAR))), 8)) AS UBIGINT)
          |    / 4294967296.0 < 0.25)""".stripMargin),

      // the component CTEs run over the same md5 quarter-sample the
      // engine uses; the residual scan stays full-corpus
      "e_pca_residual" -> pcaResidualSql(64, 6, 10,
        """(SELECT * FROM embeddings
          |  WHERE CAST(concat('0x', left(md5(concat('pca', CAST(vec_id AS VARCHAR))), 8)) AS UBIGINT)
          |    / 4294967296.0 < 0.25)""".stripMargin),

      "e1_embed_oracle" -> embedOracleSql,

      "e2_embed_search" -> embedSearchSql,
      "pipeline_rag" -> ragSql,

      // per-lang aggregates + the gopher per-doc replay + exact
      // order-statistic length cutoffs, stitched on lang
      // the same window construction as the c4/window replays; pair
      // fan-out replayed as the window-keyed self-join
      "corpus_overlap" ->
        s"""WITH ww AS (${wordWindowLinesSql("documents", 4)}),
           |co_w0 AS (SELECT d.source, unnest(ww.ls) AS win
           |  FROM ww JOIN documents d USING (doc_id)),
           |co_w AS (SELECT DISTINCT source, win FROM co_w0),
           |co_p AS (SELECT a.source AS sa, b.source AS sb
           |  FROM co_w a JOIN co_w b ON a.win = b.win AND a.source < b.source),
           |co_c AS (SELECT sa, sb, CAST(count(*) AS BIGINT) AS n_shared
           |  FROM co_p GROUP BY 1, 2),
           |co_sz AS (SELECT source, CAST(count(*) AS BIGINT) AS nw
           |  FROM co_w GROUP BY source)
           |SELECT c.sa, c.sb, c.n_shared, za.nw AS na, zb.nw AS nb,
           |  CAST(c.n_shared AS DOUBLE)
           |    / CAST(za.nw + zb.nw - c.n_shared AS DOUBLE) AS jaccard
           |FROM co_c c JOIN co_sz za ON c.sa = za.source
           |JOIN co_sz zb ON c.sb = zb.source
           |ORDER BY sa, sb""".stripMargin,

      "pipeline_datacard" -> {
        import graft.functions.PiiFunctions.EmailRe
        s"""WITH gop AS (${gopherRulesSql("documents")}),
           |base AS (
           |  SELECT d.lang,
           |    CAST(count(*) AS BIGINT) AS n_docs,
           |    CAST(sum(d.n_chars) AS BIGINT) AS sum_chars,
           |    CAST(sum(len(string_split_regex(d.text, '\\s+'))) AS BIGINT) AS sum_tokens,
           |    CAST(count(*) - count(DISTINCT md5(d.text)) AS BIGINT) AS n_dup_docs,
           |    CAST(count(DISTINCT d.source) AS BIGINT) AS n_sources,
           |    CAST(sum(len(regexp_extract_all(d.text, '$EmailRe'))) AS BIGINT) AS n_pii_emails
           |  FROM documents d GROUP BY d.lang),
           |gp AS (
           |  SELECT d.lang,
           |    CAST(sum(CASE WHEN g.gopher_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_gopher_pass
           |  FROM documents d JOIN gop g ON d.doc_id = g.doc_id
           |  GROUP BY d.lang),
           |r AS (
           |  SELECT lang, n_chars,
           |    row_number() OVER (PARTITION BY lang ORDER BY CAST(n_chars AS DOUBLE)) AS rn,
           |    count(*) OVER (PARTITION BY lang) AS n
           |  FROM documents WHERE n_chars IS NOT NULL AND lang IS NOT NULL),
           |cuts AS (
           |  SELECT lang,
           |    max(CASE WHEN rn = greatest(1, CAST(ceil(CAST('0.5' AS DOUBLE) * n) AS BIGINT)) THEN CAST(n_chars AS DOUBLE) END) AS p50_chars,
           |    max(CASE WHEN rn = greatest(1, CAST(ceil(CAST('0.9' AS DOUBLE) * n) AS BIGINT)) THEN CAST(n_chars AS DOUBLE) END) AS p90_chars
           |  FROM r GROUP BY lang)
           |SELECT b.lang, b.n_docs, b.sum_chars, b.sum_tokens, b.n_dup_docs,
           |  gp.n_gopher_pass, b.n_sources, b.n_pii_emails,
           |  c.p50_chars, c.p90_chars
           |FROM base b JOIN gp ON b.lang = gp.lang
           |JOIN cuts c ON b.lang = c.lang
           |ORDER BY b.lang""".stripMargin
      },

      "e2_embed_search_norm" -> embedSearchNormSql,

      "mv_maxsim" -> maxsimSql,

      "mm_extract_features" -> mmFeaturesSql,

      "pipeline_mixture" ->
        """WITH c AS (SELECT lang, count(*) AS n FROM documents
          |  WHERE lang IS NOT NULL GROUP BY lang),
          |r AS (SELECT lang, n,
          |  CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS s0 FROM c),
          |r2 AS (SELECT lang, n,
          |  CASE WHEN (s0+1)*(s0+1) <= n THEN s0+1 ELSE s0 END AS s1 FROM r),
          |r3 AS (SELECT lang,
          |  CASE WHEN s1*s1 > n THEN s1-1 ELSE s1 END AS sq FROM r2),
          |q AS (SELECT lang,
          |  (sq * 300) // (SELECT sum(sq) FROM r3) AS quota FROM r3),
          |ranked AS (SELECT doc_id, lang, n_chars,
          |  row_number() OVER (PARTITION BY lang
          |    ORDER BY CAST(concat('0x', left(md5(CAST(doc_id AS VARCHAR)), 8)) AS UBIGINT),
          |      doc_id) AS rn
          |  FROM documents WHERE lang IS NOT NULL),
          |sel AS (SELECT doc_id, lang, n_chars
          |  FROM ranked JOIN q USING (lang) WHERE rn <= quota),
          |h AS (SELECT doc_id, lang, n_chars,
          |  CAST(concat('0x', left(md5(concat('up', CAST(doc_id AS VARCHAR))), 8))
          |    AS UBIGINT) / 4294967296.0 AS u
          |  FROM sel),
          |cp AS (SELECT doc_id, lang, n_chars,
          |  1 + (CASE WHEN u < (CASE lang WHEN 'en' THEN 0.0 ELSE 0.5 END)
          |    THEN 1 ELSE 0 END) AS copies
          |  FROM h)
          |SELECT lang, CAST(sum(copies) AS BIGINT) AS n_rows,
          |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
          |  CAST(sum(n_chars * copies) AS BIGINT) AS total_chars
          |FROM cp GROUP BY lang ORDER BY lang""".stripMargin,

      "pipeline_curate" -> curateSql,

      "t_tfidf" ->
        """WITH tok AS (
          |  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS word
          |  FROM documents),
          |tok2 AS (SELECT * FROM tok WHERE word <> ''),
          |tf AS (SELECT doc_id, word, count(*) AS tf FROM tok2 GROUP BY 1, 2),
          |dfreq AS (SELECT word, count(DISTINCT doc_id) AS df FROM tok2 GROUP BY 1),
          |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
          |s AS (
          |  SELECT tf.doc_id, tf.word, tf.tf,
          |    tf.tf * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) AS tfidf
          |  FROM tf JOIN dfreq ON tf.word = dfreq.word CROSS JOIN n),
          |r AS (
          |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
          |    ORDER BY tfidf DESC, word ASC) AS BIGINT) AS rank FROM s)
          |SELECT doc_id, word, tf, tfidf, rank FROM r
          |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

      // BM25 top-k — statistics are exact BIGINTs, the score chain is
      // generated from the same constants the engine folds with
      "t_bm25" ->
        s"""WITH $bm25OracleCtes
           |SELECT doc_id, score FROM bm25_scored
           |ORDER BY score DESC, doc_id ASC LIMIT 20""".stripMargin,

      // hybrid RRF fusion: both top-C cuts happen on bit-identical
      // scores, ranks are integers, and the fused score is two exact
      // reciprocal terms added in list order
      "hybrid_rrf" ->
        s"""${queryCte(QueryVecId)},
           |$bm25OracleCtes,
           |bm AS (SELECT doc_id, score FROM bm25_scored
           |  ORDER BY score DESC, doc_id ASC LIMIT $HybridC),
           |bmr AS (SELECT doc_id, CAST(row_number() OVER
           |  (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank_a FROM bm),
           |cos AS (SELECT e.vec_id AS doc_id,
           |    ${cosineSim("e.embedding", "q.qe")} AS score
           |  FROM embeddings e CROSS JOIN q
           |  WHERE ${norm("e.embedding")} > 0
           |  ORDER BY score DESC, doc_id ASC LIMIT $HybridC),
           |cosr AS (SELECT doc_id, CAST(row_number() OVER
           |  (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank_b FROM cos),
           |fused AS (SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
           |    COALESCE(1.0 / (${RrfK.toDouble} + CAST(a.rank_a AS DOUBLE)), 0.0) +
           |    COALESCE(1.0 / (${RrfK.toDouble} + CAST(b.rank_b AS DOUBLE)), 0.0)
           |    AS rrf_score,
           |    a.rank_a AS rank_a, b.rank_b AS rank_b
           |  FROM bmr a FULL OUTER JOIN cosr b ON a.doc_id = b.doc_id)
           |SELECT doc_id, rrf_score, rank_a, rank_b FROM fused
           |ORDER BY rrf_score DESC, doc_id ASC LIMIT 10""".stripMargin,

      // bigram-LM self-score: per-doc sequential fold over bigram
      // positions (list_reduce ≡ the engine's in-order aggregate fold);
      // DuckDB ln and the engine's LnDouble are both libm-exact
      // Stupid Backoff twin: three-tier CASE (trigram / α·bigram /
      // α²·add-one-unigram), every tier exact-count casts + one
      // division; same token-order list_reduce fold as t_lm_score
      "t_lm_backoff" ->
        """WITH sb_toks AS (
          |  SELECT doc_id,
          |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS l
          |  FROM documents),
          |sb_tok AS (
          |  SELECT doc_id, unnest(l) AS w, generate_subscripts(l, 1) AS pos
          |  FROM sb_toks),
          |sb_tg AS (
          |  SELECT a.doc_id, a.pos AS tpos, a.w AS w1, b.w AS w2, c.w AS w3
          |  FROM sb_tok a
          |  JOIN sb_tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
          |  JOIN sb_tok c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2),
          |sb_c3 AS (SELECT w1, w2, w3, count(*) AS c3 FROM sb_tg
          |  GROUP BY 1, 2, 3 HAVING count(*) >= 2),
          |sb_c2 AS (SELECT a.w AS w1, b.w AS w2, count(*) AS c2
          |  FROM sb_tok a JOIN sb_tok b
          |    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
          |  GROUP BY 1, 2),
          |sb_c1 AS (SELECT w, count(*) AS c1 FROM sb_tok GROUP BY 1),
          |sb_nv AS (SELECT CAST(sum(c1) AS BIGINT) AS n,
          |  CAST(count(*) AS BIGINT) AS v FROM sb_c1),
          |sb_sc AS (
          |  SELECT g.doc_id, g.tpos,
          |    ln(CASE
          |      WHEN coalesce(t.c3, 0) > 0
          |        THEN CAST(t.c3 AS DOUBLE) / CAST(p.c2 AS DOUBLE)
          |      WHEN coalesce(b23.c2, 0) > 0
          |        THEN CAST('0.4' AS DOUBLE)
          |          * (CAST(b23.c2 AS DOUBLE) / CAST(u2.c1 AS DOUBLE))
          |      ELSE CAST('0.4' AS DOUBLE) * CAST('0.4' AS DOUBLE)
          |          * (CAST(coalesce(u3.c1, 0) + 1 AS DOUBLE)
          |             / CAST(nv.n + nv.v AS DOUBLE)) END) AS lp
          |  FROM sb_tg g
          |  LEFT JOIN sb_c3 t ON g.w1 = t.w1 AND g.w2 = t.w2 AND g.w3 = t.w3
          |  LEFT JOIN sb_c2 p ON g.w1 = p.w1 AND g.w2 = p.w2
          |  LEFT JOIN sb_c2 b23 ON g.w2 = b23.w1 AND g.w3 = b23.w2
          |  LEFT JOIN sb_c1 u2 ON g.w2 = u2.w
          |  LEFT JOIN sb_c1 u3 ON g.w3 = u3.w
          |  CROSS JOIN sb_nv nv),
          |sb_agg AS (
          |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
          |    list_reduce(list_prepend(0.0, list(lp ORDER BY tpos)),
          |                (x, y) -> x + y) AS sum_logscore
          |  FROM sb_sc GROUP BY doc_id)
          |SELECT d.doc_id, coalesce(a.n_trigrams, 0) AS n_trigrams,
          |  a.sum_logscore,
          |  (-a.sum_logscore) / CAST(a.n_trigrams AS DOUBLE) AS lm_backoff
          |FROM documents d LEFT JOIN sb_agg a ON d.doc_id = a.doc_id
          |ORDER BY d.doc_id""".stripMargin,

      "t_lm_score" ->
        """WITH toks AS (
          |  SELECT doc_id,
          |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS l
          |  FROM documents),
          |tok AS (
          |  SELECT doc_id, unnest(l) AS w, generate_subscripts(l, 1) AS pos
          |  FROM toks),
          |bg AS (
          |  SELECT a.doc_id, a.pos AS bpos, a.w AS w1, b.w AS w2
          |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
          |bgc AS (SELECT w1, w2, count(*) AS cbg FROM bg GROUP BY 1, 2),
          |ugc AS (SELECT w AS w1, count(*) AS cw FROM tok GROUP BY 1),
          |v AS (SELECT count(*) AS vocab FROM ugc),
          |scored AS (
          |  SELECT g.doc_id, g.bpos,
          |    ln(CAST(coalesce(c.cbg, 0) + 1 AS DOUBLE) /
          |       CAST(coalesce(u.cw, 0) + v.vocab AS DOUBLE)) AS lp
          |  FROM bg g LEFT JOIN bgc c ON g.w1 = c.w1 AND g.w2 = c.w2
          |  LEFT JOIN ugc u ON g.w1 = u.w1 CROSS JOIN v),
          |agg AS (
          |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
          |    list_reduce(list_prepend(0.0, list(lp ORDER BY bpos)),
          |                (x, y) -> x + y) AS sum_logprob
          |  FROM scored GROUP BY doc_id)
          |SELECT d.doc_id, coalesce(a.n_bigrams, 0) AS n_bigrams,
          |  a.sum_logprob,
          |  (-a.sum_logprob) / CAST(a.n_bigrams AS DOUBLE) AS lm_score
          |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
          |ORDER BY d.doc_id""".stripMargin,

      // Same bigram-LM CTE chain as t_lm_score, then per-language EXACT
      // tercile cutoffs by row_number order statistic (the value at rank
      // max(1, ceil(p*n)) IS an input element — no interpolation to
      // match) and the head/middle/tail CASE; terciles as CAST(k AS
      // DOUBLE)/3 so both engines bucket on the identical IEEE double
      "t_ccnet_buckets" ->
        """WITH toks AS (
          |  SELECT doc_id,
          |    list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS l
          |  FROM documents),
          |tok AS (
          |  SELECT doc_id, unnest(l) AS w, generate_subscripts(l, 1) AS pos
          |  FROM toks),
          |bg AS (
          |  SELECT a.doc_id, a.pos AS bpos, a.w AS w1, b.w AS w2
          |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
          |bgc AS (SELECT w1, w2, count(*) AS cbg FROM bg GROUP BY 1, 2),
          |ugc AS (SELECT w AS w1, count(*) AS cw FROM tok GROUP BY 1),
          |v AS (SELECT count(*) AS vocab FROM ugc),
          |lp AS (
          |  SELECT g.doc_id, g.bpos,
          |    ln(CAST(coalesce(c.cbg, 0) + 1 AS DOUBLE) /
          |       CAST(coalesce(u.cw, 0) + v.vocab AS DOUBLE)) AS lp
          |  FROM bg g LEFT JOIN bgc c ON g.w1 = c.w1 AND g.w2 = c.w2
          |  LEFT JOIN ugc u ON g.w1 = u.w1 CROSS JOIN v),
          |agg AS (
          |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
          |    list_reduce(list_prepend(0.0, list(lp ORDER BY bpos)),
          |                (x, y) -> x + y) AS sum_logprob
          |  FROM lp GROUP BY doc_id),
          |sc AS (
          |  SELECT d.doc_id, d.lang, coalesce(a.n_bigrams, 0) AS n_bigrams,
          |    (-a.sum_logprob) / CAST(a.n_bigrams AS DOUBLE) AS lm_score
          |  FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id),
          |r AS (
          |  SELECT lang, lm_score,
          |    row_number() OVER (PARTITION BY lang ORDER BY lm_score) AS rn,
          |    count(*) OVER (PARTITION BY lang) AS n
          |  FROM sc WHERE lm_score IS NOT NULL AND lang IS NOT NULL),
          |cuts AS (
          |  SELECT lang,
          |    max(CASE WHEN rn = greatest(1, CAST(ceil(CAST(1 AS DOUBLE) / 3 * n) AS BIGINT)) THEN lm_score END) AS c0,
          |    max(CASE WHEN rn = greatest(1, CAST(ceil(CAST(2 AS DOUBLE) / 3 * n) AS BIGINT)) THEN lm_score END) AS c1
          |  FROM r GROUP BY lang)
          |SELECT sc.doc_id, sc.lang, sc.n_bigrams, sc.lm_score,
          |  CASE WHEN sc.lm_score IS NULL OR c.c0 IS NULL THEN 'unscored'
          |       WHEN sc.lm_score <= c.c0 THEN 'head'
          |       WHEN sc.lm_score <= c.c1 THEN 'middle'
          |       ELSE 'tail' END AS ppl_bucket
          |FROM sc LEFT JOIN cuts c ON sc.lang = c.lang
          |ORDER BY sc.doc_id""".stripMargin,

      // identical planted decomposed literal; nfc_normalize is utf8proc's
      // implementation of the same normative Unicode algorithm as the
      // JDK kernel — byte-for-byte agreement is the check
      "t_normalize" ->
        """WITH d AS (
          |  SELECT doc_id, replace(text, ' merge ', ' café ﬁle merge ') AS t2 FROM documents)
          |SELECT doc_id,
          |  CAST(length(t2) AS BIGINT) AS len_raw,
          |  CAST(length(nfc_normalize(t2)) AS BIGINT) AS len_nfc,
          |  md5(nfc_normalize(t2)) AS nfc_md5
          |FROM d ORDER BY doc_id""".stripMargin,

      // identical twin construction, identical RE2∩Java regex chain
      // (the operator deliberately avoids backreferences and \s so
      // this replay is verbatim)
      "t_html_strip" ->
        s"""WITH h AS (
           |  SELECT doc_id,
           |    '<html><head><title>doc ' || CAST(doc_id AS VARCHAR) || ' (' || source ||
           |    ')</title><style type="text/css">p{margin:0}</style></head><body><h1 class="t">' || source ||
           |    '</h1><!-- lang=' || lang || ' --><script>var n=' || CAST(n_chars AS VARCHAR) ||
           |    ';</script><p>' ||
           |    replace(replace(replace(text, ' a ', ' &amp; '), ' the ', ' &quot;the&quot; '), ' fast ', '&nbsp;fast&nbsp;') ||
           |    '</p></body></html>' AS html
           |  FROM documents)
           |SELECT doc_id,
           |  ${htmlStripSql("regexp_extract(html, '(?si)<title[^>]*>(.*?)</title>', 1)")} AS title,
           |  ${htmlStripSql("html")} AS clean
           |FROM h ORDER BY doc_id""".stripMargin,

      "t_quantiles" ->
        """SELECT lang,
          |quantile_cont(n_chars, 0.25) AS p25,
          |quantile_cont(n_chars, 0.5) AS p50,
          |quantile_cont(n_chars, 0.75) AS p75,
          |count(*) AS n
          |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

      // MAD twin: the same two-phase exact interpolated medians
      "q_mad" ->
        """WITH md AS (
          |  SELECT lang, quantile_cont(n_chars, 0.5) AS med
          |  FROM documents GROUP BY lang)
          |SELECT d.lang,
          |  quantile_cont(abs(d.n_chars - md.med), 0.5) AS mad,
          |  count(*) AS n
          |FROM documents d JOIN md ON d.lang = md.lang
          |GROUP BY d.lang ORDER BY d.lang""".stripMargin,

      // PCM8 samples are text bytes (ASCII ⇒ ord = byte) centered at
      // 128; duration floors twice like WavMeta.durationMs
      "mm_wav_decode" ->
        """WITH ch AS (
          |  SELECT doc_id, ord(substr(text, CAST(i AS INT), 1)) AS c
          |  FROM documents, unnest(range(1, length(text) + 1)) AS t(i)),
          |agg AS (
          |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_samples,
          |    CAST(sum((c - 128) * (c - 128)) AS BIGINT) AS sum_sq
          |  FROM ch GROUP BY doc_id)
          |SELECT d.doc_id, CAST(8000 AS BIGINT) AS sample_rate,
          |  coalesce(a.n_samples, 0) AS n_samples,
          |  CAST(coalesce(a.n_samples, 0) * 1000 // 8000 AS BIGINT) AS duration_ms,
          |  coalesce(a.sum_sq, 0) AS sum_sq,
          |  CASE WHEN coalesce(a.n_samples, 0) = 0 THEN 0.0
          |       ELSE sqrt(CAST(a.sum_sq AS DOUBLE) / CAST(a.n_samples AS DOUBLE))
          |  END AS rms
          |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
          |ORDER BY d.doc_id""".stripMargin,

      // VAD twin: frames of 32 samples from ord(char)−128, integer
      // Σs² > thr·n verdict, trim window = [first, last] voiced frames
      "mm_audio_vad" ->
        """WITH av_ch AS (
          |  SELECT doc_id, CAST(i AS BIGINT) AS i,
          |    (CAST(i AS BIGINT) - 1) // 32 AS f,
          |    CAST(ord(substr(text, CAST(i AS INT), 1)) - 128 AS BIGINT) AS c
          |  FROM documents, unnest(range(1, length(text) + 1)) AS t(i)),
          |av_fr AS (
          |  SELECT doc_id, f, sum(c * c) AS ss, count(*) AS n
          |  FROM av_ch GROUP BY doc_id, f),
          |av_v AS (
          |  SELECT doc_id,
          |    min(f) FILTER (WHERE ss > 2000 * n) AS fv,
          |    max(f) FILTER (WHERE ss > 2000 * n) AS lv,
          |    CAST(count(*) FILTER (WHERE ss > 2000 * n) AS BIGINT) AS n_voiced,
          |    CAST(count(*) AS BIGINT) AS n_frames
          |  FROM av_fr GROUP BY doc_id),
          |av_k AS (
          |  SELECT c.doc_id, CAST(count(*) AS BIGINT) AS kept_samples,
          |    CAST(sum(c.c * c.c) AS BIGINT) AS kept_sum_sq
          |  FROM av_ch c JOIN av_v v ON c.doc_id = v.doc_id
          |  WHERE v.fv IS NOT NULL AND c.f BETWEEN v.fv AND v.lv
          |  GROUP BY c.doc_id)
          |SELECT d.doc_id,
          |  CAST(coalesce(v.n_frames, 0) AS BIGINT) AS n_frames,
          |  CAST(coalesce(v.n_voiced, 0) AS BIGINT) AS n_voiced,
          |  CAST(coalesce(v.fv, -1) AS BIGINT) AS first_voiced,
          |  CAST(coalesce(v.lv, -1) AS BIGINT) AS last_voiced,
          |  CAST(coalesce(k.kept_samples, 0) AS BIGINT) AS kept_samples,
          |  CAST(coalesce(k.kept_sum_sq, 0) AS BIGINT) AS kept_sum_sq,
          |  CAST(coalesce(k.kept_samples, 0) * 1000 // 8000 AS BIGINT) AS kept_ms
          |FROM documents d LEFT JOIN av_v v USING (doc_id)
          |LEFT JOIN av_k k USING (doc_id)
          |ORDER BY doc_id""".stripMargin,

      // closed-form recomputation of the block-constant grayscale
      // fixture: pixel (x, y) of doc d holds gray value
      // (d·31 + (x÷8)·7 + (y÷8)·13) mod 256, and the q=1.0 JPEG
      // round-trip is bit-exact (MultimodalSpec), so lum_sum = 3·Σv and
      // mean_channel = lum_sum / (3·w·h) match the decoded stats exactly
      // quality-metric twin: closed-form luminance field of the
      // block-gray fixture; the Laplacian term re-evaluates the formula
      // at the four neighbors, so decoded neighborhoods are checked
      "mm_image_quality" -> {
        def f(a: String, b: String) =
          s"3 * ((doc_id * 31 + (($a) // 8) * 7 + (($b) // 8) * 13) % 256)"
        s"""WITH iq_dims AS (
           |  SELECT doc_id, 24 + doc_id % 41 AS w, 16 + doc_id % 29 AS h
           |  FROM documents),
           |iq_sum AS (
           |  SELECT doc_id, CAST(sum(${f("x", "y")}) AS BIGINT) AS lum_sum,
           |    CAST(sum((${f("x", "y")}) * (${f("x", "y")})) AS BIGINT)
           |      AS lum_sq_sum,
           |    CAST(count(*) AS BIGINT) AS n_px
           |  FROM iq_dims,
           |    unnest(generate_series(0, w - 1)) AS tx(x),
           |    unnest(generate_series(0, h - 1)) AS ty(y)
           |  GROUP BY doc_id),
           |iq_lap AS (
           |  SELECT doc_id,
           |    CAST(sum(abs(4 * (${f("x", "y")}) - (${f("x - 1", "y")})
           |      - (${f("x + 1", "y")}) - (${f("x", "y - 1")})
           |      - (${f("x", "y + 1")}))) AS BIGINT) AS lap_sum,
           |    CAST(count(*) AS BIGINT) AS n_interior
           |  FROM iq_dims,
           |    unnest(generate_series(1, w - 2)) AS tx(x),
           |    unnest(generate_series(1, h - 2)) AS ty(y)
           |  GROUP BY doc_id)
           |SELECT d.doc_id, CAST(d.w AS BIGINT) AS w, CAST(d.h AS BIGINT) AS h,
           |  s.n_px, s.lum_sum, s.lum_sq_sum, l.lap_sum, l.n_interior
           |FROM iq_dims d JOIN iq_sum s USING (doc_id)
           |JOIN iq_lap l USING (doc_id)
           |ORDER BY d.doc_id""".stripMargin
      },

      "mm_jpeg_decode" ->
        """WITH dims AS (
          |  SELECT doc_id, 24 + doc_id % 41 AS w, 16 + doc_id % 29 AS h
          |  FROM documents),
          |px AS (
          |  SELECT doc_id, w, h,
          |    (doc_id * 31 + (x // 8) * 7 + (y // 8) * 13) % 256 AS v
          |  FROM dims,
          |    unnest(generate_series(0, w - 1)) AS tx(x),
          |    unnest(generate_series(0, h - 1)) AS ty(y)),
          |agg AS (
          |  SELECT doc_id, CAST(3 * sum(v) AS BIGINT) AS lum_sum,
          |    CAST(count(*) AS BIGINT) AS n
          |  FROM px GROUP BY doc_id)
          |SELECT d.doc_id,
          |  CAST(m.w AS BIGINT) AS width, CAST(m.h AS BIGINT) AS height,
          |  a.lum_sum,
          |  CAST(a.lum_sum AS DOUBLE) / CAST(3 * a.n AS DOUBLE) AS mean_channel
          |FROM documents d
          |JOIN dims m ON d.doc_id = m.doc_id
          |JOIN agg a ON d.doc_id = a.doc_id
          |ORDER BY d.doc_id""".stripMargin,

      // closed-form recomputation of the full-color PNG fixture: PNG is
      // lossless, so the decoded channels equal the generator formulas
      // exactly — lum_sum = Σ(r+g+b) over the w×h grid
      "mm_png_decode" ->
        s"""WITH dims AS (
          |  SELECT doc_id, 20 + doc_id % 37 AS w, 14 + doc_id % 23 AS h
          |  FROM documents),
          |px AS (
          |  SELECT doc_id, w, h,
          |    ${pngChannelSumSql("x", "y")} AS v
          |  FROM dims,
          |    unnest(generate_series(0, w - 1)) AS tx(x),
          |    unnest(generate_series(0, h - 1)) AS ty(y)),
          |agg AS (
          |  SELECT doc_id, CAST(sum(v) AS BIGINT) AS lum_sum,
          |    CAST(count(*) AS BIGINT) AS n
          |  FROM px GROUP BY doc_id)
          |SELECT d.doc_id,
          |  CAST(m.w AS BIGINT) AS width, CAST(m.h AS BIGINT) AS height,
          |  a.lum_sum,
          |  CAST(a.lum_sum AS DOUBLE) / CAST(3 * a.n AS DOUBLE) AS mean_channel
          |FROM documents d
          |JOIN dims m ON d.doc_id = m.doc_id
          |JOIN agg a ON d.doc_id = a.doc_id
          |ORDER BY d.doc_id""".stripMargin,

      // nearest-neighbor resample replay: destination pixel (x, y) of
      // the 16×12 thumbnail reads source pixel (x*w//16, y*h//12); the
      // channel formulas evaluate at those source coordinates
      "mm_resize" ->
        s"""WITH dims AS (
          |  SELECT doc_id, 20 + doc_id % 37 AS w, 14 + doc_id % 23 AS h
          |  FROM documents),
          |px AS (
          |  SELECT doc_id,
          |    ${pngChannelSumSql("x * w // 16", "y * h // 12")} AS v
          |  FROM dims,
          |    unnest(generate_series(0, 15)) AS tx(x),
          |    unnest(generate_series(0, 11)) AS ty(y)),
          |agg AS (
          |  SELECT doc_id, CAST(sum(v) AS BIGINT) AS lum_sum
          |  FROM px GROUP BY doc_id)
          |SELECT d.doc_id,
          |  CAST(16 AS BIGINT) AS width, CAST(12 AS BIGINT) AS height,
          |  a.lum_sum,
          |  CAST(a.lum_sum AS DOUBLE) / CAST(3 * 16 * 12 AS DOUBLE) AS mean_channel
          |FROM documents d
          |JOIN agg a ON d.doc_id = a.doc_id
          |ORDER BY d.doc_id""".stripMargin,

      // full perceptual-hash replay: fixture formulas → 9×7 nearest
      // resample → horizontal gradient bits → exact BIGINT assembly
      "mm_dhash" ->
        s"""WITH $dhashOracleCtes
          |SELECT doc_id, dhash FROM hashes ORDER BY doc_id""".stripMargin,

      // the oracle does the honest all-pairs join (fine at oracle
      // scale); the engine's banded screen must recover the identical
      // pair set — completeness of the pigeonhole banding is what's
      // being checked, on top of the hash arithmetic itself
      "dedup_image_neardup" ->
        s"""WITH $dhashOracleCtes
          |SELECT ha.doc_id AS a, hb.doc_id AS b,
          |  CAST(bit_count(xor(ha.dhash, hb.dhash)) AS BIGINT) AS hamming
          |FROM hashes ha JOIN hashes hb ON ha.doc_id < hb.doc_id
          |WHERE bit_count(xor(ha.dhash, hb.dhash)) <= 3
          |ORDER BY a, b""".stripMargin,

      // cross-side pairs only: batch side doc_id ≡ 0 (mod 7), corpus
      // side the rest, same fixture hashes
      "dedup_image_incremental" ->
        s"""WITH $dhashOracleCtes
          |SELECT n.doc_id AS new_id, o.doc_id AS old_id,
          |  CAST(bit_count(xor(n.dhash, o.dhash)) AS BIGINT) AS hamming
          |FROM hashes n JOIN hashes o
          |  ON n.doc_id % 7 = 0 AND o.doc_id % 7 <> 0
          |WHERE bit_count(xor(n.dhash, o.dhash)) <= 3
          |ORDER BY new_id, old_id""".stripMargin,

      // closed-form replay of the CBR fixture: kbps from the MPEG-1
      // Layer III table at index 1+id%14, frame bytes 144·kbps·1000//44100,
      // 1152 samples/frame, duration floored integer ms
      "mm_mp3_frames" ->
        """WITH m AS (
          |  SELECT doc_id, 3 + doc_id % 9 AS nf,
          |    ([32,40,48,56,64,80,96,112,128,160,192,224,256,320])
          |      [CAST(1 + doc_id % 14 AS INT)] AS kbps
          |  FROM documents)
          |SELECT doc_id, CAST(nf AS BIGINT) AS n_frames,
          |  CAST(kbps AS BIGINT) AS bitrate_kbps,
          |  CAST(nf * 1152 AS BIGINT) AS n_samples,
          |  CAST(nf * 1152 * 1000 // 44100 AS BIGINT) AS duration_ms,
          |  CAST(nf * (144 * kbps * 1000 // 44100) AS BIGINT) AS total_bytes
          |FROM m ORDER BY doc_id""".stripMargin,

      // NAL census of the SPS+PPS+GOP fixture: gops IDR units, one
      // non-IDR per remaining slice slot, 2 parameter sets
      "mm_h264_nals" ->
        """WITH m AS (
          |  SELECT doc_id, 1 + doc_id % 5 AS gops, 2 + doc_id % 4 AS gl
          |  FROM documents)
          |SELECT doc_id,
          |  CAST(2 + gops * gl AS BIGINT) AS n_nals,
          |  CAST(gops AS BIGINT) AS n_idr,
          |  CAST(gops * (gl - 1) AS BIGINT) AS n_nonidr,
          |  CAST(1 AS BIGINT) AS n_sps, CAST(1 AS BIGINT) AS n_pps
          |FROM m ORDER BY doc_id""".stripMargin,

      "mm_frame_sample" ->
        """SELECT doc_id, CAST(off // 64 AS BIGINT) AS frame_no,
          |CAST(off AS BIGINT) AS byte_offset
          |FROM (SELECT doc_id, unnest(generate_series(0, length(text)-1, 64)) AS off
          |FROM documents) t ORDER BY doc_id, frame_no""".stripMargin,

      "t_pii" -> {
        import graft.functions.PiiFunctions.{EmailRe, PhoneRe, Ipv4Re}
        s"""WITH salted AS (SELECT doc_id,
           |  concat(text, ' contact user', CAST(doc_id AS VARCHAR),
           |    '@example.com or +1-555-',
           |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
           |    ' from 10.', CAST(doc_id % 256 AS VARCHAR), '.0.1') AS t
           |  FROM documents)
           |SELECT doc_id,
           |  CAST(len(regexp_extract_all(t, '$EmailRe')) AS BIGINT) AS n_emails,
           |  CAST(len(regexp_extract_all(t, '$PhoneRe')) AS BIGINT) AS n_phones,
           |  CAST(len(regexp_extract_all(t, '$Ipv4Re')) AS BIGINT) AS n_ipv4,
           |  md5(regexp_replace(regexp_replace(regexp_replace(t,
           |    '$EmailRe', '[EMAIL]', 'g'),
           |    '$PhoneRe', '[PHONE]', 'g'),
           |    '$Ipv4Re', '[IP]', 'g')) AS redacted_md5
           |FROM salted ORDER BY doc_id""".stripMargin
      },

      // same gram CTE as dedup_ngram_jaccard, restricted to the
      // benchmark slice on one side and the corpus on the other
      "contamination" ->
        """WITH toks AS (
          |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS ts FROM documents),
          |grams AS (
          |  SELECT doc_id, unnest(list_distinct(list_transform(
          |    generate_series(1, greatest(len(ts)-2, 1)),
          |    i -> concat_ws(' ', ts[i], ts[i+1], ts[i+2])))) AS g FROM toks),
          |bg AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0)
          |SELECT doc_id, count(*) AS n_shared
          |FROM grams JOIN bg USING (g) WHERE doc_id % 50 <> 0
          |GROUP BY 1 HAVING count(*) >= 2 ORDER BY doc_id""".stripMargin,

      "bloom_blocklist" ->
        """SELECT d.doc_id, d.source FROM documents d
          |WHERE NOT EXISTS (
          |  SELECT 1 FROM documents b
          |  WHERE b.doc_id % 7 = 0 AND md5(b.text) = md5(d.text))
          |ORDER BY doc_id""".stripMargin,

      "chunk_docs" ->
        """WITH toks AS (
          |  SELECT doc_id, list_filter(string_split_regex(text, '\s+'),
          |    x -> x <> '') AS ts FROM documents),
          |nc AS (SELECT doc_id, ts,
          |  greatest(1, CAST(ceil((len(ts) - 16) / 48.0) AS BIGINT)) AS n FROM toks),
          |ch AS (SELECT doc_id, ts,
          |  unnest(generate_series(1, n)) - 1 AS chunk_id FROM nc)
          |SELECT doc_id, chunk_id,
          |  md5(array_to_string(list_slice(ts, chunk_id*48 + 1, chunk_id*48 + 64), ' ')) AS chunk_md5,
          |  CAST(len(list_slice(ts, chunk_id*48 + 1, chunk_id*48 + 64)) AS BIGINT) AS n_chunk_tokens
          |FROM ch ORDER BY doc_id, chunk_id""".stripMargin,

      // sentence segmentation (RE2-class alternation, both engines),
      // capacity-binned cumsum, dense_rank chunk ids, ordered rejoin
      "chunk_sentences" ->
        """WITH d AS (
          |  SELECT doc_id, replace(text, ' merge ', ' merge. ') AS text
          |  FROM documents),
          |sents AS (
          |  SELECT doc_id,
          |    generate_subscripts(ss, 1) - 1 AS sidx, unnest(ss) AS sent
          |  FROM (SELECT doc_id,
          |    regexp_extract_all(text, '[^.!?]+[.!?]*\s*|[.!?]+\s*') AS ss
          |  FROM d)),
          |tk AS (
          |  SELECT doc_id, sidx, sent,
          |    CAST(len(list_filter(string_split_regex(sent, '\s+'),
          |      x -> x <> '')) AS BIGINT) AS ntok
          |  FROM sents),
          |cm AS (
          |  SELECT doc_id, sidx, sent, ntok,
          |    coalesce(sum(ntok) OVER (PARTITION BY doc_id ORDER BY sidx
          |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
          |  FROM tk),
          |bn AS (
          |  SELECT doc_id, sidx, sent, ntok, cum // 48 AS bin FROM cm),
          |ck AS (
          |  SELECT doc_id, sidx, sent, ntok,
          |    CAST(dense_rank() OVER (PARTITION BY doc_id ORDER BY bin) - 1
          |      AS BIGINT) AS chunk_id
          |  FROM bn)
          |SELECT doc_id, chunk_id,
          |  CAST(count(*) AS BIGINT) AS n_sentences,
          |  CAST(sum(ntok) AS BIGINT) AS n_chunk_tokens,
          |  md5(string_agg(sent, '' ORDER BY sidx)) AS chunk_md5
          |FROM ck GROUP BY doc_id, chunk_id
          |ORDER BY doc_id, chunk_id""".stripMargin,

      "pack_offsets" ->
        """WITH toks AS (SELECT doc_id,
          |  CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tok FROM documents),
          |c AS (SELECT doc_id, n_tok,
          |  COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum FROM toks)
          |SELECT doc_id, n_tok,
          |  CAST(cum // 2048 AS BIGINT) AS pack_id,
          |  CAST(cum % 2048 AS BIGINT) AS pack_offset
          |FROM c ORDER BY doc_id""".stripMargin,

      // curriculum replay: stage CASE + the 40-term bit-reversal sum
      // (integer shifts are exact on both engines), then the same
      // running-sum pack replay ordered by the composite key
      "pipeline_curriculum" -> {
        val rev = (0 until 40).map(i =>
          s"(((doc_id >> $i) & 1) << ${39 - i})").mkString(" + ")
        s"""WITH toks AS (SELECT doc_id,
           |  CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tok
           |  FROM documents),
           |k AS (SELECT doc_id, n_tok,
           |  CAST(CASE WHEN n_tok < 40 THEN 0 WHEN n_tok < 80 THEN 1
           |    ELSE 2 END AS BIGINT) AS stage,
           |  CAST($rev AS BIGINT) AS rev FROM toks),
           |o AS (SELECT doc_id, n_tok, stage,
           |  stage * 1099511627776 + rev AS ord FROM k),
           |c AS (SELECT doc_id, stage, ord,
           |  COALESCE(SUM(n_tok) OVER (ORDER BY ord
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
           |  FROM o)
           |SELECT doc_id, stage, ord,
           |  CAST(cum // 2048 AS BIGINT) AS pack_id,
           |  CAST(cum % 2048 AS BIGINT) AS pack_offset
           |FROM c ORDER BY doc_id""".stripMargin
      },

      // window overlap replay: doc spans [cum, cum+n_tok) of the token
      // stream; generate_series enumerates the windows it crosses and
      // the slice arithmetic is pure greatest/least algebra
      "pack_windows" ->
        """WITH toks AS (SELECT doc_id,
          |  CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tok FROM documents),
          |c AS (SELECT doc_id, n_tok,
          |  CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
          |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
          |    AS cum FROM toks),
          |w AS (SELECT doc_id, n_tok, cum,
          |  unnest(generate_series(cum // 2048, (cum + n_tok - 1) // 2048)) AS win_id
          |  FROM c WHERE n_tok > 0)
          |SELECT doc_id, n_tok, win_id,
          |  CAST(greatest(0, cum - win_id * 2048) AS BIGINT) AS win_offset,
          |  CAST(greatest(0, win_id * 2048 - cum) AS BIGINT) AS slice_start,
          |  CAST(least(cum + n_tok, (win_id + 1) * 2048)
          |    - greatest(cum, win_id * 2048) AS BIGINT) AS slice_len
          |FROM w ORDER BY doc_id, win_id""".stripMargin,

      // SQ8: training (exact min/max) + encode + ADC are ALL in-SQL —
      // no fixed-model twin needed
      "o6_sq8_encode" ->
        s"""WITH $sqOracleCtes
           |SELECT vec_id, array_to_string(code, '-') AS code
           |FROM sq_enc ORDER BY vec_id""".stripMargin,

      "o6_sq8_adc_topk" -> {
        val terms = (1 to OracleSql.Dim).map { i =>
          val dec = s"(mns[$i] + CAST(code[$i] AS DOUBLE) / 255.0 * dfs[$i])"
          val d = s"(CAST(q.qe[$i] AS DOUBLE) - $dec)"
          s"$d * $d"
        }
        s"""${queryCte(QueryVecId)},
           |$sqOracleCtes
           |SELECT vec_id,
           |  sqrt(${("0.0" +: terms).mkString(" + ")}) AS dist
           |FROM sq_enc CROSS JOIN sq_arr CROSS JOIN q
           |ORDER BY dist ASC, vec_id ASC LIMIT 10""".stripMargin
      },

      // BQ: sign-bit pack + Hamming are integer arithmetic — fully
      // in-SQL, no model object on either side
      "o6_bq_encode" ->
        s"""SELECT vec_id,
           |  array_to_string(${bqCode("embedding")}, '-') AS code
           |FROM embeddings ORDER BY vec_id""".stripMargin,

      "o6_bq_hamming" ->
        s"""$cte SELECT e.vec_id AS vec_id, ${bqHamming("e.embedding", "q.qe")} AS ham
           |FROM embeddings e CROSS JOIN q
           |ORDER BY ham ASC, vec_id ASC LIMIT 10""".stripMargin,

      "o6_bq_rerank" ->
        s"""$cte,
           |bqh AS (
           |  SELECT e.vec_id AS vec_id, e.embedding AS embedding, q.qe AS qe,
           |    ${bqHamming("e.embedding", "q.qe")} AS ham
           |  FROM embeddings e CROSS JOIN q
           |  ORDER BY ham ASC, vec_id ASC LIMIT 30)
           |SELECT vec_id, ${l2("embedding", "qe")} AS dist
           |FROM bqh ORDER BY dist ASC, vec_id ASC LIMIT 10""".stripMargin,

      "o7_bq_filtered" ->
        s"""$cte,
           |bqh AS (
           |  SELECT e.vec_id AS vec_id, CAST(e.label AS BIGINT) AS label,
           |    e.embedding AS embedding, q.qe AS qe,
           |    ${bqHamming("e.embedding", "q.qe")} AS ham
           |  FROM embeddings e CROSS JOIN q WHERE e.label = 3
           |  ORDER BY ham ASC, vec_id ASC LIMIT 30)
           |SELECT vec_id, label, ${l2("embedding", "qe")} AS dist
           |FROM bqh ORDER BY dist ASC, vec_id ASC LIMIT 10""".stripMargin,

      // centered BQ: the +5 shift replays as an exact double sum cast
      // back to float (≡ float add); threshold training is the same
      // order-free min/max stats pass as sq8's grid; the thresholded
      // CASE-weight words mirror SignPackFloat's double comparison
      "o6_bq_centered" ->
        s"""WITH se AS (
           |  SELECT vec_id, list_transform(embedding,
           |    v -> CAST(CAST(v AS DOUBLE) + 5.0 AS FLOAT)) AS emb
           |  FROM embeddings),
           |bq_stats AS (
           |  SELECT i, (CAST(min(v) AS DOUBLE) + CAST(max(v) AS DOUBLE))
           |    / 2.0 AS t
           |  FROM (SELECT unnest(emb) AS v,
           |        generate_subscripts(emb, 1) AS i FROM se)
           |  GROUP BY i),
           |bq_ts AS (SELECT list(t ORDER BY i) AS ts FROM bq_stats),
           |q AS (SELECT emb AS qe FROM se WHERE vec_id = $QueryVecId),
           |bqh AS (
           |  SELECT se.vec_id AS vec_id, se.emb AS embedding, q.qe AS qe,
           |    ${OracleSql.bqHammingThresh("se.emb", "q.qe", "ts")} AS ham
           |  FROM se CROSS JOIN q CROSS JOIN bq_ts
           |  ORDER BY ham ASC, vec_id ASC LIMIT 30)
           |SELECT vec_id, ${l2("embedding", "qe")} AS dist
           |FROM bqh ORDER BY dist ASC, vec_id ASC LIMIT 10""".stripMargin,

      "b9_pq_encode_fixed" -> {
        val codes = (0 until 8).map(c => s"(${pqCodeSql(c)})")
        s"""SELECT vec_id, concat_ws('-', ${codes.mkString(", ")}) AS code
           |FROM embeddings ORDER BY vec_id""".stripMargin
      },

      "o6_pq_adc_fixed" -> {
        val encCols = (0 until 8).map(c => s"(${pqCodeSql(c)}) AS c$c").mkString(", ")
        val terms = (0 until 8).map { c =>
          s"""(CASE c$c WHEN 0 THEN (${adcTableSql(c, 0)})
             |WHEN 1 THEN (${adcTableSql(c, 1)})
             |WHEN 2 THEN (${adcTableSql(c, 2)})
             |ELSE (${adcTableSql(c, 3)}) END)""".stripMargin
        }
        s"""${queryCte(QueryVecId)}, enc AS (SELECT vec_id, $encCols FROM embeddings)
           |SELECT vec_id, sqrt(${("0.0" +: terms).mkString(" + ")}) AS dist
           |FROM enc CROSS JOIN q ORDER BY dist ASC, vec_id ASC LIMIT 10""".stripMargin
      },

      // the rerank twin: the ADC CASE-table distance picks the top-30
      // boundary, exact per-dim L2 re-scores the survivors
      "o6_pq_adc_rerank_fixed" -> {
        val encCols = (0 until 8).map(c => s"(${pqCodeSql(c)}) AS c$c").mkString(", ")
        val terms = (0 until 8).map { c =>
          s"""(CASE c$c WHEN 0 THEN (${adcTableSql(c, 0)})
             |WHEN 1 THEN (${adcTableSql(c, 1)})
             |WHEN 2 THEN (${adcTableSql(c, 2)})
             |ELSE (${adcTableSql(c, 3)}) END)""".stripMargin
        }
        s"""${queryCte(QueryVecId)},
           |enc AS (SELECT vec_id, embedding, $encCols FROM embeddings),
           |adc AS (
           |  SELECT vec_id, embedding, q.qe AS qe,
           |    sqrt(${("0.0" +: terms).mkString(" + ")}) AS dist_adc
           |  FROM enc CROSS JOIN q
           |  ORDER BY dist_adc ASC, vec_id ASC LIMIT 30)
           |SELECT vec_id, ${l2("embedding", "qe")} AS dist
           |FROM adc ORDER BY dist ASC, vec_id ASC LIMIT 10""".stripMargin
      },

      "export_jsonl" ->
        """SELECT doc_id, md5(text) AS text_md5, lang, source, n_chars
          |FROM documents ORDER BY doc_id""".stripMargin,

      // the READ-direction twin: good rows out of the jsonl.gz ingest
      // (corrupt lines quarantined) must equal the plain table exactly
      "ingest_jsonl" ->
        """SELECT doc_id, md5(text) AS text_md5, lang, source, n_chars
          |FROM documents ORDER BY doc_id""".stripMargin,

      "ingest_csv" ->
        """SELECT doc_id, md5(text) AS text_md5, lang, source, n_chars
          |FROM documents ORDER BY doc_id""".stripMargin,

      // strlen = BYTE length in DuckDB — matches the WARC
      // Content-Length of the UTF-8 payload
      "ingest_warc" ->
        """SELECT doc_id, md5(text) AS text_md5, strlen(text) AS n_bytes
          |FROM documents ORDER BY doc_id""".stripMargin,

      // the one-statement SQL pipeline, replayed in DuckDB: gopher gate
      // (30/90/1 — gopherRulesSql's thresholds) ∘ keep-first dedup ∘
      // the md5 split-label formula (sample_hash_split's oracle)
      "pipeline_sql_ingest" ->
        s"""SELECT split, count(*) AS n,
           |  CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM (
           |  SELECT CASE WHEN u < CAST('0.75' AS DOUBLE) THEN 'train'
           |              WHEN u < CAST('0.875' AS DOUBLE) THEN 'val'
           |              ELSE 'test' END AS split, n_chars
           |  FROM (SELECT d.doc_id, d.n_chars,
           |      CAST(concat('0x', left(md5(CAST(d.doc_id AS VARCHAR)), 8)) AS UBIGINT)
           |        / 4294967296.0 AS u
           |    FROM documents d
           |    JOIN (${gopherRulesSql("documents")}) g ON d.doc_id = g.doc_id
           |    WHERE g.gopher_pass
           |      AND d.doc_id IN (SELECT min(doc_id) FROM documents
           |                       GROUP BY md5(text))) h) s
           |GROUP BY split ORDER BY split""".stripMargin,

      // exhaustive-ef HNSW ≡ exact kNN (deterministic build, connected
      // shards, exact merge) — the same oracle pattern as o6_ivf_exhaustive
      "o3_hnsw_exhaustive" ->
        s"""$cte SELECT e.vec_id AS id, ${l2("e.embedding", "q.qe")} AS dist
           |FROM embeddings e CROSS JOIN q ORDER BY dist ASC, id ASC LIMIT 10""".stripMargin,

      "pipeline_export" ->
        s"""WITH corpus AS (
           |  SELECT d.doc_id, d.text FROM documents d
           |  JOIN ($langIdSql) l ON d.doc_id = l.doc_id
           |  JOIN ($qualitySql) q ON d.doc_id = q.doc_id
           |  WHERE l.lang_pred = 'en' AND q.quality >= 0.5
           |  AND d.doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(text))
           |  AND d.doc_id % 50 <> 0),
           |toks_all AS (
           |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS ts FROM documents),
           |grams_all AS (
           |  SELECT doc_id, unnest(list_distinct(list_transform(
           |    generate_series(1, greatest(len(ts)-2, 1)),
           |    i -> concat_ws(' ', ts[i], ts[i+1], ts[i+2])))) AS g FROM toks_all),
           |bg AS (SELECT DISTINCT g FROM grams_all WHERE doc_id % 50 = 0),
           |contam AS (
           |  SELECT doc_id FROM grams_all JOIN bg USING (g)
           |  WHERE doc_id % 50 <> 0 GROUP BY 1 HAVING count(*) >= 2),
           |red AS (
           |  SELECT doc_id, ${redactSql("text")} AS rtext FROM corpus
           |  WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
           |tok AS (SELECT doc_id, rtext,
           |  CAST(len(string_split_regex(rtext, '\\s+')) AS BIGINT) AS n_tok FROM red),
           |c AS (SELECT doc_id, rtext, n_tok,
           |  COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum FROM tok)
           |SELECT doc_id, n_tok,
           |  CAST(cum // 2048 AS BIGINT) AS pack_id,
           |  CAST(cum % 2048 AS BIGINT) AS pack_offset,
           |  md5(rtext) AS text_md5
           |FROM c ORDER BY doc_id""".stripMargin,

      // first-occurrence argmin via list_position(list_min) mirrors the
      // kernel's strict-< replace rule; centroid ranking mirrors the
      // driver's (dist, id)-ascending probe selection
      // one Lloyd step from the fixed centroids: argmin assignment
      // (list_min position ≡ codegen NearestCentroid lowest-index
      // tie-break), then in-vec_id-order component folds per cell
      "b4_lloyd_fixed" -> {
        val lv = (0 until 8).map(j => s"(${ivfAssignDistSql(j)})").mkString(", ")
        s"""WITH enc AS (SELECT vec_id, embedding,
           |  (list_position(lv, list_min(lv)) - 1) AS cid
           |  FROM (SELECT vec_id, embedding, list_value($lv) AS lv FROM embeddings)),
           |cells AS (
           |  SELECT cid, vec_id, unnest(embedding) AS v,
           |         generate_subscripts(embedding, 1) AS pos
           |  FROM enc),
           |agg AS (
           |  SELECT CAST(cid AS BIGINT) AS cluster_id,
           |    CAST(pos AS BIGINT) AS dim_pos,
           |    list_reduce(list_prepend(0.0, list(CAST(v AS DOUBLE) ORDER BY vec_id)),
           |                (x, y) -> x + y) AS comp_sum,
           |    CAST(count(*) AS BIGINT) AS n
           |  FROM cells GROUP BY 1, 2)
           |SELECT cluster_id, dim_pos, comp_sum, n,
           |  comp_sum / CAST(n AS DOUBLE) AS comp_mean
           |FROM agg ORDER BY cluster_id, dim_pos""".stripMargin
      },

      "o6_ivfpq_fixed" -> ivfPqFixedSql(rerank = 0),

      "o6_ivfpq_rerank_fixed" -> ivfPqFixedSql(rerank = 30),

      "o7_ivfpq_filtered" -> ivfPqFixedSql(rerank = 0, filterLabel = Some(3)),

      // filtered PQ-ADC: same fixed-codebook encode/table chain as
      // o6_pq_adc_fixed, predicate composed below the rank
      "o7_pq_filtered" -> {
        val encCols = (0 until 8).map(c => s"(${pqCodeSql(c)}) AS c$c").mkString(", ")
        val terms = (0 until 8).map { c =>
          s"""(CASE c$c WHEN 0 THEN (${adcTableSql(c, 0)})
             |WHEN 1 THEN (${adcTableSql(c, 1)})
             |WHEN 2 THEN (${adcTableSql(c, 2)})
             |ELSE (${adcTableSql(c, 3)}) END)""".stripMargin
        }
        s"""${queryCte(QueryVecId)}, enc AS (
           |  SELECT vec_id, CAST(label AS BIGINT) AS label, $encCols
           |  FROM embeddings WHERE label = 3)
           |SELECT vec_id, label, sqrt(${("0.0" +: terms).mkString(" + ")}) AS dist
           |FROM enc CROSS JOIN q ORDER BY dist ASC, vec_id ASC LIMIT 10""".stripMargin
      },

      // filtered SQ8-ADC: grid from the FULL corpus (sq_stats is
      // unfiltered, matching the persisted-model shape), scan filtered
      "o7_sq8_filtered" -> {
        val terms = (1 to OracleSql.Dim).map { i =>
          val dec = s"(mns[$i] + CAST(code[$i] AS DOUBLE) / 255.0 * dfs[$i])"
          val d = s"(CAST(q.qe[$i] AS DOUBLE) - $dec)"
          s"$d * $d"
        }
        s"""${queryCte(QueryVecId)},
           |$sqOracleCtes
           |SELECT vec_id, CAST(label AS BIGINT) AS label,
           |  sqrt(${("0.0" +: terms).mkString(" + ")}) AS dist
           |FROM sq_enc CROSS JOIN sq_arr CROSS JOIN q
           |WHERE label = 3
           |ORDER BY dist ASC, vec_id ASC LIMIT 10""".stripMargin
      },

      "o6_ivf_fixed" -> {
        val lv = (0 until 8).map(j => s"(${ivfAssignDistSql(j)})").mkString(", ")
        val cdist = (0 until 8)
          .map(j => s"SELECT $j AS j, (${ivfQueryDistSql(j)}) AS d FROM q")
          .mkString(" UNION ALL ")
        s"""${queryCte(QueryVecId)},
           |enc AS (SELECT vec_id, embedding,
           |  (list_position(lv, list_min(lv)) - 1) AS cid
           |  FROM (SELECT vec_id, embedding, list_value($lv) AS lv FROM embeddings)),
           |cdist AS ($cdist),
           |probe AS (SELECT j FROM cdist ORDER BY d ASC, j ASC LIMIT 2)
           |SELECT e.vec_id AS vec_id, ${l2("e.embedding", "q.qe")} AS dist
           |FROM enc e CROSS JOIN q WHERE e.cid IN (SELECT j FROM probe)
           |ORDER BY dist ASC, vec_id ASC LIMIT 10""".stripMargin
      }
    )
  }

  /** Hashed-classifier demo model: bucket count + a deterministic
    * closed-form weight vector (stand-in for offline-trained weights —
    * the engine contract is the scoring pass, not training). */
  /** The ordered-funnel oracle — shared verbatim by `events_funnel`
    * (batch) and `b10_stream_funnel` (streaming), which must agree. */
  private val funnelOracleSql: String =
    """WITH f1 AS (
          |  SELECT user_id, min(ts) AS t1 FROM events
          |  WHERE event_type = 'view' GROUP BY user_id),
          |f2 AS (
          |  SELECT e.user_id, min(f1.t1) AS t1, min(e.ts) AS t2
          |  FROM events e JOIN f1 ON e.user_id = f1.user_id
          |  WHERE e.event_type = 'click' AND e.ts > f1.t1
          |    AND e.ts <= f1.t1 + INTERVAL 86400 SECOND
          |  GROUP BY e.user_id),
          |f3 AS (
          |  SELECT e.user_id, min(f2.t1) AS t1, min(e.ts) AS t3
          |  FROM events e JOIN f2 ON e.user_id = f2.user_id
          |  WHERE e.event_type = 'purchase' AND e.ts > f2.t2
          |    AND e.ts <= f2.t1 + INTERVAL 86400 SECOND
          |  GROUP BY e.user_id)
          |SELECT f1.user_id, epoch_us(f1.t1) AS t1_us,
          |  epoch_us(f2.t2) AS t2_us, epoch_us(f3.t3) AS t3_us,
          |  CAST(1 + (CASE WHEN f2.t2 IS NULL THEN 0 ELSE 1 END)
          |    + (CASE WHEN f3.t3 IS NULL THEN 0 ELSE 1 END) AS BIGINT)
          |    AS steps_completed
          |FROM f1
          |LEFT JOIN f2 ON f1.user_id = f2.user_id
          |LEFT JOIN f3 ON f1.user_id = f3.user_id
          |ORDER BY f1.user_id""".stripMargin

  /** Replays the events table as TWO time-ordered micro-batches (split
    * at the timestamp midpoint, explicit file mtimes so the file source
    * triggers them in order) through the stateful streaming funnel,
    * then keeps the last per-user snapshot — hash-checked against the
    * SAME batch-funnel oracle as `events_funnel`, because the stream is
    * batch-identical under time-ordered arrival (completion times never
    * regress; each step's first qualifying event ≡ the batch filtered
    * min). */
  private def streamFunnelPipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tmp = scratchDir("graft_b10funnel")
    val ev = Tables.events(s, dir).select(col("user_id"),
      unix_micros(col("ts")).as("ts_us"), col("event_type"))
    val bounds = ev.agg(min(col("ts_us")), max(col("ts_us"))).head
    val mid = bounds.getLong(0) + (bounds.getLong(1) - bounds.getLong(0)) / 2
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$tmp/in"))
    Seq(ev.filter(col("ts_us") <= mid) -> 0,
        ev.filter(col("ts_us") > mid) -> 1).foreach { case (half, i) =>
      half.coalesce(1).write.mode("overwrite").parquet(s"$tmp/h$i")
      val part = java.nio.file.Files.list(
          java.nio.file.Paths.get(s"$tmp/h$i"))
        .filter(f => f.getFileName.toString.endsWith(".parquet"))
        .findFirst().get()
      val dest = java.nio.file.Paths.get(s"$tmp/in/batch$i.parquet")
      java.nio.file.Files.move(part, dest)
      java.nio.file.Files.setLastModifiedTime(dest,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 60000L))
    }
    val stream = s.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$tmp/in")
      .select(col("user_id").as("userId"), col("ts_us").as("tsMicros"),
        col("event_type").as("eventType"))
      .as[Funnel.FunnelEvent]
    val name = s"b10_funnel_sink_${System.nanoTime()}"
    withShufflePartitions(s, 8) {
      val q = Funnel.funnelStream(stream,
          Seq("view", "click", "purchase"), withinMicros = Some(86400000000L))
        .writeStream.format("memory").queryName(name)
        .outputMode("update")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // completion times never regress, so the lexicographic max snapshot
    // per user IS the final state
    val last = s.table(name)
      .groupBy(col("userId"))
      .agg(max(struct(col("stepsCompleted"), col("times"))).as("f"))
    s.catalog.dropTempView(name)
    def tAt(k: Int) = {
      val v = element_at(col("f.times"), k)
      when(v >= 0, v).otherwise(lit(null).cast("long"))
    }
    last.select(col("userId").as("user_id"),
      tAt(1).as("t1_us"), tAt(2).as("t2_us"), tAt(3).as("t3_us"),
      col("f.stepsCompleted").as("steps_completed"))
      .orderBy("user_id")
  }

  /** Shared body of `b10_stream_index` / `b10_stream_index_exh`: replay
    * the embeddings corpus as micro-batches (one file per trigger),
    * maintain the persisted HNSW shard graphs on every flush (first
    * flush builds, later flushes insert only unseen ids), then search
    * the PERSISTED edges exactly as the last flush left them. Scratch
    * root is fixed and wiped on entry: repeated bench/verify runs reuse
    * one directory instead of accumulating corpus copies (the
    * checkpoint MUST go too — a stale AvailableNow checkpoint would
    * mark the replay files already-processed and skip them). */
  private def streamIndexPipeline(s: SparkSession, dir: String, ef: Int,
                                  tmpName: String): DataFrame = {
    val tmp = scratchDir(tmpName)
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    emb.repartition(2).write.mode("overwrite").parquet(s"$tmp/in")
    val stream = s.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$tmp/in")
    // the maintenance config a user copies into a long-lived stream must
    // be the one that holds the recall gate at corpus scale: library
    // default m16/efC200 (the 10M sweep measures m8/efC50 at 1/10 —
    // see the Hnsw.scala knob table for the build-cost trade)
    val params = Hnsw.Params()
    withShufflePartitions(s, 8) {
      // compactEvery=2: the mid-stream delta fold runs under this
      // query's oracle too — the merged view must be identical with
      // and without a compaction between flushes
      val q = graft.streaming.StreamingIngest.upsertStream(
        stream, "vec_id", s"$tmp/snap", s"$tmp/ckpt", flushThreshold = 1,
        compactEvery = 2,
        onFlush = { _ =>
          Hnsw.refreshEdges(
            graft.core.DeltaLog.readMerged(s, s"$tmp/snap", "vec_id")
              .getOrElse(sys.error("no streamed snapshot state")),
            s"$tmp/edges", "vec_id", "embedding", numPartitions = 4, params)
          ()
        })
      q.awaitTermination()
    }
    val snap = graft.core.DeltaLog.readMerged(s, s"$tmp/snap", "vec_id")
      .getOrElse(sys.error("no streamed snapshot state"))
    val edges = graft.core.SnapshotIO.read(s, s"$tmp/edges")
      .getOrElse(sys.error("no edges snapshot published by the stream"))
    val queries = Tables.embeddings(s, dir).filter(col("vec_id") < 3)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    Hnsw.searchEdges(edges, snap, "vec_id", "embedding", queries,
        k = 5, ef = ef, numPartitions = 4, params)
      .select(col("query_id"), col("id").as("neighbor_id"), col("dist"),
        col("rank").cast("long").as("rank"))
      .orderBy("query_id", "rank")
  }

  /** Streaming near-dup maintenance harness: replay `documents` as 3
    * micro-batch files; each `foreachBatch` flush appends intra-batch
    * LSH pairs plus batch-vs-corpus cross pairs (canonicalized
    * a = least, b = greatest) to the maintained pair table, then folds
    * the batch into the corpus. Final read-back = the live pair table
    * as the last flush left it. */
  private def streamNearDupPipeline(s: SparkSession, dir: String): DataFrame = {
    val tmp = scratchDir("graft_b10neardup")
    val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
    docs.repartition(3).write.mode("overwrite").parquet(s"$tmp/in")
    val stream = s.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$tmp/in")
    withShufflePartitions(s, 8) {
      // compactEvery=2: the mid-stream state compaction runs under this
      // query's oracle too — the maintained pair table must be
      // bit-identical with and without the rewrite
      graft.streaming.StreamingIngest.nearDupMaintenance(
        stream, "doc_id", "text", s"$tmp/work", s"$tmp/ckpt",
        numHashes = 8, bands = 4, shingle = 3, maxBucket = DedupMaxBucket,
        compactEvery = 2)
        .awaitTermination()
    }
    // distinct for replay idempotence (a restarted flush may re-append)
    s.read.parquet(s"$tmp/work/pairs").distinct().orderBy("a", "b")
  }

  private val ClassifierDim = 64
  private val DsirDim = 64
  private val ClassifierTrainIters = 4
  private val ClassifierTrainLr = 0.5
  private lazy val classifierWeights: Seq[Double] =
    (0 until ClassifierDim).map(i =>
      ((i * 2654435761L + 12345L) % 1000003L).toDouble / 1000003.0 - 0.5)

  /** DuckDB replay of `TextFunctions.hashedLinearLogit`: same gram
    * sequence (unigrams then bigrams, document order), same md5 bucket
    * hash (the [[mdValue]] nibble parse applied to a lambda variable),
    * same 0.0-seeded left fold; weights/bias as strtod string casts
    * (bare decimal literals parse as DECIMAL and DuckDB's
    * decimal→double conversion is off by 1 ulp). */
  /** hash32 replay over an md5 hex string bound to `m` (first 8 hex
    * nibbles as a big-endian value — `Sketch.hash32`'s conv(...,16,10)). */
  private def hash32Sql: String = {
    def nib(j: Int) =
      s"CAST(strpos('0123456789abcdef', substr(m, $j, 1)) - 1 AS BIGINT)"
    (1 to 8).map(j => s"${nib(j)} * ${1L << (4 * (8 - j))}").mkString(" + ")
  }

  /** Shared gram CTEs (`toks`, `grams`) — `hashedLinearLogit`'s and
    * `Classifier.gramBuckets`'s lowercase unigram+bigram construction. */
  private def classifierGramCtes: String =
    s"""toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
       |    w -> w <> '') AS ws FROM documents),
       |grams AS (
       |  SELECT doc_id, list_concat(ws,
       |    CASE WHEN len(ws) >= 2 THEN list_transform(range(1, len(ws)),
       |      i -> concat(ws[i], ' ', ws[i+1]))
       |    ELSE CAST([] AS VARCHAR[]) END) AS gs FROM toks)""".stripMargin

  private def classifierSql(dim: Int, weights: Seq[Double], bias: Double): String = {
    val wl = weights.map(w => s"CAST('$w' AS DOUBLE)").mkString("[", ", ", "]")
    s"""WITH $classifierGramCtes,
       |hashed AS (
       |  SELECT doc_id, list_transform(list_transform(gs, g -> md5(g)),
       |    m -> ($hash32Sql) % $dim) AS bs FROM grams),
       |scored AS (
       |  SELECT doc_id, CAST('$bias' AS DOUBLE) + list_reduce(
       |    list_prepend(CAST('0.0' AS DOUBLE),
       |      list_transform(bs, b -> ($wl)[b + 1])),
       |    (x, y) -> x + y) AS logit FROM hashed)
       |SELECT doc_id, logit, logit > 0 AS pred_keep FROM scored
       |ORDER BY doc_id""".stripMargin
  }

  /** Unrolled replay of `Classifier.train(dim, iters, lr)` with labels
    * lang='en': the (doc, bucket, count) table + the bias feature at
    * bucket dim, then per iteration the DECIMAL(38,18)-routed per-doc z
    * sum, the hard-sigmoid error, the decimal-routed per-bucket
    * gradient, and the `w − lr·(g/n)` double update — each as one CTE
    * block, arithmetic-identical to the engine's expression trees. */
  /** Replay of `Pca.topComponent(dim, iters)`: float-product pairs
    * (exact in double) through the decimal-routed exact sum into the
    * dim×dim matrix, then each power-iteration round as one CTE block —
    * matvec row sums and the norm-square via `list_reduce` (fold-left
    * from the first element, exactly the engine's driver loop), unit
    * scaling by the correctly rounded sqrt. */
  private def pcaPowerCtes(dim: Int, iters: Int,
                           src: String = "embeddings"): String = {
    val base =
      s"""pc_pairs AS (
         |  SELECT ii.i AS i, jj.j AS j,
         |    CAST(e.embedding[ii.i + 1] AS DOUBLE)
         |      * CAST(e.embedding[jj.j + 1] AS DOUBLE) AS p
         |  FROM $src e
         |  CROSS JOIN (SELECT unnest(range(0, $dim)) AS i) ii
         |  CROSS JOIN (SELECT unnest(range(0, $dim)) AS j) jj),
         |pc_m AS (SELECT i, j, ${sparkDecSumToDouble("p")} AS mv
         |  FROM pc_pairs GROUP BY i, j),
         |pc_rows AS (SELECT i, list(mv ORDER BY j) AS rw FROM pc_m GROUP BY i),
         |pc_mat AS (SELECT list(rw ORDER BY i) AS M FROM pc_rows),
         |pc_v0 AS (SELECT M,
         |  list_transform(range(0, $dim), x -> CAST(1.0 AS DOUBLE)) AS v,
         |  CAST(0.0 AS DOUBLE) AS nsq FROM pc_mat)""".stripMargin
    val steps = (1 to iters).map { k =>
      s"""pc_w$k AS (SELECT M, list_transform(range(1, ${dim + 1}), i ->
         |    list_reduce(list_transform(range(1, ${dim + 1}), j -> M[i][j] * v[j]),
         |      (a, b) -> a + b)) AS w
         |  FROM pc_v${k - 1}),
         |pc_n$k AS (SELECT M, w,
         |  list_reduce(list_transform(w, x -> x * x), (a, b) -> a + b) AS nsq
         |  FROM pc_w$k),
         |pc_v$k AS (SELECT M, list_transform(w, x -> x / sqrt(nsq)) AS v, nsq
         |  FROM pc_n$k)""".stripMargin
    }
    (base +: steps).mkString(",\n")
  }

  private def pcaPowerSql(dim: Int, iters: Int,
                          src: String = "embeddings"): String =
    s"""WITH ${pcaPowerCtes(dim, iters, src)}
       |SELECT CAST(ii.i AS INT) AS i, v[ii.i + 1] AS loading,
       |  sqrt(nsq) AS lambda
       |FROM pc_v$iters CROSS JOIN (SELECT unnest(range(0, $dim)) AS i) ii
       |ORDER BY i""".stripMargin

  /** Replay of the All-but-the-Top residual ranking: the power-method
    * component from [[pcaPowerCtes]], then per row the left-fold dot,
    * the elementwise residual, and the left-fold residual norm² —
    * operand-for-operand the `Pca.projectOut` + `Pca.normSq` expression
    * trees. */
  private def pcaResidualSql(dim: Int, iters: Int, k: Int,
                             src: String = "embeddings"): String =
    s"""WITH ${pcaPowerCtes(dim, iters, src)},
       |pr_d AS (SELECT e.vec_id AS vec_id, e.embedding AS emb, c.v AS v,
       |    list_reduce(list_transform(range(1, ${dim + 1}),
       |      j -> CAST(e.embedding[j] AS DOUBLE) * c.v[j]), (a, b) -> a + b) AS d
       |  FROM embeddings e CROSS JOIN pc_v$iters c),
       |pr_r AS (SELECT vec_id, list_transform(range(1, ${dim + 1}),
       |    i -> CAST(emb[i] AS DOUBLE) - d * v[i]) AS r FROM pr_d)
       |SELECT vec_id,
       |  list_reduce(list_transform(r, x -> x * x), (a, b) -> a + b) AS res_norm_sq
       |FROM pr_r ORDER BY res_norm_sq DESC, vec_id LIMIT $k""".stripMargin

  /** Double → DECIMAL(38,18) with Spark's semantics: Spark casts via
    * BigDecimal(Double.toString(d)) (shortest decimal string, HALF_UP
    * to scale 18) while DuckDB's direct cast rounds the BINARY
    * expansion — they disagree in the 18th digit for values like
    * 0.36022124999999994 (...940 vs ...936). Routing through VARCHAR
    * makes DuckDB take the same shortest-string path. */
  private def sparkDecCast(expr: String): String =
    s"CAST(CAST($expr AS VARCHAR) AS DECIMAL(38,18))"

  /** DECIMAL(38,18) sum → double with Spark's semantics: DuckDB's
    * direct decimal→double cast is not correctly rounded (int128 and
    * 10^-18 scale each round separately: 0.021276595744680850 →
    * ...847 where the nearest double is ...85), but its decimal→varchar
    * →double path parses the exact digit string with correct rounding —
    * which is what Spark's Decimal.toDouble (BigDecimal.doubleValue)
    * does. */
  private def sparkDecSumToDouble(expr: String): String =
    s"CAST(CAST(SUM(${sparkDecCast(expr)}) AS VARCHAR) AS DOUBLE)"

  private def classifierTrainCtes(dim: Int, iters: Int, lr: Double): String = {
    val lrS = s"CAST('$lr' AS DOUBLE)"
    val base =
      s"""$classifierGramCtes,
         |ct_b AS (
         |  SELECT doc_id, unnest(list_transform(list_transform(gs, g -> md5(g)),
         |    m -> ($hash32Sql) % $dim)) AS b FROM grams),
         |ct_g AS (
         |  SELECT doc_id, b, CAST(count(*) AS DOUBLE) AS c FROM ct_b
         |  GROUP BY doc_id, b
         |  UNION ALL
         |  SELECT doc_id, $dim AS b, CAST(1.0 AS DOUBLE) AS c FROM documents),
         |ct_y AS (SELECT doc_id, CASE WHEN lang = 'en' THEN CAST(1.0 AS DOUBLE)
         |  ELSE CAST(0.0 AS DOUBLE) END AS y FROM documents),
         |ct_n AS (SELECT count(*) AS n FROM documents),
         |ct_w0 AS (SELECT unnest(range(0, ${dim + 1})) AS b,
         |  CAST(0.0 AS DOUBLE) AS w)""".stripMargin
    val steps = (1 to iters).map { k =>
      s"""ct_z$k AS (
         |  SELECT g.doc_id,
         |    ${sparkDecSumToDouble("g.c * w.w")} AS z
         |  FROM ct_g g JOIN ct_w${k - 1} w ON g.b = w.b GROUP BY g.doc_id),
         |ct_e$k AS (
         |  SELECT y.doc_id,
         |    greatest(CAST(0.0 AS DOUBLE), least(CAST(1.0 AS DOUBLE),
         |      CAST('0.5' AS DOUBLE) + z.z * CAST('0.25' AS DOUBLE))) - y.y AS e
         |  FROM ct_y y JOIN ct_z$k z ON y.doc_id = z.doc_id),
         |ct_gr$k AS (
         |  SELECT g.b, ${sparkDecSumToDouble("e.e * g.c")} AS gr
         |  FROM ct_e$k e JOIN ct_g g ON e.doc_id = g.doc_id GROUP BY g.b),
         |ct_w$k AS (
         |  SELECT w.b, w.w - $lrS * (coalesce(gr.gr, CAST(0.0 AS DOUBLE))
         |    / CAST(n.n AS DOUBLE)) AS w
         |  FROM ct_w${k - 1} w LEFT JOIN ct_gr$k gr ON w.b = gr.b
         |  CROSS JOIN ct_n n)""".stripMargin
    }
    (base +: steps).mkString(",\n")
  }

  private def classifierTrainSql(dim: Int, iters: Int, lr: Double): String =
    s"""WITH ${classifierTrainCtes(dim, iters, lr)}
       |SELECT CAST(b AS BIGINT) AS idx, w FROM ct_w$iters ORDER BY idx""".stripMargin

  /** Train → score replay: the learned weight list and bias index into
    * the same ordered gram fold `classifierSql` uses. */
  private def classifierTrainScoreSql(dim: Int, iters: Int, lr: Double): String =
    s"""WITH ${classifierTrainCtes(dim, iters, lr)},
       |sc_w AS (SELECT list(w ORDER BY b) AS wl FROM ct_w$iters WHERE b < $dim),
       |sc_b AS (SELECT w AS bias FROM ct_w$iters WHERE b = $dim),
       |sc_hashed AS (
       |  SELECT doc_id, list_transform(list_transform(gs, g -> md5(g)),
       |    m -> ($hash32Sql) % $dim) AS bs FROM grams),
       |sc_scored AS (
       |  SELECT doc_id, bias + list_reduce(
       |    list_prepend(CAST('0.0' AS DOUBLE),
       |      list_transform(bs, b -> wl[b + 1])),
       |    (x, y) -> x + y) AS logit
       |  FROM sc_hashed CROSS JOIN sc_w CROSS JOIN sc_b)
       |SELECT doc_id, logit, logit > 0 AS pred_keep FROM sc_scored
       |ORDER BY doc_id""".stripMargin

  /** Calibration oracle: the classifier train+score replay, exact
    * decile cutoffs by row_number order statistic, the same chained
    * CASE binning, and per-decile decimal-routed means. */
  private def calibrationSql(dim: Int, iters: Int, lr: Double): String = {
    val cutDefs = (1 to 9).map(i =>
      s"""max(CASE WHEN rn = greatest(1, CAST(ceil(CAST($i AS DOUBLE) / 10 * n) AS BIGINT)) THEN logit END) AS c$i""")
      .mkString(",\n")
    val caseBins = (1 to 9).map(i => s"WHEN logit <= c$i THEN ${i - 1}")
      .mkString(" ")
    s"""WITH ${classifierTrainCtes(dim, iters, lr)},
       |sc_w AS (SELECT list(w ORDER BY b) AS wl FROM ct_w$iters WHERE b < $dim),
       |sc_b AS (SELECT w AS bias FROM ct_w$iters WHERE b = $dim),
       |sc_hashed AS (
       |  SELECT doc_id, list_transform(list_transform(gs, g -> md5(g)),
       |    m -> ($hash32Sql) % $dim) AS bs FROM grams),
       |sc_scored AS (
       |  SELECT doc_id, bias + list_reduce(
       |    list_prepend(CAST('0.0' AS DOUBLE),
       |      list_transform(bs, b -> wl[b + 1])),
       |    (x, y) -> x + y) AS logit
       |  FROM sc_hashed CROSS JOIN sc_w CROSS JOIN sc_b),
       |scr AS (SELECT s.doc_id, s.logit, d.lang
       |  FROM sc_scored s JOIN documents d USING (doc_id)),
       |r AS (SELECT logit, row_number() OVER (ORDER BY logit) AS rn,
       |  count(*) OVER () AS n FROM scr),
       |cuts AS (SELECT
       |$cutDefs
       |FROM r),
       |b AS (SELECT scr.logit, scr.lang,
       |  CASE $caseBins ELSE 9 END AS decile
       |  FROM scr CROSS JOIN cuts)
       |SELECT CAST(decile AS BIGINT) AS decile,
       |  CAST(count(*) AS BIGINT) AS n,
       |  ${OracleSql.decSum("logit", 12)} / CAST(count(*) AS DOUBLE) AS mean_logit,
       |  CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) AS frac_pos
       |FROM b GROUP BY decile ORDER BY decile""".stripMargin
  }

  /** DuckDB replay of `Dsir.learn` + `Dsir.logWeight`: the grouped
    * raw/target bucket counts (one pass, target as a FILTER over the
    * same rows), the four-ln smoothed log-ratio λ (libm `ln` matches
    * `Math.log` bitwise — LnDouble), and the gram-ordered weight fold
    * of `hashedLinearLogit` — arithmetic-identical to the engine. */
  private def dsirCtes(dim: Int): String =
    s"""$classifierGramCtes,
       |ds_b AS (
       |  SELECT doc_id, unnest(list_transform(list_transform(gs, g -> md5(g)),
       |    m -> ($hash32Sql) % $dim)) AS b FROM grams),
       |ds_c AS (
       |  SELECT b, count(*) AS cr,
       |    count(*) FILTER (WHERE d.lang = 'en') AS ct
       |  FROM ds_b JOIN documents d USING (doc_id) GROUP BY b),
       |ds_tot AS (SELECT coalesce(sum(cr), 0) AS totr,
       |  coalesce(sum(ct), 0) AS tott FROM ds_c),
       |ds_lam AS (
       |  SELECT r.b,
       |    (ln(coalesce(c.ct, 0) + CAST('1.0' AS DOUBLE))
       |      - ln(CAST(t.tott AS DOUBLE) + CAST('${dim}.0' AS DOUBLE)))
       |    - (ln(coalesce(c.cr, 0) + CAST('1.0' AS DOUBLE))
       |      - ln(CAST(t.totr AS DOUBLE) + CAST('${dim}.0' AS DOUBLE))) AS lam
       |  FROM (SELECT unnest(range(0, $dim)) AS b) r
       |  LEFT JOIN ds_c c ON r.b = c.b CROSS JOIN ds_tot t),
       |ds_wl AS (SELECT list(lam ORDER BY b) AS wl FROM ds_lam),
       |ds_scored AS (
       |  SELECT h.doc_id, CAST('0.0' AS DOUBLE) + list_reduce(
       |    list_prepend(CAST('0.0' AS DOUBLE),
       |      list_transform(bs, b -> wl[b + 1])),
       |    (x, y) -> x + y) AS dsir_logw
       |  FROM (SELECT doc_id, list_transform(list_transform(gs, g -> md5(g)),
       |      m -> ($hash32Sql) % $dim) AS bs FROM grams) h
       |  CROSS JOIN ds_wl)""".stripMargin

  /** Replay of `Curation.gopherSignals` + `gopherPass(minWords = 30,
    * maxWords = 90, minStopHits = 1)` over `$src` (doc_id, text):
    * complete SELECT, no trailing ORDER BY so it composes as a
    * subquery. */
  private def gopherRulesSql(src: String): String =
    s"""SELECT doc_id, n_words, mean_word_len, symbol_word_ratio,
       |  bullet_line_frac, ellipsis_line_frac, alpha_word_frac, stop_hits,
       |  (n_words BETWEEN 30 AND 90)
       |    AND (mean_word_len BETWEEN CAST(3 AS DOUBLE) AND CAST(10 AS DOUBLE))
       |    AND symbol_word_ratio <= CAST('0.1' AS DOUBLE)
       |    AND bullet_line_frac <= CAST('0.9' AS DOUBLE)
       |    AND ellipsis_line_frac <= CAST('0.3' AS DOUBLE)
       |    AND alpha_word_frac >= CAST('0.8' AS DOUBLE)
       |    AND stop_hits >= 1 AS gopher_pass
       |FROM (SELECT doc_id,
       |  CAST(len(ws) AS BIGINT) AS n_words,
       |  CASE WHEN len(ws) > 0 THEN
       |    CAST(list_sum(list_transform(ws, x -> length(x))) AS DOUBLE)
       |      / CAST(len(ws) AS DOUBLE) ELSE 0.0 END AS mean_word_len,
       |  (CAST(length(regexp_replace(text, '[^#…]', '', 'g')) AS DOUBLE)
       |    + CAST(length(text) - length(replace(text, '...', '')) AS DOUBLE)
       |      / CAST(3 AS DOUBLE))
       |    / CAST(greatest(len(ws), 1) AS DOUBLE) AS symbol_word_ratio,
       |  CAST(len(list_filter(ls, l -> regexp_matches(ltrim(l), '^[-*•]'))) AS DOUBLE)
       |    / CAST(greatest(len(ls), 1) AS DOUBLE) AS bullet_line_frac,
       |  CAST(len(list_filter(ls, l -> regexp_matches(l, '(…|\\.\\.\\.)$$'))) AS DOUBLE)
       |    / CAST(greatest(len(ls), 1) AS DOUBLE) AS ellipsis_line_frac,
       |  CASE WHEN len(ws) > 0 THEN
       |    CAST(len(list_filter(ws, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
       |      / CAST(len(ws) AS DOUBLE) ELSE 0.0 END AS alpha_word_frac,
       |  CAST(len(list_intersect(list_distinct(ws),
       |    ['the','be','to','of','and','that','have','with'])) AS BIGINT) AS stop_hits
       |FROM (SELECT doc_id, text,
       |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS ws,
       |    string_split(text, chr(10)) AS ls
       |  FROM $src) w) sig""".stripMargin

  /** (doc_id, ls) word-window line table of `$src` (doc_id, text) at
    * `width` words per line — the SQL twin of `Curation.wordWindows`. */
  private def wordWindowLinesSql(src: String, width: Int): String =
    s"""SELECT doc_id,
       |  CASE WHEN len(ws) > 0 THEN list_transform(
       |    generate_series(0, (len(ws)-1)//$width),
       |    i -> array_to_string(list_slice(ws, i*$width+1, i*$width+$width), ' '))
       |  ELSE CAST([] AS VARCHAR[]) END AS ls
       |FROM (SELECT doc_id,
       |    list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS ws
       |  FROM $src) w""".stripMargin

  /** Replay of `Curation.htmlStrip` over a SQL expression: the same
    * comment → script/style-with-payload → tag → entity(&amp; last) →
    * whitespace chain, in the RE2∩Java regex subset the operator
    * restricts itself to. */
  private def htmlStripSql(e: String): String =
    s"""trim(regexp_replace(
       |  replace(replace(replace(replace(replace(replace(
       |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
       |      $e,
       |      '(?s)<!--.*?-->', ' ', 'g'),
       |      '(?si)<script\\b[^>]*>.*?</script[ \\t\\n\\r]*>', ' ', 'g'),
       |      '(?si)<style\\b[^>]*>.*?</style[ \\t\\n\\r]*>', ' ', 'g'),
       |      '<[^>]*>', ' ', 'g'),
       |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
       |  '[ \\t\\n\\r]+', ' ', 'g'))""".stripMargin

  /** Replay of `Curation.c4CleanLines(minWords = 5, requirePunct =
    * false)` over 8-word windows of `$src` (doc_id, text). Complete
    * SELECT, composable. */
  private def c4CleanSql(src: String): String =
    s"""SELECT doc_id, array_to_string(kept, chr(10)) AS text_clean,
       |  CAST(len(kept) AS BIGINT) AS n_kept,
       |  CAST(len(ls) - len(kept) AS BIGINT) AS n_dropped, doc_dropped
       |FROM (
       |  SELECT doc_id, ls,
       |    (contains(lower(text), 'lorem ipsum')
       |      OR contains(lower(text), '{')) AS doc_dropped,
       |    CASE WHEN contains(lower(text), 'lorem ipsum')
       |        OR contains(lower(text), '{') THEN CAST([] AS VARCHAR[])
       |    ELSE list_filter(ls, l ->
       |      len(list_filter(string_split_regex(l, '\\s+'), x -> x <> '')) >= 5
       |      AND NOT contains(lower(l), 'javascript')) END AS kept
       |  FROM (
       |    SELECT doc_id, text,
       |      CASE WHEN len(ws) > 0 THEN list_transform(
       |        generate_series(0, (len(ws)-1)//8),
       |        i -> array_to_string(list_slice(ws, i*8+1, i*8+8), ' '))
       |      ELSE CAST([] AS VARCHAR[]) END AS ls
       |    FROM (SELECT doc_id, text,
       |        list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS ws
       |      FROM $src) w) ln) k""".stripMargin

  /** Replay of `Curation.globalLineDedup` over `$lnSrc` (doc_id, ls):
    * row_number over (doc_id, pos) ≡ the engine's min(struct) winner.
    * Complete SELECT, composable. */
  /** DuckDB replay of [[Curation.exactSpanDedup]]: md5 l-gram
    * occurrence table, row_number first occurrence per gram (≡ the
    * engine's `min(struct(id, start))` — lexicographic either way),
    * covered-index fan-out, span count by lag-gap islands, per-doc
    * rebuild by covered-index anti-join. */
  private def spanDedupSql(src: String, l: Int): String =
    s"""WITH sd_toks AS (
       |  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
       |    x -> x <> '') AS w FROM $src),
       |sd_occ AS (
       |  SELECT doc_id, i AS s,
       |    md5(array_to_string(w[i:i+${l - 1}], ' ')) AS h
       |  FROM sd_toks, unnest(generate_series(1, len(w) - ${l - 1})) AS u(i)
       |  WHERE len(w) >= $l),
       |sd_mark AS (
       |  SELECT doc_id, s,
       |    row_number() OVER (PARTITION BY h ORDER BY doc_id, s) AS rn,
       |    count(*) OVER (PARTITION BY h) AS cnt FROM sd_occ),
       |sd_cov AS (
       |  SELECT DISTINCT doc_id, s + j AS ci
       |  FROM sd_mark, unnest(generate_series(0, ${l - 1})) AS v(j)
       |  WHERE cnt >= 2 AND rn > 1),
       |sd_covw AS (
       |  SELECT doc_id, ci,
       |    CASE WHEN lag(ci) OVER (PARTITION BY doc_id ORDER BY ci) = ci - 1
       |      THEN 0 ELSE 1 END AS isstart FROM sd_cov),
       |sd_covagg AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_removed,
       |    CAST(sum(isstart) AS BIGINT) AS n_spans
       |  FROM sd_covw GROUP BY doc_id),
       |sd_words AS (
       |  SELECT doc_id, j AS wi, w[j] AS word
       |  FROM sd_toks, unnest(generate_series(1, len(w))) AS g(j)),
       |sd_kept AS (
       |  SELECT wo.doc_id, string_agg(wo.word, ' ' ORDER BY wo.wi) AS text_dedup
       |  FROM sd_words wo LEFT JOIN sd_cov c
       |    ON wo.doc_id = c.doc_id AND wo.wi = c.ci
       |  WHERE c.ci IS NULL GROUP BY wo.doc_id)
       |SELECT t.doc_id AS doc_id, CAST(len(t.w) AS BIGINT) AS n_words,
       |  coalesce(ca.n_removed, CAST(0 AS BIGINT)) AS n_removed,
       |  coalesce(ca.n_spans, CAST(0 AS BIGINT)) AS n_spans,
       |  coalesce(k.text_dedup, '') AS text_dedup
       |FROM sd_toks t LEFT JOIN sd_covagg ca USING (doc_id)
       |LEFT JOIN sd_kept k USING (doc_id)""".stripMargin

  /** Char-granularity twin of [[spanDedupSql]]: md5 per char-l-gram
    * position, global firsts by (doc_id, start), covered-index fan-out,
    * island span count, per-char rebuild. */
  private def spanDedupCharsSql(src: String, l: Int): String =
    s"""WITH sc_docs AS (SELECT doc_id, text AS t FROM $src),
       |sc_occ AS (
       |  SELECT doc_id, i AS s, md5(substr(t, i, $l)) AS h
       |  FROM sc_docs, unnest(generate_series(1, length(t) - ${l - 1})) AS u(i)
       |  WHERE length(t) >= $l),
       |sc_mark AS (
       |  SELECT doc_id, s,
       |    row_number() OVER (PARTITION BY h ORDER BY doc_id, s) AS rn,
       |    count(*) OVER (PARTITION BY h) AS cnt FROM sc_occ),
       |sc_cov AS (
       |  SELECT DISTINCT doc_id, s + j AS ci
       |  FROM sc_mark, unnest(generate_series(0, ${l - 1})) AS v(j)
       |  WHERE cnt >= 2 AND rn > 1),
       |sc_covw AS (
       |  SELECT doc_id, ci,
       |    CASE WHEN lag(ci) OVER (PARTITION BY doc_id ORDER BY ci) = ci - 1
       |      THEN 0 ELSE 1 END AS isstart FROM sc_cov),
       |sc_covagg AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_removed,
       |    CAST(sum(isstart) AS BIGINT) AS n_spans
       |  FROM sc_covw GROUP BY doc_id),
       |sc_chars AS (
       |  SELECT doc_id, j AS wi, substr(t, j, 1) AS ch
       |  FROM sc_docs, unnest(generate_series(1, length(t))) AS g(j)),
       |sc_kept AS (
       |  SELECT ch0.doc_id, string_agg(ch0.ch, '' ORDER BY ch0.wi) AS text_dedup
       |  FROM sc_chars ch0 LEFT JOIN sc_cov c
       |    ON ch0.doc_id = c.doc_id AND ch0.wi = c.ci
       |  WHERE c.ci IS NULL GROUP BY ch0.doc_id)
       |SELECT d.doc_id AS doc_id, CAST(length(d.t) AS BIGINT) AS n_chars,
       |  coalesce(ca.n_removed, CAST(0 AS BIGINT)) AS n_removed,
       |  coalesce(ca.n_spans, CAST(0 AS BIGINT)) AS n_spans,
       |  coalesce(k.text_dedup, '') AS text_dedup
       |FROM sc_docs d LEFT JOIN sc_covagg ca USING (doc_id)
       |LEFT JOIN sc_kept k USING (doc_id)""".stripMargin

  private def lineDedupCoreSql(lnSrc: String): String =
    s"""SELECT $lnSrc.doc_id AS doc_id, coalesce(k.text_dedup, '') AS text_dedup,
       |  CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
       |  CAST(len($lnSrc.ls) - coalesce(k.n_kept, 0) AS BIGINT) AS n_dropped
       |FROM $lnSrc LEFT JOIN (
       |  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_dedup,
       |    count(*) AS n_kept
       |  FROM (SELECT doc_id, line, pos,
       |      row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
       |    FROM (SELECT doc_id, unnest(ls) AS line,
       |        generate_subscripts(ls, 1) AS pos FROM $lnSrc) l) r
       |  WHERE rn = 1 GROUP BY doc_id) k USING (doc_id)""".stripMargin

  /** DuckDB replay of the CountMin registers (depth 4 × width 256):
    * row-salted md5 nibble-parse buckets, grouped occurrence sums —
    * arithmetic-identical to `Sketch.cmsSketch`. Defines CTEs
    * `cms_rows` and `cms_reg`. */
  private def cmsSql(src: String, valueExpr: String): String = {
    val d = 4; val w = 256
    s"""cms_rows AS (SELECT unnest(range(0, $d)) AS row),
       |cms_h AS (SELECT r.row AS row,
       |  md5(concat(CAST(r.row AS VARCHAR), '|', CAST(e.$valueExpr AS VARCHAR))) AS m
       |  FROM $src e CROSS JOIN cms_rows r WHERE e.$valueExpr IS NOT NULL),
       |cms_reg AS (SELECT row, ($hash32Sql) % $w AS bucket,
       |  CAST(count(*) AS BIGINT) AS c FROM cms_h GROUP BY 1, 2)""".stripMargin
  }

  /** DuckDB replay of the HLL sketch + estimate (p = 6): the md5
    * nibble-parse hash, bucket/suffix bit split, comparison-sum ρ,
    * register max, exact scaled-BIGINT Σ2^−r, and the fixed IEEE
    * estimate expression — arithmetic-identical to
    * `Sketch.hllSketchGrouped`/`hllEstimateGrouped`. `groupSel` /
    * `groupBy` thread an optional group column through every stage. */
  private def hllSql(src: String, valueExpr: String,
                     group: Option[String]): String = {
    val p = 6; val width = 32 - p; val m = 1 << p
    val alphaM2 = 0.709 * (m.toLong * m).toDouble
    val gSel = group.map(g => s"$g, ").getOrElse("")
    val gCol = gSel
    val gBy = group.map(g => s"GROUP BY $g").getOrElse("")
    val gByWith = group.map(g => s"$g,").getOrElse("")
    val bitlen = (0 until width).map(k =>
      s"(CASE WHEN w >= ${1L << k} THEN 1 ELSE 0 END)").mkString(" + ")
    s"""hv AS (SELECT ${gSel}md5(CAST($valueExpr AS VARCHAR)) AS m FROM $src),
       |hb AS (SELECT $gCol($hash32Sql) AS h FROM hv),
       |reg AS (SELECT $gCol h >> $width AS bucket,
       |  h & ${(1L << width) - 1L} AS w FROM hb),
       |rr AS (SELECT $gCol bucket, max(${width + 1} - ($bitlen)) AS r
       |  FROM reg GROUP BY $gByWith bucket),
       |ag AS (SELECT $gCol count(*) AS nonempty,
       |  CAST(sum(CAST(1 AS BIGINT) << (32 - r)) AS BIGINT) AS s_ne
       |  FROM rr $gBy),
       |st AS (SELECT $gCol($m - nonempty) AS v_empty,
       |  ($m - nonempty) * ${1L << 32} + s_ne AS s_scaled FROM ag),
       |es AS (SELECT $gCol v_empty, s_scaled,
       |  CAST('$alphaM2' AS DOUBLE)
       |    / (CAST(s_scaled AS DOUBLE) / CAST('${(1L << 32).toDouble}' AS DOUBLE))
       |    AS raw FROM st),
       |hll AS (SELECT $gCol
       |  CASE WHEN raw <= CAST('${2.5 * m}' AS DOUBLE) AND v_empty > 0
       |    THEN CAST('${m.toDouble}' AS DOUBLE)
       |      * ln(CAST('${m.toDouble}' AS DOUBLE) / CAST(v_empty AS DOUBLE))
       |    ELSE raw END AS est_distinct, v_empty, s_scaled FROM es)""".stripMargin
  }

  /** Trailing-window HLL oracle (events_sliding_uniques): hourly
    * register tables (the hllSql construction keyed by epoch-hour),
    * register-max union over each trailing `win`-hour window, then the
    * identical estimate chain. */
  private def slidingHllSql(win: Int): String = {
    val p = 6; val width = 32 - p; val m = 1 << p
    val alphaM2 = 0.709 * (m.toLong * m).toDouble
    val bitlen = (0 until width).map(k =>
      s"(CASE WHEN w >= ${1L << k} THEN 1 ELSE 0 END)").mkString(" + ")
    s"""WITH hv AS (SELECT
       |  CAST(epoch(date_trunc('hour', ts)) AS BIGINT) // 3600 AS hh,
       |  md5(CAST(user_id AS VARCHAR)) AS m FROM events),
       |hb AS (SELECT hh, ($hash32Sql) AS h FROM hv),
       |reg AS (SELECT hh, h >> $width AS bucket,
       |  h & ${(1L << width) - 1L} AS w FROM hb),
       |rr AS (SELECT hh, bucket, max(${width + 1} - ($bitlen)) AS r
       |  FROM reg GROUP BY hh, bucket),
       |hrs AS (SELECT DISTINCT hh AS h FROM rr),
       |tr AS (SELECT hrs.h AS g, rr.bucket AS bucket, max(rr.r) AS r
       |  FROM rr JOIN hrs ON rr.hh <= hrs.h AND rr.hh > hrs.h - $win
       |  GROUP BY hrs.h, rr.bucket),
       |ag AS (SELECT g, count(*) AS nonempty,
       |  CAST(sum(CAST(1 AS BIGINT) << (32 - r)) AS BIGINT) AS s_ne
       |  FROM tr GROUP BY g),
       |st AS (SELECT g, ($m - nonempty) AS v_empty,
       |  ($m - nonempty) * ${1L << 32} + s_ne AS s_scaled FROM ag),
       |es AS (SELECT g, v_empty, s_scaled,
       |  CAST('$alphaM2' AS DOUBLE)
       |    / (CAST(s_scaled AS DOUBLE) / CAST('${(1L << 32).toDouble}' AS DOUBLE))
       |    AS raw FROM st)
       |SELECT g AS hour_idx,
       |  CASE WHEN raw <= CAST('${2.5 * m}' AS DOUBLE) AND v_empty > 0
       |    THEN CAST('${m.toDouble}' AS DOUBLE)
       |      * ln(CAST('${m.toDouble}' AS DOUBLE) / CAST(v_empty AS DOUBLE))
       |    ELSE raw END AS est_distinct, v_empty, s_scaled
       |FROM es ORDER BY hour_idx""".stripMargin
  }

  /** Fixed merge chain for the BPE-apply query (rank order matters:
    * later merges consume symbols fused by earlier ones — `th`+`e` only
    * exists because `t`+`h` ran first). */
  private val FixedBpeMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "e" -> "r", "an" -> "d")

  /** Fixed byte-level merge chain (hex-pair symbols): t+h, th+e,
    * space+the (leading space attaches to pre-tokens in byte-level
    * BPE, so " the" is a real fused token), i+n, e+r. */
  private val FixedByteBpeMerges: Seq[(String, String)] = Seq(
    "74" -> "68", "7468" -> "65", "20" -> "746865", "69" -> "6E", "65" -> "72")

  /** Unrolled-SQL replay of `Bpe.learnMergeTable(nMerges = n)`: the same
    * delimited-symbol representation (chr(2)sym-chr(3) wrapping), the
    * same literal left-to-right replace per merge, and the same
    * (count desc, left asc, right asc) argmax — each round is one CTE
    * block, the PageRank unrolled-iteration pattern applied to a learned
    * tokenizer. Words strip the chr(2)/chr(3) delimiters exactly as
    * `Bpe.wordCounts` does; `m_i` carries the engine's minPairCount=2
    * floor and the `coalesce(..., chr(1))` fallback makes an exhausted
    * round a literal no-op (replace of chr(1) with itself), so the
    * replay stays correct when the engine early-stops below n merges. */
  /** Per-round CTE blocks shared by the char- and byte-level learn
    * replays — only the `words`/`s0` base differs between the two. */
  private def bpeStepCtes(n: Int): Seq[String] = {
    val so = "chr(2)"; val sc = "chr(3)"
    (1 to n).map { i =>
      s"""p$i AS (
         |  SELECT ls[i] AS l, ls[i+1] AS r, CAST(sum(cnt) AS BIGINT) AS pc
         |  FROM (SELECT string_split(trim(syms, $so || $sc), $sc || $so) AS ls,
         |        cnt FROM s${i - 1}) v, unnest(range(1, len(ls))) AS u(i)
         |  GROUP BY 1, 2),
         |m$i AS (SELECT l, r, pc FROM p$i WHERE pc >= 2
         |  ORDER BY pc DESC, l ASC, r ASC LIMIT 1),
         |s$i AS (SELECT replace(syms,
         |  coalesce((SELECT $so || l || $sc || $so || r || $sc FROM m$i), chr(1)),
         |  coalesce((SELECT $so || l || r || $sc FROM m$i), chr(1))) AS syms,
         |  cnt FROM s${i - 1})"""
        .stripMargin
    }
  }

  private def bpeLearnCtes(n: Int): String = {
    val so = "chr(2)"; val sc = "chr(3)"
    val base =
      s"""words AS (
         |  SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT replace(replace(w0, $so, ''), $sc, '') AS w FROM (
         |      SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w0
         |      FROM documents) t0) t
         |  WHERE w <> '' GROUP BY w),
         |s0 AS (SELECT list_aggregate(list_transform(string_split(word, ''),
         |  c -> $so || c || $sc), 'string_agg', '') AS syms, cnt FROM words)"""
        .stripMargin
    (base +: bpeStepCtes(n)).mkString(",\n")
  }

  /** Byte-level base: regex pre-tokens (the engine's lookahead-free
    * `ByteBpe.PreTokenPattern`, injected verbatim so both regexes are
    * the same string), UTF-8 bytes as uppercase hex-pair symbols. Case
    * preserved, no delimiter strip (symbols are hex chars). The merge
    * rounds are byte-for-byte the char-level step CTEs. */
  private def byteBpeLearnCtes(n: Int): String = {
    val so = "chr(2)"; val sc = "chr(3)"
    val base =
      s"""words AS (
         |  SELECT w AS word, CAST(count(*) AS BIGINT) AS cnt FROM (
         |    SELECT unnest(regexp_extract_all(text,
         |      '${graft.operators.ByteBpe.PreTokenPattern}')) AS w
         |    FROM documents) t
         |  GROUP BY w),
         |s0 AS (SELECT list_aggregate(list_transform(
         |  regexp_extract_all(hex(encode(word)), '..'),
         |  c -> $so || c || $sc), 'string_agg', '') AS syms, cnt FROM words)"""
        .stripMargin
    (base +: bpeStepCtes(n)).mkString(",\n")
  }

  private def bpeMergeRanksSelect(n: Int): String =
    (1 to n).map(i =>
      s"SELECT CAST($i AS BIGINT) AS rank, l AS left_sym, r AS right_sym, " +
        s"pc AS pair_count FROM m$i").mkString(" UNION ALL ")

  private def bpeLearnSql(n: Int): String =
    s"WITH ${bpeLearnCtes(n)}\n${bpeMergeRanksSelect(n)} ORDER BY rank"

  /** Replay of `ByteBpe.learnMergeTable(nMerges = n)` — the byte-level
    * base under the shared merge-round CTEs. */
  private def byteBpeLearnSql(n: Int): String =
    s"WITH ${byteBpeLearnCtes(n)}\n${bpeMergeRanksSelect(n)} ORDER BY rank"

  /** Learned-vocabulary oracle: explode the post-merge symbol strings of
    * round n's vocab (s_n in the learn chain) weighted by word count —
    * learning AND application replayed in one statement. */
  private def bpeVocabSql(n: Int, limit: Int): String =
    s"""WITH ${bpeLearnCtes(n)},
       |sv AS (SELECT
       |    unnest(string_split(trim(syms, chr(2) || chr(3)), chr(3) || chr(2)))
       |      AS subword,
       |    cnt FROM s$n)
       |SELECT subword, CAST(sum(cnt) AS BIGINT) AS n FROM sv
       |GROUP BY subword ORDER BY n DESC, subword ASC LIMIT $limit""".stripMargin

  /** Shared CTE chain for BPE-apply oracles: per-doc space-joined token
    * stream `t` under the given merge chain (wrap → iterated literal
    * replace → unwrap), exactly `Bpe.symbolsToTokens ∘ applyMergesToWord`
    * over the filtered word list. */
  private def bpeStreamCtes(merges: Seq[(String, String)]): String = {
    val so = "chr(2)"; val sc = "chr(3)"
    val syms0 =
      s"list_aggregate(list_transform(string_split(w, ''), c -> $so || c || $sc), " +
        "'string_agg', '')"
    val chain = merges.foldLeft(syms0) { case (acc, (l, r)) =>
      s"replace($acc, $so || '$l' || $sc || $so || '$r' || $sc, $so || '$l$r' || $sc)"
    }
    s"""bpe_w AS (
       |  SELECT doc_id, list_filter(list_transform(
       |    string_split_regex(lower(text), '\\s+'),
       |    w -> replace(replace(w, $so, ''), $sc, '')),
       |    w -> w <> '') AS ws FROM documents),
       |bpe_t AS (
       |  SELECT doc_id, coalesce(list_aggregate(list_transform(ws,
       |    w -> trim(replace($chain, $sc || $so, ' '), $so || $sc)),
       |    'string_agg', ' '), '') AS t FROM bpe_w)""".stripMargin
  }

  /** Replay of `Bpe.tokenize` under [[FixedBpeMerges]]: identical
    * replace chain per word, identical token-stream join + md5. */
  /** Windowed co-occurrence CTEs ending in `co_x(a, b, x)` — the
    * [[graft.operators.Phrases.cooccurrence]] replay: harmonic
    * 1/distance weights, both directed entries, decimal-routed sums. */
  private def coocCtes(src: String, window: Int): String =
    s"""co_tok AS (
       |  SELECT list_filter(string_split_regex(
       |    replace(replace(lower(text), chr(2), ''), chr(3), ''), '\\s+'),
       |    x -> x <> '') AS t FROM $src),
       |co_p AS (
       |  SELECT t[i] AS a, t[i + d] AS b,
       |    CAST(1 AS DOUBLE) / CAST(d AS DOUBLE) AS w
       |  FROM co_tok,
       |    unnest(generate_series(1, len(t) - 1)) AS u(i),
       |    unnest(generate_series(1, least($window, len(t) - i))) AS v(d)
       |  WHERE len(t) >= 2),
       |co_b AS (
       |  SELECT a, b, w FROM co_p
       |  UNION ALL SELECT b AS a, a AS b, w FROM co_p),
       |co_x AS (SELECT a, b, ${sparkDecSumToDouble("w")} AS x
       |  FROM co_b GROUP BY a, b)""".stripMargin

  /** Shared collocation CTEs (`ph_tok`/`ph_uni`/`ph_bi`/`ph_sc`):
    * cleaned tokens, exact unigram/adjacent-pair counts, and the
    * δ-discounted score — one IEEE division of exact BIGINTs,
    * arithmetic-identical to [[graft.operators.Phrases.collocations]]. */
  private def phrasesScoreCtes(src: String, delta: Int, minCount: Int,
                               pfx: String = "ph"): String =
    s"""${pfx}_tok AS (
       |  SELECT doc_id, list_filter(string_split_regex(
       |    replace(replace(lower(text), chr(2), ''), chr(3), ''), '\\s+'),
       |    x -> x <> '') AS t FROM $src),
       |${pfx}_uni AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt
       |  FROM (SELECT unnest(t) AS w FROM ${pfx}_tok) GROUP BY w),
       |${pfx}_bi AS (SELECT t[i] AS a, t[i + 1] AS b,
       |    CAST(count(*) AS BIGINT) AS pair_cnt
       |  FROM ${pfx}_tok, unnest(generate_series(1, len(t) - 1)) AS u(i)
       |  WHERE len(t) >= 2 GROUP BY 1, 2),
       |${pfx}_sc AS (SELECT a, b, pair_cnt, ua.cnt AS cnt_a, ub.cnt AS cnt_b,
       |    CAST(pair_cnt - $delta AS DOUBLE)
       |      / CAST(ua.cnt * ub.cnt AS DOUBLE) AS score
       |  FROM ${pfx}_bi JOIN ${pfx}_uni ua ON a = ua.w
       |  JOIN ${pfx}_uni ub ON b = ub.w
       |  WHERE pair_cnt >= $minCount)""".stripMargin

  /** Replay of topPhrases + applyPhrases: rank CTE, then one replace
    * round per CTE (scalar subqueries pull phrase k's words; a missing
    * rank NULLs the pattern and the coalesce makes the round a no-op),
    * then the delimiter unwrap and token accounting. */
  /** The learn + rewrite CTE chain (`ph_tok` … `ph_f`), parameterized
    * over the (doc_id, text) source relation so flagships can feed a
    * curated intermediate through it. */
  private def phrasesApplyCtes(k: Int, delta: Int, minCount: Int,
                               src: String, pfx: String = "ph"): String = {
    def sub(c: String, i: Int) = s"(SELECT $c FROM ${pfx}_rank WHERE rn = $i)"
    val rounds = (1 to k).map { i =>
      s"""${pfx}_m$i AS (SELECT doc_id, t, coalesce(replace(s,
         |  chr(2) || ${sub("a", i)} || chr(3) || chr(2) || ${sub("b", i)} || chr(3),
         |  chr(2) || ${sub("a", i)} || '_' || ${sub("b", i)} || chr(3)), s) AS s
         |  FROM ${pfx}_m${i - 1})""".stripMargin
    }.mkString(",\n")
    s"""${phrasesScoreCtes(src, delta, minCount, pfx)},
       |${pfx}_rank AS MATERIALIZED (SELECT a, b,
       |    row_number() OVER (ORDER BY score DESC, a, b) AS rn
       |  FROM ${pfx}_sc QUALIFY rn <= $k),
       |${pfx}_m0 AS (SELECT doc_id, t,
       |    coalesce(list_aggregate(list_transform(t,
       |      x -> chr(2) || x || chr(3)), 'string_agg', ''), '') AS s
       |  FROM ${pfx}_tok),
       |$rounds,
       |${pfx}_f AS (SELECT doc_id, t,
       |    trim(replace(s, chr(3) || chr(2), ' '), chr(2) || chr(3)) AS text_phr
       |  FROM ${pfx}_m$k)""".stripMargin
  }

  private def phrasesApplySql(k: Int, delta: Int, minCount: Int): String =
    s"""WITH ${phrasesApplyCtes(k, delta, minCount, "documents")}
       |SELECT doc_id, text_phr, CAST(len(t) AS BIGINT) AS n_tokens,
       |  CAST(len(t) - (CASE WHEN text_phr = '' THEN 0
       |    ELSE len(string_split(text_phr, ' ')) END) AS BIGINT) AS n_merges
       |FROM ph_f ORDER BY doc_id""".stripMargin

  private def bpeApplySql(merges: Seq[(String, String)]): String =
    s"""WITH ${bpeStreamCtes(merges)}
       |SELECT doc_id,
       |  CASE WHEN t = '' THEN CAST(0 AS BIGINT)
       |       ELSE CAST(len(string_split(t, ' ')) AS BIGINT) END AS n_bpe_tokens,
       |  md5(t) AS tokens_md5
       |FROM bpe_t ORDER BY doc_id""".stripMargin

  /** Replay of `ByteBpe.tokenize`: pre-token list → hex-pair symbol
    * wrap → identical replace chain → unwrap to the space-joined hex
    * token stream, counted and md5'd exactly like the char-level apply. */
  private def byteBpeApplySql(merges: Seq[(String, String)]): String = {
    val so = "chr(2)"; val sc = "chr(3)"
    val syms0 =
      s"list_aggregate(list_transform(regexp_extract_all(hex(encode(w)), '..'), " +
        s"c -> $so || c || $sc), 'string_agg', '')"
    val chain = merges.foldLeft(syms0) { case (acc, (l, r)) =>
      s"replace($acc, $so || '$l' || $sc || $so || '$r' || $sc, $so || '$l$r' || $sc)"
    }
    s"""WITH bpe_w AS (
       |  SELECT doc_id, regexp_extract_all(text,
       |    '${graft.operators.ByteBpe.PreTokenPattern}') AS ws FROM documents),
       |bpe_t AS (
       |  SELECT doc_id, coalesce(list_aggregate(list_transform(ws,
       |    w -> trim(replace($chain, $sc || $so, ' '), $so || $sc)),
       |    'string_agg', ' '), '') AS t FROM bpe_w)
       |SELECT doc_id,
       |  CASE WHEN t = '' THEN CAST(0 AS BIGINT)
       |       ELSE CAST(len(string_split(t, ' ')) AS BIGINT) END AS n_bpe_tokens,
       |  md5(t) AS tokens_md5
       |FROM bpe_t ORDER BY doc_id""".stripMargin
  }

  /** Tokenizer-aware packing oracle: the BPE token count feeds the same
    * window-tiling replay `pack_windows` uses. */
  private def bpeWindowsSql(merges: Seq[(String, String)],
                            capacity: Long): String =
    s"""WITH ${bpeStreamCtes(merges)},
       |toks AS (SELECT doc_id,
       |  CASE WHEN t = '' THEN CAST(0 AS BIGINT)
       |       ELSE CAST(len(string_split(t, ' ')) AS BIGINT) END AS n_tok
       |  FROM bpe_t),
       |c AS (SELECT doc_id, n_tok,
       |  CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
       |    AS cum FROM toks),
       |w AS (SELECT doc_id, n_tok, cum,
       |  unnest(generate_series(cum // $capacity, (cum + n_tok - 1) // $capacity))
       |    AS win_id
       |  FROM c WHERE n_tok > 0)
       |SELECT doc_id, n_tok, win_id,
       |  CAST(greatest(0, cum - win_id * $capacity) AS BIGINT) AS win_offset,
       |  CAST(greatest(0, win_id * $capacity - cum) AS BIGINT) AS slice_start,
       |  CAST(least(cum + n_tok, (win_id + 1) * $capacity)
       |    - greatest(cum, win_id * $capacity) AS BIGINT) AS slice_len
       |FROM w ORDER BY doc_id, win_id""".stripMargin

  /** MinHash-LSH candidate-pair oracle (shared with pipeline_curate). */
  /** MinHash-LSH pair oracle — mirrors the engine's hot-bucket guard
    * (`keepb`: band buckets holding more than [[DedupMaxBucket]] docs
    * are dropped, exactly as `Dedup.minhashLshPairs(maxBucket)` does). */
  private def minhashLshSql: String =
    s"""WITH toks AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS ts FROM documents),
      |ws AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    generate_series(1, greatest(len(ts)-2, 1)),
      |    i -> concat_ws(' ', ts[i], ts[i+1], ts[i+2]))) AS w FROM toks),
      |sig AS (
      |  SELECT doc_id, list_transform(generate_series(0, 7),
      |    s -> list_min(list_transform(w,
      |      t -> substr(md5(concat(CAST(s // 4 AS VARCHAR), '|', t)),
      |                  (s % 4) * 8 + 1, 8)))) AS mh FROM ws),
      |bands AS (
      |  SELECT doc_id, u.band_id,
      |    md5(array_to_string(mh[u.band_id*2+1 : u.band_id*2+2], '|')) AS bh
      |  FROM sig, unnest(generate_series(0, 3)) AS u(band_id)),
      |keepb AS (
      |  SELECT band_id, bh FROM bands GROUP BY band_id, bh
      |  HAVING count(DISTINCT doc_id) BETWEEN 2 AND $DedupMaxBucket),
      |pairs AS (
      |  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      |  FROM bands x JOIN bands y
      |  ON x.band_id = y.band_id AND x.bh = y.bh AND x.doc_id < y.doc_id
      |  JOIN keepb k ON x.band_id = k.band_id AND x.bh = k.bh)
      |SELECT a, b FROM pairs ORDER BY a, b""".stripMargin

  /** Quality-signals oracle (shared with pipeline_curate). */
  /** SQ8 oracle CTE chain — per-dim exact min/max grid, closed-form
    * encode, mirroring [[Sq.train]]/[[Sq.encodeColumn]] operation by
    * operation. Yields `sq_arr(mns, dfs)` and `sq_enc(vec_id, code)`. */
  private def sqOracleCtes: String = {
    val dim = OracleSql.Dim
    s"""sq_stats AS (
       |  SELECT i, CAST(min(v) AS DOUBLE) AS mn,
       |    CAST(max(v) AS DOUBLE) - CAST(min(v) AS DOUBLE) AS df
       |  FROM (SELECT unnest(embedding) AS v,
       |        generate_subscripts(embedding, 1) AS i FROM embeddings)
       |  GROUP BY i),
       |sq_arr AS (SELECT list(mn ORDER BY i) AS mns, list(df ORDER BY i) AS dfs
       |  FROM sq_stats),
       |sq_enc AS (
       |  SELECT vec_id, label, list_transform(generate_series(1, $dim), i ->
       |    CASE WHEN dfs[i] = 0.0 THEN 0
       |    ELSE CAST(greatest(0, least(255, floor(
       |      (CAST(embedding[i] AS DOUBLE) - mns[i]) / dfs[i] * 255.0 + 0.5)))
       |      AS INTEGER) END) AS code
       |  FROM embeddings CROSS JOIN sq_arr)""".stripMargin
  }

  /** Shared CTE chain for the ngram-Jaccard pair graph + recursive
    * connected-components walk (DuckDB mirror of
    * `Dedup.ngramJaccardPairs` + `Dedup.connectedComponents`); yields
    * CTE `walk(id, comp)` — callers GROUP BY id / min(comp). */
  /** Profiling oracle: the same single-aggregate-row → UNION ALL
    * unpivot, metric expressions mirrored per column type. */
  private def profileSql: String = {
    def num(c: String) = Seq(
      "n_nonnull" -> s"CAST(count($c) AS DOUBLE)",
      "n_distinct" -> s"CAST(count(DISTINCT $c) AS DOUBLE)",
      "min" -> s"CAST(min($c) AS DOUBLE)",
      "max" -> s"CAST(max($c) AS DOUBLE)",
      "avg" -> s"CAST(CAST(SUM(CAST($c AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) / count($c)")
    def str(c: String) = Seq(
      "n_nonnull" -> s"CAST(count($c) AS DOUBLE)",
      "n_distinct" -> s"CAST(count(DISTINCT $c) AS DOUBLE)",
      "min_len" -> s"CAST(min(length($c)) AS DOUBLE)",
      "max_len" -> s"CAST(max(length($c)) AS DOUBLE)",
      "avg_len" -> s"CAST(CAST(SUM(CAST(length($c) AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE) / count($c)")
    val cols: Seq[(String, Seq[(String, String)])] = Seq(
      "doc_id" -> num("doc_id"), "lang" -> str("lang"),
      "n_chars" -> num("n_chars"), "text" -> str("text"))
    val aggExprs = cols.flatMap { case (c, ms) =>
      ms.map { case (m, e) => s"""$e AS "$c::$m"""" }
    }.mkString(",\n")
    val unions = cols.flatMap { case (c, ms) =>
      ms.map { case (m, _) =>
        s"""SELECT '$c' AS col_name, '$m' AS metric, "$c::$m" AS value FROM a"""
      }
    }.mkString("\nUNION ALL\n")
    s"""WITH a AS (
       |SELECT
       |$aggExprs
       |FROM documents)
       |$unions
       |ORDER BY col_name, metric""".stripMargin
  }

  /** PageRank oracle: the jaccard pair CTEs + 5 unrolled power
    * iterations. Constants interpolate through CAST('<toString>' AS
    * DOUBLE) so both engines start from the identical IEEE-754 values
    * (1 − 0.85 is NOT the literal 0.15); neighbor sums go through
    * DECIMAL(38,18) exactly as the Spark plan does. */
  private def pagerankSql: String = {
    val d = 0.85
    val iters = 5
    val dS = s"CAST('$d' AS DOUBLE)"
    val oneMinus = s"CAST('${1.0 - d}' AS DOUBLE)"
    val iterCtes = (1 to iters).map { k =>
      val prev = s"r${k - 1}"
      s"""s$k AS (
         |  SELECT e.dst AS id,
         |    ${sparkDecSumToDouble(s"$prev.r / CAST(dg.deg AS DOUBLE)")} AS s
         |  FROM edges e JOIN dg ON e.src = dg.src JOIN $prev ON $prev.id = e.src
         |  GROUP BY 1),
         |r$k AS (
         |  SELECT n.id,
         |    $oneMinus / CAST(nn.n AS DOUBLE) +
         |      $dS * coalesce(s$k.s, CAST(0.0 AS DOUBLE)) AS r
         |  FROM nodes n CROSS JOIN nn LEFT JOIN s$k ON n.id = s$k.id)""".stripMargin
    }.mkString(",\n")
    s"""WITH $jaccardCtes,
       |pairs AS (SELECT a, b FROM jpairs),
       |edges AS MATERIALIZED (
       |  SELECT a AS src, b AS dst FROM pairs
       |  UNION SELECT b AS src, a AS dst FROM pairs),
       |dg AS MATERIALIZED (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
       |nodes AS (SELECT DISTINCT src AS id FROM edges),
       |nn AS (SELECT count(*) AS n FROM nodes),
       |r0 AS (SELECT id, CAST(1.0 AS DOUBLE) / CAST(nn.n AS DOUBLE) AS r
       |       FROM nodes CROSS JOIN nn),
       |$iterCtes
       |SELECT id AS doc_id, r FROM r$iters ORDER BY doc_id""".stripMargin
  }

  /** Unrolled greedy k-center oracle: round i's argmax CTE (c_i) feeds
    * round i's least-update CTE (d_i); every distance is the same
    * left-associative double fold the engine's codegen kernel executes
    * ([[graft.core.OracleSql.l2]]), min-id seed and ascending-id
    * tie-break mirror `Diversity.kCenter` — so the whole 8-round
    * trajectory replays bit-exactly. */
  /** MMR rerank oracle: exact top-`c` cosine candidates, then `k`
    * unrolled greedy rounds — round i picks argmax(λ·rel − (1−λ)·ms)
    * with (score DESC, id ASC) ties, and the next round's remaining
    * set updates ms through `greatest` exactly as the driver's
    * `Math.max` accumulation. λ = 0.5 as a string-cast double literal
    * (the bare-decimal trap, OracleSql scaladoc). */
  private def mmrSql(c: Int, k: Int): String = {
    val L = "CAST('0.5' AS DOUBLE)"
    val sb = new StringBuilder
    sb ++= OracleSql.queryCte(QueryVecId)
    sb ++= s""",
      |cand AS (
      |  SELECT e.vec_id AS id, e.embedding AS emb,
      |    ${OracleSql.cosineSim("e.embedding", "q.qe")} AS rel
      |  FROM embeddings e CROSS JOIN q
      |  ORDER BY rel DESC, id ASC LIMIT $c),
      |m1 AS (SELECT id, emb, rel, $L * rel AS score FROM cand
      |       ORDER BY rel DESC, id ASC LIMIT 1),
      |r1 AS (SELECT c.id, c.emb, c.rel,
      |    ${OracleSql.cosineSim("c.emb", "m1.emb")} AS ms
      |  FROM cand c CROSS JOIN m1 WHERE c.id <> m1.id)""".stripMargin
    for (i <- 2 to k) {
      sb ++= s""",
        |m$i AS (SELECT id, emb, rel, ms, $L * rel - $L * ms AS score
        |  FROM r${i - 1} ORDER BY score DESC, id ASC LIMIT 1)""".stripMargin
      if (i < k)
        sb ++= s""",
          |r$i AS (SELECT r.id, r.emb, r.rel,
          |    greatest(r.ms, ${OracleSql.cosineSim("r.emb", s"m$i.emb")}) AS ms
          |  FROM r${i - 1} r CROSS JOIN m$i WHERE r.id <> m$i.id)""".stripMargin
    }
    sb ++= "\nSELECT mmr_rank, id AS vec_id, rel, score FROM (\n"
    sb ++= "SELECT CAST(1 AS BIGINT) AS mmr_rank, id, rel, score FROM m1"
    for (i <- 2 to k)
      sb ++= s"\nUNION ALL SELECT CAST($i AS BIGINT), id, rel, score FROM m$i"
    sb ++= ") ORDER BY mmr_rank"
    sb.toString
  }

  private def kcenterCtes(k: Int): String = {
    val sb = new StringBuilder
    sb ++= "WITH s AS (SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 1),\n"
    sb ++= s"d1 AS (SELECT e.vec_id AS id, e.embedding AS emb, ${OracleSql.l2("e.embedding", "s.embedding")} AS md FROM embeddings e CROSS JOIN s)"
    for (i <- 2 to k) {
      sb ++= s",\nc$i AS (SELECT id, emb, md FROM d${i - 1} WHERE md > 0 ORDER BY md DESC, id ASC LIMIT 1)"
      if (i < k)
        sb ++= s",\nd$i AS (SELECT d${i - 1}.id, d${i - 1}.emb, least(d${i - 1}.md, ${OracleSql.l2(s"d${i - 1}.emb", s"c$i.emb")}) AS md FROM d${i - 1} CROSS JOIN c$i)"
    }
    sb.toString
  }

  /** Per-cell k-center oracle: fixed-centroid assignment argmin (the
    * o6_ivf_fixed pattern), largest-remainder budget apportionment in
    * exact integer arithmetic, then the greedy rounds unrolled with a
    * PARTITION BY cell argmax — round i selects, per cell still under
    * budget, the farthest survivor; the distance update left-joins so
    * exhausted cells pass through. Mirrors
    * [[graft.operators.Diversity.kCenterPerCell]] round for round. */
  private def kcenterCellsSql(k: Int): String = {
    val lv = fixedIvfCentroids.indices
      .map(j => s"(${ivfAssignDistSql(j)})").mkString(", ")
    // MATERIALIZED: c_i and d_i each reference d_{i-1}; inlined, the
    // depth-16 chain duplicates 2^16-fold and DuckDB 1.0 never finishes
    // even on 500 rows
    val sb = new StringBuilder
    sb ++= s"""WITH cells AS MATERIALIZED (SELECT vec_id AS id, embedding AS emb,
      |  CAST(list_position(lvv, list_min(lvv)) - 1 AS BIGINT) AS cell
      |  FROM (SELECT vec_id, embedding, list_value($lv) AS lvv FROM embeddings)),
      |bm AS (SELECT cell, count(*) AS nc FROM cells GROUP BY cell),
      |tot AS (SELECT sum(nc) AS n FROM bm),
      |qt AS (SELECT cell, ($k * nc) // n AS fl, ($k * nc) % n AS rem FROM bm, tot),
      |qr AS (SELECT cell, fl,
      |  row_number() OVER (ORDER BY rem DESC, cell ASC) AS rk FROM qt),
      |lo AS (SELECT $k - sum(fl) AS leftover FROM qt),
      |bud AS MATERIALIZED (SELECT cell,
      |  fl + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS b FROM qr, lo),
      |s1 AS MATERIALIZED (SELECT c.cell, c.id, c.emb FROM cells c
      |  JOIN (SELECT cell, min(id) AS mid FROM cells GROUP BY cell) m
      |    ON c.cell = m.cell AND c.id = m.mid
      |  JOIN bud ON bud.cell = c.cell AND bud.b >= 1),
      |d1 AS MATERIALIZED (SELECT c.cell, c.id, c.emb, ${OracleSql.l2("c.emb", "s.emb")} AS md
      |  FROM cells c JOIN s1 s ON c.cell = s.cell)""".stripMargin
    for (i <- 2 to k) {
      sb ++= s""",
        |c$i AS MATERIALIZED (SELECT cell, id, emb, md FROM (
        |  SELECT d.cell, d.id, d.emb, d.md,
        |    row_number() OVER (PARTITION BY d.cell ORDER BY d.md DESC, d.id ASC) AS rn
        |  FROM d${i - 1} d JOIN bud ON bud.cell = d.cell AND bud.b >= $i
        |  WHERE d.md > 0) WHERE rn = 1)""".stripMargin
      if (i < k)
        sb ++= s""",
          |d$i AS MATERIALIZED (SELECT d.cell, d.id, d.emb,
          |  CASE WHEN c.id IS NULL THEN d.md
          |  ELSE least(d.md, ${OracleSql.l2("d.emb", "c.emb")}) END AS md
          |  FROM d${i - 1} d LEFT JOIN c$i c ON d.cell = c.cell)""".stripMargin
    }
    sb ++= "\nSELECT cell, sel_rank, vec_id, dist FROM (\n"
    sb ++= "SELECT cell, CAST(1 AS BIGINT) AS sel_rank, id AS vec_id, " +
      "CAST(0 AS DOUBLE) AS dist FROM s1"
    for (i <- 2 to k)
      sb ++= s"\nUNION ALL SELECT cell, CAST($i AS BIGINT), id, md FROM c$i"
    sb ++= ") ORDER BY cell, sel_rank"
    sb.toString
  }

  private def kcenterSql(k: Int): String = {
    val sb = new StringBuilder
    sb ++= kcenterCtes(k)
    sb ++= "\nSELECT sel_rank, vec_id, dist FROM (\n"
    sb ++= "SELECT CAST(1 AS BIGINT) AS sel_rank, (SELECT vec_id FROM s) AS vec_id, CAST(0 AS DOUBLE) AS dist"
    for (i <- 2 to k)
      sb ++= s"\nUNION ALL SELECT CAST($i AS BIGINT), id, md FROM c$i"
    sb ++= ") ORDER BY sel_rank"
    sb.toString
  }

  /** Nearest-selected-center cover oracle: the k-center CTE chain, then
    * every row's squared distance to each center in a list —
    * `list_position(lv, list_min(lv))` is the same first-match argmin
    * as the codegen NearestCentroid kernel (both compare SQUARED
    * distances; the reported distance takes sqrt after). */
  private def kcenterCoverSql(k: Int): String = {
    val centers = ("s.embedding", "s.vec_id") +:
      (2 to k).map(i => (s"c$i.emb", s"c$i.id"))
    val lv = centers.map(c => OracleSql.l2Sq("e.embedding", c._1))
      .mkString("list_value(", ", ", ")")
    val cids = centers.map(_._2).mkString("[", ", ", "]")
    val joins = "embeddings e CROSS JOIN s" +
      (2 to k).map(i => s" CROSS JOIN c$i").mkString
    s"""${kcenterCtes(k)},
       |sel AS (SELECT e.vec_id, $lv AS lv, $cids AS cids FROM $joins)
       |SELECT vec_id, cids[list_position(lv, list_min(lv))] AS center_id,
       |  sqrt(lv[list_position(lv, list_min(lv))]) AS center_dist
       |FROM sel ORDER BY vec_id""".stripMargin
  }

  private def clustersCtes: String =
    s"""WITH RECURSIVE $jaccardCtes,
      |pairs AS (SELECT a, b FROM jpairs),
      |edges AS (
      |  SELECT a AS src, b AS dst FROM pairs
      |  UNION SELECT b AS src, a AS dst FROM pairs),
      |walk(id, comp) AS (
      |  SELECT src, src FROM edges
      |  UNION
      |  SELECT e.dst, w.comp FROM walk w
      |  JOIN edges e ON e.src = w.id WHERE w.comp < e.dst)""".stripMargin

  /** Shared guarded word-3-gram Jaccard CTE chain — the DuckDB mirror
    * of `Dedup.ngramJaccardPairs(n = 3, threshold = 0.5, maxDocFreq =
    * DedupMaxDocFreq)`: grams over the df-filtered universe (keepg, the
    * stopgram cutoff), set sizes recomputed AFTER the filter, and
    * jpairs(a, b, jaccard) at threshold 0.5. */
  private def jaccardCtes: String =
    s"""toks AS (
       |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS ts FROM documents),
       |grams0 AS (
       |  SELECT doc_id, unnest(list_distinct(list_transform(
       |    generate_series(1, greatest(len(ts)-2, 1)),
       |    i -> concat_ws(' ', ts[i], ts[i+1], ts[i+2])))) AS g FROM toks),
       |keepg AS (SELECT g FROM grams0 GROUP BY g
       |          HAVING count(DISTINCT doc_id) <= $DedupMaxDocFreq),
       |grams AS MATERIALIZED (SELECT grams0.doc_id, grams0.g
       |          FROM grams0 JOIN keepg ON grams0.g = keepg.g),
       |sz AS (SELECT doc_id, count(*) AS s FROM grams GROUP BY doc_id),
       |inter AS (
       |  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
       |  FROM grams x JOIN grams y ON x.g = y.g AND x.doc_id < y.doc_id
       |  GROUP BY 1, 2),
       |jpairs AS MATERIALIZED (
       |  SELECT a, b,
       |    CAST(i AS DOUBLE) / CAST(sa.s + sb.s - i AS DOUBLE) AS jaccard
       |  FROM inter JOIN sz sa ON a = sa.doc_id JOIN sz sb ON b = sb.doc_id
       |  WHERE CAST(i AS DOUBLE) / CAST(sa.s + sb.s - i AS DOUBLE) >= 0.5)""".stripMargin

  private def qualitySql: String = {
    val nTok = """len(string_split_regex(text, '\s+'))"""
    val punct = """CAST(length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS DOUBLE) / CAST(greatest(length(text), 1) AS DOUBLE)"""
    val enList = TextFunctions.langMarkers("en").map(m => s"'$m'").mkString("[", ", ", "]")
    val stop = s"""CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), t -> list_contains($enList, t))) AS DOUBLE) / CAST(greatest($nTok, 1) AS DOUBLE)"""
    s"""SELECT doc_id,
       |CAST($nTok AS BIGINT) AS n_tokens_q,
       |$punct AS punct_ratio,
       |$stop AS stopword_ratio,
       |least(CAST($nTok AS DOUBLE) / 64.0, 1.0) * 0.5
       | + (1.0 - least(($punct) * 4.0, 1.0)) * 0.3
       | + least(($stop) * 5.0, 1.0) * 0.2 AS quality
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Curation-pipeline oracle: the component oracles composed as
    * subqueries — language gate, quality gate, exact-dup keep-first,
    * near-dup loser removal. */
  private def curateSql: String =
    s"""SELECT d.doc_id, l.lang_pred, q.quality
       |FROM documents d
       |JOIN ($langIdSql) l ON d.doc_id = l.doc_id
       |JOIN ($qualitySql) q ON d.doc_id = q.doc_id
       |WHERE l.lang_pred = 'en' AND q.quality >= 0.5
       |AND d.doc_id IN (
       |  SELECT min(doc_id) FROM documents GROUP BY md5(text))
       |AND d.doc_id NOT IN (SELECT b FROM ($minhashLshSql) p)
       |ORDER BY d.doc_id""".stripMargin

  /** md5 hex nibble j (1-based) of column `m` as BIGINT — DuckDB's
    * strpos parse, exactly what conv() computes in Spark. */
  private def mdNib(j: Int): String =
    s"CAST(strpos('0123456789abcdef', substr(m, $j, 1)) - 1 AS BIGINT)"

  /** First-8-hex-chars value of md5 column `m` (the bucket hash). */
  private def mdValue: String =
    (1 to 8).map(j => s"${mdNib(j)} * ${1L << (4 * (8 - j))}").mkString(" + ")

  /** Hashing-embedder oracle: md5-hex → bucket/sign parsed per nibble
    * with strpos (DuckDB) exactly as conv() parses it in Spark. */
  private def embedOracleSql: String = {
    def nib(j: Int) = mdNib(j)
    val value = mdValue
    val comps = (0 until 8).map(i =>
      s"sum(CASE WHEN bucket = $i THEN c ELSE 0 END) AS c$i").mkString(",\n")
    val outs = (0 until 8).map(i =>
      s"coalesce(c$i / sqrt(norm_sq), 0.0) AS d$i").mkString(",\n")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS t
       |  FROM documents),
       |h AS (SELECT doc_id, md5(t) AS m FROM tok WHERE t <> ''),
       |bs AS (SELECT doc_id, ($value) % 64 AS bucket,
       |  CASE WHEN (${nib(9)}) % 2 = 0 THEN 1.0 ELSE -1.0 END AS sign FROM h),
       |c AS (SELECT doc_id, bucket, sum(sign) AS c FROM bs GROUP BY 1, 2),
       |a AS (SELECT doc_id, sum(c*c) AS norm_sq,
       |$comps
       |FROM c GROUP BY 1)
       |SELECT d.doc_id, coalesce(norm_sq, 0.0) AS norm_sq,
       |$outs
       |FROM documents d LEFT JOIN a ON d.doc_id = a.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  /** E2 search oracle: the md5-count embedder for every doc, the query's
    * count vector generated driver-side from the SAME Scala hash
    * ([[graft.functions.HashingEmbedder.md5CountsLocal]]) and inlined as
    * VALUES. All counts are exact integers, so dot/norm sums are
    * order-independent and the final 1 - dot/(nd*nq) rounds identically
    * in both engines. */
  /** MaxSim oracle: windows → per-window md5-count sparse vectors →
    * per-segment max cosine → summed score. All arithmetic is exact
    * integer sums under sqrt/divide with the operand order matching the
    * Spark plan, so scores hash-match bit for bit. Windows whose bucket
    * counts fully cancel (nsq = 0) are excluded on both sides. */
  private def maxsimSql: String = {
    val width = 64
    val qparts = MaxsimQuerySegments.map(HashingEmbedder.md5CountsLocal(_, 64))
    val qCtes = qparts.zipWithIndex.map { case (qc, i) =>
      val vals = qc.zipWithIndex.collect {
        case (c, b) if c != 0.0 => s"($b, $c)"
      }.mkString(", ")
      s"qv$i AS (SELECT * FROM (VALUES $vals) AS t(bucket, qc))"
    }.mkString(",\n")
    val simCtes = qparts.zipWithIndex.map { case (qc, i) =>
      val qnsq = qc.map(c => c * c).sum
      s"""dp$i AS (SELECT c.doc_id, c.k, sum(c.c * qv$i.qc) AS dotv
         |  FROM c JOIN qv$i ON c.bucket = qv$i.bucket GROUP BY 1, 2),
         |mx$i AS (SELECT nd.doc_id,
         |    max((coalesce(dp$i.dotv, 0.0) + 0.0) /
         |      (sqrt(nd.nsq) * sqrt(CAST($qnsq AS DOUBLE)))) AS mx
         |  FROM nd LEFT JOIN dp$i ON nd.doc_id = dp$i.doc_id AND nd.k = dp$i.k
         |  WHERE nd.nsq > 0 GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    val scoreExpr = qparts.indices.map(i => s"mx$i.mx").mkString(" + ")
    val joins = qparts.indices.drop(1)
      .map(i => s"JOIN mx$i ON mx0.doc_id = mx$i.doc_id").mkString("\n")
    s"""WITH win AS (
       |  SELECT doc_id, k, substr(text, k * $width + 1, $width) AS wt
       |  FROM (SELECT doc_id, text, unnest(generate_series(0,
       |      greatest(CAST(ceil(length(text) / $width.0) AS INT) - 1, 0))) AS k
       |    FROM documents)),
       |tok AS (
       |  SELECT doc_id, k, unnest(string_split_regex(lower(wt), '\\s+')) AS t
       |  FROM win),
       |h AS (SELECT doc_id, k, md5(t) AS m FROM tok WHERE t <> ''),
       |bs AS (SELECT doc_id, k, ($mdValue) % 64 AS bucket,
       |  CASE WHEN (${mdNib(9)}) % 2 = 0 THEN 1.0 ELSE -1.0 END AS sign FROM h),
       |c AS (SELECT doc_id, k, bucket, sum(sign) AS c FROM bs GROUP BY 1, 2, 3),
       |nd AS (SELECT doc_id, k, sum(c * c) AS nsq FROM c GROUP BY 1, 2),
       |$qCtes,
       |$simCtes
       |SELECT mx0.doc_id AS doc_id, $scoreExpr AS score
       |FROM mx0
       |$joins
       |ORDER BY score DESC, doc_id ASC LIMIT 10""".stripMargin
  }

  private def embedSearchSql: String = {
    val qc = HashingEmbedder.md5CountsLocal(EmbedQueryText, 64)
    val qNormSq = qc.map(c => c * c).sum
    val qVals = qc.zipWithIndex.collect {
      case (c, b) if c != 0.0 => s"($b, $c)"
    }.mkString(", ")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS t
       |  FROM documents),
       |h AS (SELECT doc_id, md5(t) AS m FROM tok WHERE t <> ''),
       |bs AS (SELECT doc_id, ($mdValue) % 64 AS bucket,
       |  CASE WHEN (${mdNib(9)}) % 2 = 0 THEN 1.0 ELSE -1.0 END AS sign FROM h),
       |c AS (SELECT doc_id, bucket, sum(sign) AS c FROM bs GROUP BY 1, 2),
       |nd AS (SELECT doc_id, sum(c*c) AS nsq FROM c GROUP BY 1),
       |qv AS (SELECT * FROM (VALUES $qVals) AS t(bucket, qc)),
       |dp AS (SELECT c.doc_id, sum(c.c * qv.qc) AS dotv
       |  FROM c JOIN qv ON c.bucket = qv.bucket GROUP BY 1)
       |SELECT d.doc_id AS doc_id,
       |  1.0 - coalesce(dp.dotv, 0.0) /
       |    (sqrt(coalesce(nd.nsq, 0.0)) * sqrt($qNormSq)) AS dist
       |FROM documents d
       |LEFT JOIN nd ON d.doc_id = nd.doc_id
       |LEFT JOIN dp ON d.doc_id = dp.doc_id
       |ORDER BY dist ASC, d.doc_id ASC LIMIT 10""".stripMargin
  }

  /** RAG flagship oracle: the chunk_docs window replay feeding the
    * e2_embed_search md5-count cosine replay at (doc_id, chunk_id)
    * granularity, top-10 with the engine's (dist, doc:chunk string)
    * tie-break, hydrated with the doc's source. All counts are exact
    * integers so dot/norm sums are order-independent; the final
    * 1 − dot/(√nsq·√qnsq) rounds identically in both engines. */
  private def ragSql: String = {
    val qc = HashingEmbedder.md5CountsLocal(EmbedQueryText, 64)
    val qNormSq = qc.map(c => c * c).sum
    val qVals = qc.zipWithIndex.collect {
      case (c, b) if c != 0.0 => s"($b, $c)"
    }.mkString(", ")
    s"""WITH dtoks AS (
       |  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
       |    x -> x <> '') AS ts FROM documents),
       |nch AS (SELECT doc_id, ts,
       |  greatest(1, CAST(ceil((len(ts) - 16) / 48.0) AS BIGINT)) AS n FROM dtoks),
       |chn AS (SELECT doc_id, ts,
       |  unnest(generate_series(1, n)) - 1 AS chunk_id FROM nch),
       |chunk AS (
       |  SELECT doc_id, chunk_id,
       |    array_to_string(list_slice(ts, chunk_id*48 + 1, chunk_id*48 + 64), ' ') AS chunk_text
       |  FROM chn
       |  WHERE len(list_slice(ts, chunk_id*48 + 1, chunk_id*48 + 64)) > 0),
       |tok AS (
       |  SELECT doc_id, chunk_id,
       |    unnest(string_split_regex(lower(chunk_text), '\\s+')) AS t
       |  FROM chunk),
       |h AS (SELECT doc_id, chunk_id, md5(t) AS m FROM tok WHERE t <> ''),
       |bs AS (SELECT doc_id, chunk_id, ($mdValue) % 64 AS bucket,
       |  CASE WHEN (${mdNib(9)}) % 2 = 0 THEN 1.0 ELSE -1.0 END AS sign FROM h),
       |c AS (SELECT doc_id, chunk_id, bucket, sum(sign) AS c
       |  FROM bs GROUP BY 1, 2, 3),
       |nd AS (SELECT doc_id, chunk_id, sum(c*c) AS nsq FROM c GROUP BY 1, 2),
       |qv AS (SELECT * FROM (VALUES $qVals) AS t(bucket, qc)),
       |dp AS (SELECT c.doc_id, c.chunk_id, sum(c.c * qv.qc) AS dotv
       |  FROM c JOIN qv ON c.bucket = qv.bucket GROUP BY 1, 2),
       |top AS (
       |  SELECT nd.doc_id, nd.chunk_id,
       |    1.0 - coalesce(dp.dotv, 0.0) /
       |      (sqrt(nd.nsq) * sqrt($qNormSq)) AS dist
       |  FROM nd LEFT JOIN dp
       |    ON nd.doc_id = dp.doc_id AND nd.chunk_id = dp.chunk_id
       |  ORDER BY dist ASC,
       |    (CAST(nd.doc_id AS VARCHAR) || ':' || CAST(nd.chunk_id AS VARCHAR)) ASC
       |  LIMIT 10)
       |SELECT t.doc_id, t.chunk_id, d.source,
       |  md5(ck.chunk_text) AS chunk_md5, t.dist
       |FROM top t
       |JOIN chunk ck ON t.doc_id = ck.doc_id AND t.chunk_id = ck.chunk_id
       |JOIN documents d ON t.doc_id = d.doc_id
       |ORDER BY t.dist ASC, t.doc_id ASC, t.chunk_id ASC""".stripMargin
  }

  /** Normalized-embedding search oracle: dense 64-dim float vectors
    * assembled per doc (component = CAST(c/sqrt(Σc²) AS REAL) — the
    * exact DenseVecAgg.finish arithmetic), query components inlined as
    * exact round-trip double literals narrowed to REAL, cosine distance
    * via the shared left-associative fold helpers. */
  private def embedSearchNormSql: String = {
    val qf = HashingEmbedder.md5NormalizedLocal(EmbedQueryText, 64)
    // float widens to double exactly; the shortest-round-trip double
    // string parses back to that double; REAL cast lands on the float
    val qList = qf.map(f => s"CAST(CAST('${f.toDouble}' AS DOUBLE) AS REAL)")
      .mkString("[", ", ", "]")
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS t
       |  FROM documents),
       |h AS (SELECT doc_id, md5(t) AS m FROM tok WHERE t <> ''),
       |bs AS (SELECT doc_id, ($mdValue) % 64 AS bucket,
       |  CASE WHEN (${mdNib(9)}) % 2 = 0 THEN 1.0 ELSE -1.0 END AS sign FROM h),
       |c AS (SELECT doc_id, bucket, sum(sign) AS c FROM bs GROUP BY 1, 2),
       |nd AS (SELECT doc_id, sum(c*c) AS nsq FROM c GROUP BY 1),
       |grid AS (SELECT d.doc_id, u.b
       |  FROM documents d, unnest(generate_series(0, 63)) AS u(b)),
       |comp AS (SELECT g.doc_id, g.b,
       |    CAST(CASE WHEN coalesce(nd.nsq, 0.0) = 0.0 THEN 0.0
       |         ELSE coalesce(c.c, 0.0) / sqrt(nd.nsq) END AS REAL) AS f
       |  FROM grid g
       |  LEFT JOIN c ON g.doc_id = c.doc_id AND g.b = c.bucket
       |  LEFT JOIN nd ON g.doc_id = nd.doc_id),
       |vec AS (SELECT doc_id, list(f ORDER BY b) AS v FROM comp GROUP BY doc_id),
       |q AS (SELECT $qList AS qe)
       |SELECT vec.doc_id AS doc_id, ${OracleSql.cosineDistance("v", "qe")} AS dist
       |FROM vec CROSS JOIN q
       |ORDER BY dist ASC, doc_id ASC LIMIT 10""".stripMargin
  }

  /** Multimodal feature oracle: the byte-histogram stub codec re-derived
    * from characters (ord == byte on the ASCII corpus), normalized by
    * greatest(norm, 1) exactly as FakeCodec does, rounded through REAL to
    * match the float32 features. */
  private def mmFeaturesSql: String =
    """WITH pos AS (
      |  SELECT doc_id, text, unnest(generate_series(1, length(text))) AS i
      |  FROM documents),
      |hb AS (SELECT doc_id, ord(substr(text, i, 1)) % 16 AS bucket FROM pos),
      |h AS (SELECT doc_id, bucket, CAST(count(*) AS DOUBLE) AS c
      |  FROM hb GROUP BY 1, 2),
      |n AS (SELECT doc_id, greatest(sqrt(sum(c*c)), 1.0) AS nm FROM h GROUP BY 1),
      |grid AS (SELECT doc_id, unnest(generate_series(0, 15)) AS bucket FROM documents)
      |SELECT g.doc_id AS doc_id, CAST(g.bucket AS BIGINT) AS bucket,
      |  CAST(CAST(coalesce(h.c, 0.0) / coalesce(n.nm, 1.0) AS REAL) AS DOUBLE) AS feature
      |FROM grid g
      |LEFT JOIN h ON g.doc_id = h.doc_id AND g.bucket = h.bucket
      |LEFT JOIN n ON g.doc_id = n.doc_id
      |ORDER BY g.doc_id, g.bucket""".stripMargin

  /** Language-ID oracle generated from TextFunctions.langMarkers so the
    * marker sets can never drift between engine and oracle. */
  private def langIdSql: String = {
    val ordered = TextFunctions.langMarkers.toSeq.sortBy(_._1)
    def arr(ms: Seq[String]) = ms.map(m => s"'$m'").mkString("[", ", ", "]")
    val scores = ordered.map { case (l, ms) =>
      s"len(list_intersect(w, ${arr(ms)})) AS s_$l" }.mkString(",\n")
    val greatestAll = ordered.map("s_" + _._1).mkString("greatest(", ", ", ")")
    val cases = ordered.map { case (l, _) => s"WHEN s_$l = m THEN '$l'" }.mkString(" ")
    s"""WITH t AS (
       |  SELECT doc_id, list_distinct(string_split_regex(lower(text), '\\s+')) AS w
       |  FROM documents),
       |s AS (SELECT doc_id, $scores FROM t),
       |sm AS (SELECT *, $greatestAll AS m FROM s)
       |SELECT doc_id, CASE WHEN m = 0 THEN 'und' $cases END AS lang_pred
       |FROM sm ORDER BY doc_id""".stripMargin
  }
}
