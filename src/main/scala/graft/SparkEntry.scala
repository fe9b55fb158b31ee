package graft

import graft.core.{OracleSql, Tables}
import graft.functions.VectorFunctions._
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

    // ---- Extension: TPC-H Q3-style join (broadcast dims, shuffle fact)
    "q3_top_revenue" -> ((s, dir) => {
      val cust = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, dir).filter(col("o_orderdate") < lit("1998-06-01").cast("timestamp"))
      val li = Tables.lineitem(s, dir).filter(col("l_shipdate") > lit("1998-06-01").cast("timestamp"))
      li.join(broadcast(ord), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey")
        .agg(dSum(col("l_extendedprice") * (lit(1) - col("l_discount")), 6).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey").asc)
        .limit(10)
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

    // ---- Extension: event-time hourly aggregation (streaming analog)
    "events_hourly" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("h"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), dSum(col("value")).as("sum_value"))
        .orderBy("h", "event_type")),

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

    // ---- Dedup (exact): content-hash grouping, keep-first
    "dedup_exact" -> ((s, dir) =>
      Tables.documents(s, dir)
        .groupBy(md5(col("text")).as("text_hash"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
        .orderBy("text_hash"))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
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

      "o2_knn_cosine" ->
        s"""$cte SELECT e.vec_id AS vec_id, ${cosineDistance("e.embedding", "q.qe")} AS dist
           |FROM embeddings e CROSS JOIN q ORDER BY dist ASC, vec_id ASC LIMIT 10""".stripMargin,

      "o7_knn_filtered" ->
        s"""$cte SELECT e.vec_id AS vec_id, CAST(e.label AS BIGINT) AS label,
           |${l2("e.embedding", "q.qe")} AS dist
           |FROM embeddings e CROSS JOIN q WHERE e.label = 3
           |ORDER BY dist ASC, vec_id ASC LIMIT 10""".stripMargin,

      "o7_metadata_filter" ->
        """SELECT doc_id, lang, source FROM documents
          |WHERE lang = 'en' AND source = 'src3' ORDER BY doc_id""".stripMargin,

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

      "events_hourly" ->
        s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS h,
           |event_type, count(*) AS n, ${decSum("value")} AS sum_value
           |FROM events GROUP BY 1, 2 ORDER BY h, event_type""".stripMargin,

      "events_json_extract" ->
        """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
          |FROM events ORDER BY event_id""".stripMargin,

      "t_token_stats" ->
        """SELECT doc_id, n_chars, CAST(length(text) AS BIGINT) AS len,
          |CAST(array_length(string_split(text, ' ')) AS BIGINT) AS n_tokens
          |FROM documents ORDER BY doc_id""".stripMargin,

      "dedup_exact" ->
        """SELECT md5(text) AS text_hash, min(doc_id) AS keep_id, count(*) AS n_copies
          |FROM documents GROUP BY 1 ORDER BY text_hash""".stripMargin
    )
  }
}
