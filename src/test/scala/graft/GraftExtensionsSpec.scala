package graft

import org.apache.spark.sql.functions.col

/** SQL surface for the codegen kernels, registered on a live session. */
class GraftExtensionsSpec extends SparkSpec {

  test("kernels are callable from spark.sql after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT
        |  l2_dist(array(cast(3.0 as float), cast(0.0 as float)),
        |          array(cast(0.0 as float), cast(4.0 as float))) AS d,
        |  l2_sq(array(cast(1.0 as float)), array(cast(3.0 as float))) AS sq,
        |  dot_product(array(cast(2.0 as float), cast(3.0 as float)),
        |              array(cast(4.0 as float), cast(5.0 as float))) AS dp,
        |  cosine_sim(array(cast(1.0 as float), cast(0.0 as float)),
        |             array(cast(1.0 as float), cast(0.0 as float))) AS cs,
        |  word_shingles('The quick brown fox', 2) AS sh,
        |  ln_libm(10) AS ln10
        |""".stripMargin).head()
    assert(r.getDouble(0) == 5.0)
    assert(r.getDouble(1) == 4.0)
    assert(r.getDouble(2) == 23.0)
    assert(math.abs(r.getDouble(3) - 1.0) < 1e-12)
    assert(r.getSeq[String](4) == Seq("the quick", "quick brown", "brown fox"))
    assert(java.lang.Double.doubleToRawLongBits(r.getDouble(5)) ==
      java.lang.Double.doubleToRawLongBits(java.lang.Math.log(10.0)))
    // BQ kernels: sign_pack of 4 dims (1,-1,1,1) -> 0b1011 = 11; hamming
    val bq = spark.sql(
      """SELECT
        |  sign_pack(array(cast(1.0 as float), cast(-1.0 as float),
        |                  cast(1.0 as float), cast(1.0 as float))) AS code,
        |  hamming_dist(array(cast(11 as bigint)), array(cast(13 as bigint))) AS h
        |""".stripMargin).head()
    assert(bq.getSeq[Long](0) == Seq(11L))
    assert(bq.getLong(1) == 2L) // 0b1011 xor 0b1101 = 0b0110
  }

  test("text-analysis composites are callable from spark.sql") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT
        |  lang_id('the cat and the dog went to the house with the') AS lang,
        |  token_count('one two  three') AS tc,
        |  subword_count('hello') AS sc,
        |  quality_score('The quick brown fox jumps over the lazy dog today') AS q,
        |  simhash64('alpha beta gamma') AS sh,
        |  doc_fingerprint('abcdefghij', 4) AS fp
        |""".stripMargin).head()
    assert(r.getString(0) == "en")
    assert(r.getLong(1) == 3L)
    assert(r.getLong(2) >= 1L)
    val q = r.getDouble(3)
    assert(q >= 0.0 && q <= 1.0)
    assert(r.getString(4).length == 16) // 64-bit hex fingerprint
    assert(r.getString(5).length == 32) // md5 hex
    // composites agree with their Column-API originals
    val s = spark
    import s.implicits._
    val df = Seq((0L, "El gato y el perro en la casa con los libros para")).toDF("id", "text")
    df.createOrReplaceTempView("t_ext")
    val sqlLang = spark.sql("SELECT lang_id(text) FROM t_ext").head().getString(0)
    val colLang = df.select(
      graft.functions.TextFunctions.langId(org.apache.spark.sql.functions.col("text")))
      .head().getString(0)
    assert(sqlLang == colLang)
  }

  test("SQL queries over tables can rank by kernel distance") {
    GraftFunctions.register(spark)
    val s = spark
    import s.implicits._
    corpus(20, 4).toDF("id", "embedding").createOrReplaceTempView("vecs")
    val top = spark.sql(
      """SELECT a.id, l2_dist(a.embedding, b.embedding) AS dist
        |FROM vecs a JOIN vecs b ON b.id = 0
        |ORDER BY dist ASC, a.id ASC LIMIT 3""".stripMargin).collect()
    assert(top.head.getLong(0) == 0L && top.head.getDouble(1) == 0.0)
    assert(top.map(_.getDouble(1)).sameElements(top.map(_.getDouble(1)).sorted))
  }

  test("pipeline table functions: dedup screens are callable from pure SQL") {
    GraftTableFunctions.register(spark)
    val s = spark
    import s.implicits._
    val base = "the quick brown fox jumps over the lazy dog tonight"
    Seq((0L, base), (1L, base.replace("jumps", "leaps")),
      (2L, "totally different words about geology and rocks here"),
      (3L, base)) // exact copy of 0
      .toDF("doc_id", "text").createOrReplaceTempView("docs_tf")
    // near-dup pair screen from SQL == the Scala API
    val sqlPairs = spark.sql(
      "SELECT * FROM minhash_pairs('docs_tf', 'doc_id', 'text') ORDER BY a, b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val apiPairs = graft.operators.Dedup.minhashLshPairs(
        spark.table("docs_tf"), "doc_id", "text").orderBy("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(sqlPairs == apiPairs && sqlPairs.contains((0L, 3L)))
    // exact keep-first dedup from SQL: doc 3 (copy of 0) drops
    val kept = spark.sql(
      "SELECT doc_id FROM dedup_exact('docs_tf', 'doc_id', 'text')")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 1L, 2L))
    // composability: table function in a CTE with further SQL on top
    val nPairs = spark.sql(
      """WITH p AS (SELECT * FROM minhash_pairs('docs_tf', 'doc_id', 'text'))
        |SELECT count(*) AS n FROM p WHERE a = 0""".stripMargin)
      .head().getLong(0)
    assert(nPairs == sqlPairs.count(_._1 == 0L))
    // full near-dedup composition from SQL: 0/1/3 form one near-dup
    // cluster (keep lowest id 0), 2 is untouched
    val survivors = spark.sql(
      "SELECT doc_id FROM near_dedup('docs_tf', 'doc_id', 'text')")
      .collect().map(_.getLong(0)).toSet
    assert(survivors == Set(0L, 2L), s"near_dedup survivors: $survivors")
  }

  test("near_dedup SQL planning is side-effect-free (jobs only at first action)") {
    GraftTableFunctions.register(spark)
    val s = spark
    import s.implicits._
    val base = "the quick brown fox jumps over the lazy dog tonight"
    Seq((0L, base), (1L, base.replace("jumps", "leaps")),
      (2L, "totally different words about geology and rocks here"))
      .toDF("doc_id", "text").createOrReplaceTempView("lazy_tf")
    // count thunk invocations DIRECTLY via the memo cell in the logical
    // plan — job-count deltas are async-delivered and AQE-variable
    def screenEvals(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed.collect {
        case d: graft.plans.DeferredRelation => d.memo.evalCount
      }.sum

    // planning-only surfaces: analysis, EXPLAIN (physical planning
    // included), and view definition — none may run the screen/CC jobs
    val df = spark.sql(
      "SELECT doc_id FROM near_dedup('lazy_tf', 'doc_id', 'text')")
    df.queryExecution.executedPlan // force full physical planning
    spark.sql(
      "EXPLAIN SELECT * FROM near_dedup('lazy_tf', 'doc_id', 'text')")
      .collect()
    assert(screenEvals(df) == 0,
      s"near_dedup planning ran the deferred screen ${screenEvals(df)} times; must run it zero")
    // first action fires the deferred screen+CC and answers correctly
    val survivors = df.collect().map(_.getLong(0)).toSet
    assert(survivors == Set(0L, 2L), s"survivors: $survivors")
    assert(screenEvals(df) == 1)
    // the memo lives in the LOGICAL node, so a SECOND action on the
    // same df re-plans a fresh exec node but must NOT re-run the
    // iterative screen
    assert(df.collect().map(_.getLong(0)).toSet == Set(0L, 2L))
    assert(screenEvals(df) == 1,
      "the deferred screen re-ran on the second action instead of memoizing")

    // invalidation contract: the memo is per-STATEMENT, not per-session.
    // Replacing the underlying view does not disturb the held df (it
    // keeps its snapshot-at-first-action answer)…
    Seq((0L, base), (1L, base.replace("jumps", "leaps")))
      .toDF("doc_id", "text").createOrReplaceTempView("lazy_tf")
    assert(df.collect().map(_.getLong(0)).toSet == Set(0L, 2L),
      "a held df must keep serving its first-action snapshot")
    // …while re-issuing the SQL parses a fresh TVF call with a fresh
    // memo and sees the new table state
    val fresh = spark.sql(
      "SELECT doc_id FROM near_dedup('lazy_tf', 'doc_id', 'text')")
      .collect().map(_.getLong(0)).toSet
    assert(fresh == Set(0L), s"fresh statement must see the replaced view: $fresh")
  }

  test("ingest table functions: read_jsonl and read_warc from pure SQL") {
    GraftTableFunctions.register(spark)
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tvf_ingest").toString
    Seq("""{"doc_id": 5, "text": "from sql"}""", "{corrupt")
      .toDF("value").write.text(s"$dir/jl")
    val rows = spark.sql(s"SELECT doc_id, text FROM read_jsonl('$dir/jl')")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((5L, "from sql")))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "a.warc"),
      graft.sources.Warc.recordBytes("resource", "urn:doc:8", "u",
        "warc payload".getBytes("UTF-8")))
    val w = spark.sql(
      s"SELECT record_id, payload FROM read_warc('$dir/a.warc')")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(w == Seq(("urn:doc:8", "warc payload")))
  }

  test("ingest table function: read_csv from pure SQL") {
    GraftTableFunctions.register(spark)
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tvf_csv").toString
    // headerless CSV in documents-schema column order; one corrupt line
    Seq("7,csv text,en,src,8", "not,a,valid,row,because,extra,cols")
      .toDF("value").write.text(s"$dir/c")
    val rows = spark.sql(s"SELECT doc_id, text FROM read_csv('$dir/c')")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((7L, "csv text")))
  }

  test("blocklist_hits scalar: SQL route equals the Scala API, literal guard") {
    GraftFunctions.register(spark)
    val s = spark
    import s.implicits._
    val docs = Seq((0L, "x batch batch batch y"), (1L, "clean"),
      (2L, "the fast key order"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("blk_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, blocklist_hits(text,
        |  'batch batch', 'batch batch batch', 'fast key', 'key order') AS h
        |FROM blk_docs ORDER BY doc_id""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toSeq
    val pats = Seq("batch batch", "batch batch batch", "fast key", "key order")
    val viaApi = docs.select(col("doc_id"),
        graft.functions.TextFunctions.blocklistMatches(col("text"), pats).as("h"))
      .orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toSeq
    assert(viaSql == viaApi)
    assert(viaSql.head._2 == Seq("batch batch", "batch batch batch"))
    // non-literal pattern arguments fail loud, not silently per-row
    val err = intercept[Exception] {
      spark.sql("SELECT blocklist_hits(text, text) FROM blk_docs").collect()
    }
    assert(err.getMessage.contains("string literal"))
  }

  test("table functions accept TABLE(...) relation arguments (subquery/CTE, no temp view)") {
    GraftTableFunctions.register(spark)
    val s = spark
    import s.implicits._
    val base = "the quick brown fox jumps over the lazy dog tonight"
    Seq((0L, base), (1L, base.replace("jumps", "leaps")),
      (2L, "totally different words about geology and rocks here"),
      (3L, base))
      .toDF("doc_id", "text").createOrReplaceTempView("tblarg_tf")
    // subquery argument: filter feeds straight into the function
    val kept = spark.sql(
      """SELECT doc_id FROM dedup_exact(
        |  TABLE(SELECT * FROM tblarg_tf WHERE doc_id < 3),
        |  'doc_id', 'text')""".stripMargin)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 1L, 2L), s"dedup_exact over TABLE(subquery): $kept")
    // bare relation argument
    val survivors = spark.sql(
      "SELECT doc_id FROM near_dedup(TABLE(tblarg_tf), 'doc_id', 'text')")
      .collect().map(_.getLong(0)).toSet
    assert(survivors == Set(0L, 2L), s"near_dedup over TABLE(name): $survivors")
    // quality_gate + minhash_pairs over TABLE args match the name-string route
    val viaTable = spark.sql(
      "SELECT * FROM minhash_pairs(TABLE(tblarg_tf), 'doc_id', 'text') ORDER BY a, b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaName = spark.sql(
      "SELECT * FROM minhash_pairs('tblarg_tf', 'doc_id', 'text') ORDER BY a, b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(viaTable == viaName && viaTable.nonEmpty)
  }

  test("pipeline table functions: split, chunking, quality gate from pure SQL") {
    GraftTableFunctions.register(spark)
    val s = spark
    import s.implicits._
    (0L until 200L).map(i => (i, s"word$i " * 8))
      .toDF("doc_id", "text").createOrReplaceTempView("split_tf")
    // hash_split: labels match the Scala splitColumn exactly; all rows labeled
    val sqlSplit = spark.sql(
      "SELECT doc_id, split FROM hash_split('split_tf', 'doc_id', 'train:0.8,test:0.2', 's1')")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val apiSplit = spark.table("split_tf").select(col("doc_id"),
        graft.operators.Sampling.splitColumn(col("doc_id"),
          Seq(("train", 0.8), ("test", 0.2)), "s1").as("split"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(sqlSplit == apiSplit)
    assert(sqlSplit.values.toSet == Set("train", "test"))
    // chunk_tokens: 9 tokens, size 4, overlap 1 → stride 3 → 3 chunks
    Seq((7L, (1 to 9).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text").createOrReplaceTempView("chunk_tf")
    val chunks = spark.sql(
      """SELECT chunk_id, chunk_text FROM
        |token_chunks('chunk_tf', 'doc_id', 'text', 4, 1) ORDER BY chunk_id""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(chunks == Seq((0L, "t1 t2 t3 t4"), (1L, "t4 t5 t6 t7"),
      (2L, "t7 t8 t9")))
    // quality_gate: a long stopword-bearing doc passes, a short one fails
    val good = ("the and that with for was are this from they " * 8).trim
    Seq((0L, good), (1L, "too short")).toDF("doc_id", "text")
      .createOrReplaceTempView("qg_tf")
    val passed = spark.sql(
      "SELECT doc_id FROM quality_gate('qg_tf', 'text')")
      .collect().map(_.getLong(0)).toSet
    assert(passed == Set(0L))
  }
}
