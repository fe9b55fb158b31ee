package graft

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
}
