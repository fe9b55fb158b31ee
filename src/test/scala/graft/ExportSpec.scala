package graft

import graft.operators.Export
import org.apache.spark.sql.functions._

/** Sharded export: deterministic assignment, manifest integrity,
  * write/verify round trip. */
class ExportSpec extends SparkSpec {

  private def corpus = {
    val s = spark
    import s.implicits._
    (1 to 200).map(i => (i.toLong, s"document body number $i", i % 7 + 10))
      .toDF("id", "text", "nbytes")
  }

  test("shardOf: stable, in range, partitioning-invariant, salt redraws") {
    val df = corpus
    val a = df.select(col("id"), Export.shardOf(col("id"), 8).as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a.values.forall(s => s >= 0 && s < 8))
    assert(a.values.toSet.size == 8, "200 ids over 8 shards should hit all")
    val b = df.repartition(13)
      .select(col("id"), Export.shardOf(col("id"), 8).as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b)
    val salted = df.select(col("id"), Export.shardOf(col("id"), 8, "v2").as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(salted != a, "a different salt must redraw the assignment")
  }

  test("manifest: totals partition the corpus; checksum moves on any row change") {
    val df = corpus
    val m = Export.manifest(df, "id", "text", col("nbytes"), 4)
    val rows = m.collect()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == 200L)
    assert(rows.map(_.getAs[Long]("total_bytes")).sum ==
      df.agg(sum("nbytes")).head.getLong(0))
    val tampered = df.withColumn("text",
      when(col("id") === 17L, lit("tampered")).otherwise(col("text")))
    val m2 = Export.manifest(tampered, "id", "text", col("nbytes"), 4)
      .collect()
    val shard17 = rows.find(r =>
      m2.exists(t => t.getAs[Int]("shard") == r.getAs[Int]("shard") &&
        t.getAs[Long]("content_sum") != r.getAs[Long]("content_sum")))
    assert(shard17.isDefined, "a one-row payload edit must move exactly its shard's checksum")
    assert(m2.count(t => rows.exists(r =>
      r.getAs[Int]("shard") == t.getAs[Int]("shard") &&
        r.getAs[Long]("content_sum") != t.getAs[Long]("content_sum"))) == 1)
  }

  test("writeShards + verifyExport: intact round trip; corruption detected") {
    val df = corpus
    val dir = java.nio.file.Files.createTempDirectory("graft_export").toString
    try {
      val man = Export.writeShards(df, "id", "text", col("nbytes"), 4, dir)
      // every written file sits under a single shard= partition dir
      val back = spark.read.parquet(dir)
      assert(back.count() == 200L)
      assert(back.select("shard").distinct().count() == 4L)
      assert(Export.verifyExport(spark, dir, man, "id", "text",
        col("nbytes"), 4).isEmpty, "freshly written export must verify")
      // drop one shard directory -> verify flags both sides' drift
      val shard0 = new java.io.File(dir).listFiles()
        .find(_.getName.startsWith("shard=")).get
      shard0.listFiles().foreach(_.delete()); shard0.delete()
      assert(Export.verifyExport(spark, dir, man, "id", "text",
        col("nbytes"), 4).count() > 0, "a lost shard must fail verification")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete()
      }
      rm(new java.io.File(dir))
    }
  }
}
