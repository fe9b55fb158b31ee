package graft

import graft.functions.HashingEmbedder
import graft.operators.Search
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** E1/E2 swap-in boundary: the engine composes with ANY embedder that
  * satisfies the column contract (adds `array<float>` of length dim),
  * not with [[HashingEmbedder]] specifically — the production swap to a
  * real neural model is one class implementing the same (df, idCol,
  * textCol, dim, outCol) surface. The mock here is the shape that swap
  * takes: a mapPartitions "model server" that loads per-partition
  * state once (the torch-session analog) and embeds a batch of rows.
  * Same dim validation, same search composition, no query changes. */
class EmbedderSeamSpec extends SparkSpec {

  /** Mock "model" embedder behind the E2 surface: per-partition state
    * (a deterministic char-frequency "network") initialized once per
    * partition — exactly where a real model would load its weights —
    * then batch inference over the partition's rows. L2-normalized
    * float output, zero vector for null/empty text: the same output
    * contract [[HashingEmbedder.embed]] guarantees. */
  private def mockModelEmbed(df: DataFrame, idCol: String, textCol: String,
                             dim: Int, outCol: String = "embedding"): DataFrame = {
    val fields = df.schema.fields :+ StructField(outCol, ArrayType(FloatType))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(StructType(fields))
    val ti = df.schema.fieldIndex(textCol)
    df.mapPartitions { rows =>
      // per-partition "weights" (the expensive-to-load model state)
      val weights = Array.tabulate(128, dim)((c, j) =>
        math.sin(c * 31 + j * 17))
      rows.map { r =>
        val text = if (r.isNullAt(ti)) "" else r.getString(ti)
        val acc = new Array[Double](dim)
        text.toLowerCase.foreach { ch =>
          if (ch < 128) { var j = 0
            while (j < dim) { acc(j) += weights(ch)(j); j += 1 } } }
        val n = math.sqrt(acc.map(v => v * v).sum)
        val v = if (n == 0.0) Array.fill(dim)(0.0f)
          else acc.map(x => (x / n).toFloat)
        Row.fromSeq(r.toSeq :+ v.toSeq)
      }
    }(enc)
  }

  /** Driver-side twin for query embedding (the embedText analog). */
  private def mockModelEmbedLocal(text: String, dim: Int): Array[Float] = {
    val weights = Array.tabulate(128, dim)((c, j) => math.sin(c * 31 + j * 17))
    val acc = new Array[Double](dim)
    text.toLowerCase.foreach { ch =>
      if (ch < 128) { var j = 0
        while (j < dim) { acc(j) += weights(ch)(j); j += 1 } } }
    val n = math.sqrt(acc.map(v => v * v).sum)
    if (n == 0.0) Array.fill(dim)(0.0f) else acc.map(x => (x / n).toFloat)
  }

  test("mock model embedder swaps in behind the E1/E2 surface: same " +
      "dim validation, same search composition, exact kNN agreement") {
    val s = spark
    import s.implicits._
    val dim = 16
    val texts = Seq("the quick brown fox", "jumps over the lazy dog",
      "pack my box with five dozen jugs", "sphinx of black quartz",
      "judge my vow", "how vexingly quick daft zebras jump",
      "waltz bad nymph", "for quick jigs vex", "", "bright vixens jump")
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")

    // E2: batch embed through the mock — same column contract
    val embedded = mockModelEmbed(docs, "id", "text", dim)
    assert(embedded.schema(
      "embedding").dataType == ArrayType(FloatType))
    val lens = embedded.select(size(col("embedding"))).as[Int].collect()
    assert(lens.forall(_ == dim))

    // the shared dim validation rejects a wrong-dim read-back exactly
    // like the hashing embedder's
    val err = intercept[Exception] {
      embedded.select(HashingEmbedder.validateDim(
        col("embedding"), dim + 1)).collect()
    }
    assert(err.getMessage.contains(s"Expected embedding dimension ${dim + 1}"))

    // E1+O2 composition: store ingest + text-query search, with the
    // query embedded by the mock's driver-side twin — the searchText
    // shape with the embedder swapped
    val dir = Files.createTempDirectory("seam").toString
    val store = VectorStore.open(s, dir, dim = dim)
    store.ingest(embedded.select(col("embedding"), col("text").as("content"),
      typedLit(Map.empty[String, String]).as("metadata")))
    val qv = mockModelEmbedLocal("quick brown fox jumps", dim).toSeq
    val got = store.search(qv, 3).select("id").as[Long].collect().toSeq

    // agreement with brute-force exact kNN over the mock embeddings
    val want = Search.knnExact(embedded, "id", "embedding", qv, 3)
      .select("id").as[Long].collect().toSeq
    assert(got == want)
  }
}
