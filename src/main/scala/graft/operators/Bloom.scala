package graft.operators

import graft.expressions.{BloomMightContain, BloomUtil}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnBridge

/** Distributed Bloom filter: the broadcast-able set screen for
  * key-subtraction at corpus scale (blocklist removal, benchmark
  * decontamination by content hash, "seen before" checks) — the same
  * role Spark's AQE runtime row-level filtering plays for shuffle
  * joins, here as a first-class operator the pipeline can persist and
  * reuse.
  *
  * Why not the exact joins the engine already has: a 100 TB corpus
  * anti-joined against a 10⁹-key blocklist shuffles the FULL corpus on
  * the key. The Bloom screen inverts that: the blocklist folds into an
  * m-bit bitmap (one map-side-combined aggregation over the small
  * side), the bitmap rides the corpus scan as a codegen'd filter
  * ([[graft.expressions.BloomMightContain]]), and only rows the screen
  * cannot clear — true members plus the fpp·n false positives — pay the
  * exact verify join. No false negatives, so composing screen + exact
  * verify keeps final semantics EXACTLY equal to the plain anti-join:
  * the driver query is oracle-checkable even though a probabilistic
  * structure sits in the middle.
  *
  * State is bounded and mergeable: bitmaps OR together (associative,
  * commutative — partition count cannot change the result), so shards
  * can be built independently and unioned, and a streaming ingest can
  * maintain one incrementally ([[merge]]).
  */
object Bloom {

  /** Bitmap + probe count. `bits` is driver/executor-resident like the
    * IVF centroid table — MBs for billions of keys at 1% fpp (m/n ≈ 9.6
    * bits/key), far under broadcast limits. */
  case class Model(bits: Array[Long], numHashes: Int) {
    def numBits: Long = bits.length.toLong * 64L
    def isEmpty: Boolean = { var i = 0; while (i < bits.length) { if (bits(i) != 0L) return false; i += 1 }; true }
  }

  /** Standard sizing (Bloom 1970 analysis): bits m = −n·ln p/(ln 2)²,
    * hashes k = (m/n)·ln 2, both clamped to sane minima; m rounds up to
    * a whole number of 64-bit words. */
  def sizing(expectedKeys: Long, fpp: Double): (Int, Int) = {
    require(expectedKeys > 0, s"expectedKeys must be positive, got $expectedKeys")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val ln2 = math.log(2)
    val mBits = math.ceil(-expectedKeys * math.log(fpp) / (ln2 * ln2)).toLong
    val words = math.max(1L, (mBits + 63) >> 6)
    require(words <= Int.MaxValue, s"bitmap too large: $mBits bits")
    val k = math.max(1, math.round(mBits.toDouble / expectedKeys * ln2).toInt)
    (words.toInt, k)
  }

  /** The two Kirsch–Mitzenmacher base hashes as columns. Null keys
    * hash to xxhash64's seed like every Spark hash aggregate — the
    * exact verify join restores precise null semantics downstream, so
    * the screen only needs determinism, not null fidelity. */
  private def h1(key: Column): Column = xxhash64(key)
  private def h2(key: Column): Column = xxhash64(xxhash64(key))

  /** OR-fold of per-row probe bits into one fixed-size bitmap.
    * Buffer = the bitmap itself (m/8 bytes, map-side combined): the
    * shuffle carries one bitmap per map partition, the driver sees one
    * merged array — O(m), independent of key count. */
  final class BloomAgg(words: Int, k: Int)
      extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](words)
    override def reduce(b: Array[Long], h: (Long, Long)): Array[Long] = {
      BloomUtil.set(b, h._1, h._2, k); b
    }
    override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) |= y(i); i += 1 }
      x
    }
    override def finish(b: Array[Long]): Array[Long] = b
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** Build a filter over `keyCol` of `keys`, sized for `expectedKeys`
    * at `fpp`. One aggregation pass over the key side; null keys are
    * skipped (a null never equals anything in the verify join). */
  def fit(keys: DataFrame, keyCol: Column, expectedKeys: Long,
          fpp: Double = 0.01): Model = {
    val (words, k) = sizing(expectedKeys, fpp)
    val spark = keys.sparkSession
    import spark.implicits._
    val bits = keys
      .filter(keyCol.isNotNull)
      .select(h1(keyCol).as("h1"), h2(keyCol).as("h2"))
      .as[(Long, Long)]
      .select(new BloomAgg(words, k).toColumn.name("bits"))
      .head()
    Model(bits, k)
  }

  /** Bitmap union: the filter over A ∪ B (same sizing required). */
  def merge(a: Model, b: Model): Model = {
    require(a.bits.length == b.bits.length && a.numHashes == b.numHashes,
      s"incompatible Bloom models: ${a.bits.length}x${a.numHashes} vs ${b.bits.length}x${b.numHashes}")
    val out = new Array[Long](a.bits.length)
    var i = 0
    while (i < out.length) { out(i) = a.bits(i) | b.bits(i); i += 1 }
    Model(out, a.numHashes)
  }

  /** Membership screen column: false ⇒ definitely not a member;
    * true ⇒ member or false positive (rate set by the build sizing). */
  def mightContain(keyCol: Column, model: Model): Column =
    ColumnBridge.column(BloomMightContain(
      ColumnBridge.expression(h1(keyCol)),
      ColumnBridge.expression(h2(keyCol)),
      model.bits, model.numHashes))

  /** EXACT `corpus − blocklist` by key, Bloom-accelerated: rows the
    * screen clears are kept with no join; only screen-positives (true
    * members + fpp false positives) meet the blocklist in an exact
    * left-anti verify join. Result ≡ `corpus LEFT ANTI JOIN blocklist`
    * bit-for-bit — the screen can only divert definite-negatives around
    * the join, never change membership.
    *
    * The corpus is scanned twice (once per branch) instead of shuffled
    * once in full: at the target scale a columnar re-scan is far
    * cheaper than shuffling every row on a text-hash key, and the
    * verify branch's shuffle input is fpp-sized. Null corpus keys
    * follow anti-join semantics (never members ⇒ kept), whichever
    * branch they land in.
    *
    * `expectedKeys` is a sizing ESTIMATE — pass table statistics or a
    * KMV sketch estimate ([[Sketch]]), not an eager count() (which
    * would cost an extra blocklist scan before the real query).
    * Mis-estimating cannot change the result: undersizing only raises
    * the effective fpp (more rows pay the verify join), oversizing
    * only wastes bitmap bits. */
  def subtractByKey(corpus: DataFrame, keyCol: Column,
                    blocklist: DataFrame, blocklistKeyCol: Column,
                    expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val model = fit(blocklist, blocklistKeyCol, expectedKeys, fpp)
    val maybe = mightContain(keyCol, model)
    val defNeg = corpus.filter(!maybe || keyCol.isNull)
    val verified = corpus.filter(maybe && keyCol.isNotNull)
      .join(blocklist.select(blocklistKeyCol.as("__bloom_key")).distinct(),
        keyCol === col("__bloom_key"), "left_anti")
    defNeg.unionByName(verified)
  }
}
