package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Build the sf1 spot-check tier: a deterministic 10x replication of the
  * driver's sf0.1 parquet tables.
  *
  * The correctness gate runs at sf0.01 and sf0.1 only, so spill paths and
  * AQE-regime replans that only trigger at larger inputs sit outside the
  * oracle's view. This main manufactures a 10x corpus the DuckDB oracle can
  * still chew through: each replica r in 0..9 remaps every surrogate key
  * `k -> k*10 + r`, so every replica is a self-contained join world (the
  * per-replica join structure of sf0.1 is preserved exactly — no
  * cross-replica fan-out), and entity NAMES are suffixed `#r` for r>0 so
  * queries relying on name uniqueness keep that property. Dimension tables
  * region/nation are NOT replicated (they are fixed-cardinality in TPC-H;
  * nationkey/regionkey columns pass through untouched).
  *
  * `documents.text` is deliberately left byte-identical across replicas:
  * the duplication-heavy corpus is exactly the regime the dedup families
  * must survive at scale, and both engines see the same bytes so the
  * hash-compare stays meaningful.
  *
  * Usage: runMain graft.MakeSf1 /root/testdata/sf0.1 /tmp/graft_sf1
  * Then:  runMain graft.Verify /tmp/graft_sf1 /tmp/graft_verify_sf1 <names>
  * and    python3 tools/compare_oracle.py /tmp/graft_sf1 /tmp/graft_verify_sf1
  */
object MakeSf1 {
  val Replicas = 10

  /** Union of `Replicas` copies with surrogate keys remapped k*10+r and
    * name columns disambiguated. Key remap preserves BIGINT type. */
  private[graft] def replicate(df: DataFrame, keyCols: Seq[String],
                               nameCols: Seq[String]): DataFrame =
    (0 until Replicas).map { r =>
      val keyed = keyCols.foldLeft(df) { (d, k) =>
        d.withColumn(k, (col(k) * Replicas + lit(r)).cast("long"))
      }
      nameCols.foldLeft(keyed) { (d, nc) =>
        d.withColumn(nc,
          if (r == 0) col(nc) else concat(col(nc), lit(s"#$r")))
      }
    }.reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val (srcDir, dstDir) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // Both shipped events.ts layouts must replicate: the INT64
      // TIMESTAMP(NANOS) generation is rejected by the vectorized reader
      // unless read as a nanos-long. The replica then carries a plain
      // LongType column, which downstream Tables.events already
      // dispatches on (nanos → timestamp_micros(ts div 1000)).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def rd(t: String) = spark.read.parquet(s"$srcDir/$t.parquet")
    def wr(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$dstDir/$t.parquet")

    // fixed-cardinality dimensions: pass through
    wr(rd("region"), "region")
    wr(rd("nation"), "nation")
    wr(replicate(rd("customer"), Seq("c_custkey"), Seq("c_name")), "customer")
    wr(replicate(rd("supplier"), Seq("s_suppkey"), Seq("s_name")), "supplier")
    wr(replicate(rd("part"), Seq("p_partkey"), Seq("p_name")), "part")
    wr(replicate(rd("orders"), Seq("o_orderkey", "o_custkey"), Nil), "orders")
    wr(replicate(rd("lineitem"),
      Seq("l_orderkey", "l_partkey", "l_suppkey"), Nil), "lineitem")
    wr(replicate(rd("events"), Seq("event_id", "user_id"), Nil), "events")
    wr(replicate(rd("documents"), Seq("doc_id"), Nil), "documents")
    wr(replicate(rd("embeddings"), Seq("vec_id"), Nil), "embeddings")
    spark.stop()
  }
}
