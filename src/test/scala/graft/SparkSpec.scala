package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM, forked by sbt). */
object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session

  /** Deterministic uniform-[0,1) float corpus, the reference's fixture
    * shape (np.random.rand; FIXTURES.md §B). */
  def corpus(n: Int, dim: Int, seed: Long = 42L): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    (0L until n).map(i => (i, Array.fill(dim)(rnd.nextFloat())))
  }

  def toDF(rows: Seq[(Long, Array[Float])]) = {
    val s = spark
    import s.implicits._
    rows.toDF("id", "embedding")
  }
}
