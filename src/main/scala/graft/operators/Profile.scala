package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, NumericType, StringType}

/** Table profiling: per-column statistics as tidy (col_name, metric,
  * value) rows — the data-quality snapshot every ingestion pipeline
  * takes before trusting a new drop. Numeric columns get min/max and a
  * decimal-exact mean; strings get length stats; every column gets
  * non-null and exact-distinct counts.
  *
  * Scale: ALL aggregates run in a single pass over the table (one agg
  * node; the distinct counts add Spark's expand-based partial passes),
  * then one row unpivots to the tidy shape — no per-column scans. Means
  * route through DECIMAL so the values are order-independent and
  * oracle-exact.
  */
object Profile {

  /** The (metric suffix, aggregate) set for one column. */
  private def metricsFor(df: DataFrame, c: String): Seq[(String, Column)] = {
    val base = Seq(
      "n_nonnull" -> count(col(c)).cast("double"),
      "n_distinct" -> countDistinct(col(c)).cast("double"))
    df.schema(c).dataType match {
      case _: NumericType => base ++ Seq(
        "min" -> min(col(c)).cast("double"),
        "max" -> max(col(c)).cast("double"),
        "avg" -> (sum(col(c).cast(DecimalType(38, 6))).cast("double") /
          count(col(c))))
      case StringType => base ++ Seq(
        "min_len" -> min(length(col(c))).cast("double"),
        "max_len" -> max(length(col(c))).cast("double"),
        "avg_len" -> (sum(length(col(c)).cast(DecimalType(38, 6))).cast("double") /
          count(col(c))))
      case _ => base
    }
  }

  /** Metric names emitted for `c` (shared with the oracle generator). */
  def metricNames(df: DataFrame, c: String): Seq[String] =
    metricsFor(df, c).map(_._1)

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    require(cols.forall(!_.contains(":")),
      s"column names must not contain ':' (reserved for the metric-key " +
        s"separator; a trailing ':' would mis-parse the unpivot keys): $cols")
    val aggs = cols.flatMap { c =>
      metricsFor(df, c).map { case (m, a) => a.as(s"$c::$m") }
    }
    df.agg(aggs.head, aggs.tail: _*)
      .unpivot(Array.empty[Column], "key", "value")
      .select(
        substring_index(col("key"), "::", 1).as("col_name"),
        substring_index(col("key"), "::", -1).as("metric"),
        col("value"))
      .orderBy("col_name", "metric")
  }
}
