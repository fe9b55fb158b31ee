package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stream-stream watermarked interval join — the attribution shape
  * (click within N minutes of an impression, trade against quote,
  * span against parent span). The reference has no streaming surface
  * at all (request-at-a-time HTTP, `api/app.py`); this rounds out the
  * engine's Structured Streaming family (ingest, windowed rollup,
  * sessionize, live index maintenance) with the remaining core
  * operator: joining two live streams under bounded state.
  *
  * Semantics: INNER join on `leftKey = rightKey` with `rightTs` in
  * `[leftTs, leftTs + window]`. Inner stream-stream joins emit a pair
  * as soon as both sides have arrived (no watermark wait); the
  * watermarks + the time-bound condition let Spark EVICT state — a
  * left row is droppable once the right watermark passes
  * `leftTs + window`, so steady-state store size is
  * rate × (watermark delay + window), independent of stream length.
  * That eviction bound is exactly why the time-bound predicate is
  * REQUIRED here: an unbounded-state inner join would grow without
  * limit at 100 TB/day ingest.
  *
  * Rows later than the watermark delay may be dropped (standard
  * late-data contract); with a delay ≥ the replay disorder the result
  * equals the batch interval join bit-for-bit — which is how the
  * driver query pins this operator to a DuckDB oracle.
  */
object StreamJoin {

  /** @param left      streaming DF; its columns must not collide with
    *                  `right`'s (rename upstream — the attribution
    *                  query shape renames both event_id columns)
    * @param windowSec right row must fall within this many seconds at
    *                  or after the left row
    * @param watermark event-time delay bound for BOTH sides, e.g.
    *                  "10 minutes"; state eviction horizon and
    *                  late-drop cutoff */
  def intervalJoin(left: DataFrame, leftKey: String, leftTs: String,
                   right: DataFrame, rightKey: String, rightTs: String,
                   windowSec: Long, watermark: String): DataFrame = {
    require(windowSec >= 0, s"window must be non-negative, got $windowSec")
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $windowSec SECONDS"))
  }
}
