package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level helpers shared across operators. */
object ColumnOps {

  /** Bind `e` to a lambda variable so `f` can reference it many times
    * (including inside higher-order-function lambdas) while evaluating
    * it ONCE per row.
    *
    * Why this exists: a non-attribute expression captured inside a
    * `transform`/`filter`/`aggregate` lambda is re-evaluated PER
    * ELEMENT — HOFs are CodegenFallback and interpret the full embedded
    * subtree on every call. `transform(seq, i => lower(text).substr(i))`
    * lowercases the whole text once per position (O(len²) per row,
    * measured 2× end-to-end on the char-gram screen at sf0.1; the
    * nested-lambda shapes in repetition signals were O(len³)). Wrapping
    * the expensive value in a single-element array and passing it
    * through a lambda variable makes every reference a cheap variable
    * read, with one evaluation per row.
    *
    * Cost: one single-element array allocation per row — noise next to
    * what it saves. Works for any data type, composes with nested
    * lambdas (inner lambdas may close over the outer variable). */
  def bindOnce(e: Column)(f: Column => Column): Column =
    get(transform(array(e), v => f(v)), lit(0))
}
