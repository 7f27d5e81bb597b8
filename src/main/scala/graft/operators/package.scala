package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

package object operators {

  /** Tie-broken rounding for doubles that are hash-compared against another
    * engine. A true value that lands exactly on a rounding boundary (e.g.
    * 0.4753125 at 6 dp) rounds differently across engines (Spark HALF_UP on
    * the binary double vs DuckDB's decimal-string rounding); nudging by 1e-9
    * — far below any data precision we output, far above double noise —
    * moves such values off the boundary identically on both sides. Mirror as
    * `ROUND(x + 1e-9, n)` in oracle SQL. */
  def stableRound(c: Column, scale: Int): Column =
    round(c + lit(1e-9), scale)

  /** Evaluate `c` exactly once per row and bind it as a lambda variable in
    * `f`'s body. A higher-order-function lambda body re-evaluates every
    * expression inlined into it once PER ELEMENT (and `CollapseProject`
    * happily inlines a single-use alias into a lambda), so e.g. a regex
    * normalization feeding a per-character `transform` silently becomes
    * O(len) regex calls per row. Wrapping the expensive expression as the
    * sole element of an array and `transform`ing over it forces single
    * evaluation: the collection argument of `transform` is evaluated once,
    * and the lambda variable is a plain bound reference. */
  def let(c: Column)(f: Column => Column): Column =
    transform(array(c), f).getItem(0)
}
