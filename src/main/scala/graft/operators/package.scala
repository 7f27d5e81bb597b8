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
}
