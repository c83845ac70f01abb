package graft

import org.apache.spark.sql.DataFrame

/** The measure-then-branch idiom shared by the adaptive operators: a
  * cheap (metadata-only where the input is a bare parquet scan) row
  * count picks between a small-input plan that would be pure overhead
  * at scale and the scale path that would be pure overhead on small
  * inputs. Used by q30 (brute all-pairs vs LSH bucket join) and q73
  * (one-task union-find vs distributed label propagation).
  *
  * Both branches are by-name: only the chosen plan is ever
  * constructed, so the untaken side costs nothing — not even plan
  * analysis. The decision is driver-side but the measured value is a
  * single long; no row data crosses the boundary.
  */
object Gate {
  def byCount(df: DataFrame, gateRows: Long)(small: => DataFrame)(
      large: => DataFrame): DataFrame =
    if (df.count() <= gateRows) small else large
}
