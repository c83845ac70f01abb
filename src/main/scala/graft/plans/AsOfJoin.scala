package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.GraftInternal
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Logical AS-OF join: for every left row, the LATEST right row with the
  * same key whose timestamp is `<=` the left timestamp (left-outer: the
  * right side is all-NULL when no such row exists).
  *
  * Why a whole operator (SURVEY §7 extension point (c)) instead of a
  * composition: Spark has no native physical as-of join — its own
  * `AsOfJoin` logical node (used by the pandas API) is REWRITTEN by
  * `RewriteAsOfJoin` into an inner join on the key plus a `min_by`
  * aggregation over every candidate pair, which materializes all
  * key-matches before reducing; the engine's q61 union+window
  * composition is scale-correct but evaluates a window chain. The
  * native operator here is the kdb/QuestDB-style SORTED MERGE: both
  * sides cluster by key and sort by (key, ts) — requirements Catalyst
  * satisfies with exactly one exchange per side — then each partition
  * zips in ONE forward pass holding ONE buffered right row, never a
  * candidate set. Time is O(|L| + |R|) per partition with O(1) state.
  *
  * Semantics notes (deliberate, spec-pinned): right rows tied on ts use
  * the right child's (key, ts, tiebreak) sort order — the LAST one wins,
  * matching q61's `last() over (... ts, is_click, event_id)` and
  * DuckDB's ASOF on unique (key, ts). Keys compare with SQL grouping
  * semantics (null key joins null key — same as the window composition,
  * which groups null partitions together).
  */
case class GraftAsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTs: Expression,
    rightTs: Expression,
    rightTiebreak: Seq[Expression]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): GraftAsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Public face of the native operator. */
object AsOf {

  /** As-of join `left` to `right` on equal `keys` with
    * `right.tsCol <= left.tsCol`, latest match wins (ties on right ts
    * broken by `rightTiebreak` order, last wins). Right-side column
    * names must not collide with left's — rename them first (which also
    * gives the right plan fresh attribute ids, so self-joins are safe).
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[(String, String)],
      ts: (String, String), rightTiebreak: Seq[String] = Nil): DataFrame = {
    val s = left.sparkSession
    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty, s"rename right-side columns first, overlap: $dup")
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"column $n not in [${p.output.map(_.name).mkString(", ")}]"))
    GraftInternal.ofRows(s, GraftAsOfJoin(
      lPlan, rPlan,
      keys.map(k => attr(lPlan, k._1)), keys.map(k => attr(rPlan, k._2)),
      attr(lPlan, ts._1), attr(rPlan, ts._2),
      rightTiebreak.map(attr(rPlan, _))))
  }

  /** Convenience: rename every column of `df` with a prefix (fresh
    * attribute ids included — see `join`). */
  def prefixed(df: DataFrame, prefix: String): DataFrame =
    df.select(df.columns.map(c => col(c).as(prefix + c)).toSeq: _*)
}
