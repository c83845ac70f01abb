package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.llm.VectorOps

/** Streaming centroid update: batch q102's cross-batch twin, and the
  * online half of what the reference's MiniBatchKMeans actually is —
  * every arriving vector folds into its nearest frozen cell's running
  * (count, element-sums) state, and each batch emits the updated mean
  * per touched cell. After ANY sequence of micro-batches the snapshot
  * equals batch q102 over the union of their rows, because the state
  * is the same commutative monoid q102's partial aggregates ride:
  * element sums in exact fixed-point (scaled-long = DECIMAL(18,9)
  * quanta — the decimal sum a double accumulator could not replay:
  * float addition order would make the emitted mean depend on batch
  * boundaries), counts as plain longs.
  *
  * Assignment arithmetic is the SAME expanded IEEE form as q102
  * (nrm² − 2·v·c + cnrm², ties by cid, strict left-to-right dots), so
  * stream and batch put every vector in the same cell.
  *
  * Scale posture: state is cells × (1 + dim) longs — fixed bytes
  * regardless of stream length; cells give shuffle parallelism;
  * per-arrival work is the dim × cells assignment plus a dim-long
  * fold. Sum headroom: |v_i| ≤ ~4 in this corpus, so each element sum
  * gains ≤ 4·10⁹ per arrival — overflow needs ~2·10⁹ vectors PER CELL;
  * a deployment past that re-scales the quantum or widens to two limbs.
  */
object StreamCentroid {

  case class VecMsg(cell: Long, vecId: Long, scaled: Array[Long])
  case class CellSums(n: Long, sums: Array[Long])
  case class CentroidRow(cell: Long, nMembers: Long, dim: Long, mean: Double)

  /** ||c||² per cell via the same sqrt-then-square chain as the batch
    * expression (nrm² from sqrt keeps the doubles bit-identical). */
  def nrm2Of(cents: Array[Array[Double]]): Array[Double] =
    cents.map(c => {
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s
    })

  /** Nearest cell of the given book — the SAME score arithmetic as
    * batch q102's native graft_ivf_cell argmin (‖c‖²−2·v·c, strict
    * ascending fold, ties to the smallest cid), so stream and batch
    * assign identically by construction, not by measure-zero luck.
    * The book is a PARAMETER — stream-start state is the pinned
    * curation snapshot ([[graft.llm.CurationSnapshot]]), passed by the
    * caller when the stream starts (books-frozen-at-stream-start
    * convention: a re-freeze means starting a new stream). */
  def assign(cents: Array[Array[Double]], centNrm2: Array[Double],
             v: Array[Double]): Int = {
    var best = 0
    var bestS = Double.NaN
    var c = 0
    while (c < cents.length) {
      var dot = 0.0
      var j = 0
      val cv = cents(c)
      while (j < cv.length) { dot += v(j) * cv(j); j += 1 }
      val s = centNrm2(c) - 2.0 * dot
      if (c == 0 || java.lang.Double.compare(s, bestS) < 0) {
        bestS = s; best = c
      }
      c += 1
    }
    best
  }

  /** Batch q102's quantum as a long: floor(x·10⁹) — the exact IEEE
    * product then floor, identical to Spark's floor(col * 1e9) (and
    * DuckDB's floor), so stream and batch sum identical integers.
    * (Replaced the DECIMAL(18,9) HALF_UP cast in lock-step with q102:
    * raw float32 components land on exact decimal midpoints where the
    * engines' decimal rounding modes diverge — r10 sf0.1 triage.) */
  def toScaled(x: Double): Long = math.floor(x * 1e9).toLong

  /** Scaled-sum → mean exactly as batch q102 renders it: one exact
    * long→double conversion (|sum| ≪ 2⁵³), then the same two IEEE
    * divisions in the same order. */
  def meanOf(sumScaled: Long, n: Long): Double =
    sumScaled.toDouble / 1e9 / n

  class CellProcessor
    extends StatefulProcessor[Long, VecMsg, CentroidRow] {
    @transient private var state: ValueState[CellSums] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[CellSums]("sums",
        Encoders.product[CellSums], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[VecMsg],
                                 timerValues: TimerValues): Iterator[CentroidRow] = {
      val cur = Option(state.get())
        .getOrElse(CellSums(0L, new Array[Long](VectorOps.Dim)))
      var n = cur.n
      val sums = cur.sums.clone()
      rows.foreach { m =>
        n += 1
        var i = 0
        while (i < sums.length) { sums(i) += m.scaled(i); i += 1 }
      }
      state.update(CellSums(n, sums))
      // An empty row iterator with no prior state leaves n = 0; meanOf
      // would divide by zero and emit 64 NaN snapshots for the cell.
      if (n == 0) Iterator.empty
      else (0 until VectorOps.Dim).iterator.map(i =>
        CentroidRow(key, n, (i + 1).toLong, meanOf(sums(i), n)))
    }
  }

  /** (vec_id, embedding array<float>) rows → per-batch updated
    * (cell, n_members, dim, mean) snapshots for every touched cell —
    * batch q102's output shape. `cents` is the pinned book frozen at
    * stream start (pass [[graft.llm.CurationSnapshot]].centroids —
    * the snapshot's staleness contract covers this consumer; after a
    * re-freeze, restart the stream with the new pin). */
  def apply(vectors: DataFrame,
            cents: Array[Array[Double]]): Dataset[CentroidRow] = {
    import vectors.sparkSession.implicits._
    val centNrm2 = nrm2Of(cents)
    vectors
      .select(col("vec_id").cast("long").as("vecId"),
        col("embedding").cast("array<double>").as("v"))
      .as[(Long, Array[Double])]
      .map { case (id, v) =>
        VecMsg(assign(cents, centNrm2, v).toLong, id, v.map(toScaled))
      }
      .groupByKey(_.cell)
      .transformWithState(new CellProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
