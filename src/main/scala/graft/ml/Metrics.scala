package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's per-batch evaluation metrics (SURVEY §2.5 A3) as
  * distributed DataFrame aggregates — never a driver-side label collect.
  *
  * The reference computes these with sklearn on collected numpy arrays
  * (`SGDC/sgdc.py:102-113`): confusion matrix, accuracy, F1, precision,
  * recall, and `mean_squared_error` logged under the wrong name "rmse" —
  * we name it `mse` (SURVEY §2.11.1).
  */
object Metrics {

  /** Confusion counts: one row per (label, prediction) pair. */
  def confusion(scored: DataFrame,
                labelCol: String = "target",
                predCol: String = "prediction"): DataFrame =
    scored.groupBy(col(labelCol).as("label"), col(predCol).as("prediction"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("label"), col("prediction"))

  /** One-row frame: accuracy, precision, recall, f1, mse for the positive
    * class (1.0). Ratios of conditional counts; `when` guards 0/0 → 0. */
  def binary(scored: DataFrame,
             labelCol: String = "target",
             predCol: String = "prediction"): DataFrame = {
    val l = col(labelCol); val p = col(predCol)
    val tp = sum(when(l === 1.0 && p === 1.0, 1L).otherwise(0L))
    val fp = sum(when(l === 0.0 && p === 1.0, 1L).otherwise(0L))
    val fn = sum(when(l === 1.0 && p === 0.0, 1L).otherwise(0L))
    scored.agg(
      avg(when(l === p, 1.0).otherwise(0.0)).as("accuracy"),
      (tp.cast("double") / greatest(tp + fp, lit(1L))).as("precision"),
      (tp.cast("double") / greatest(tp + fn, lit(1L))).as("recall"),
      (lit(2.0) * tp / greatest(lit(2L) * tp + fp + fn, lit(1L))).as("f1"),
      avg(pow(l - p, 2)).as("mse"))
  }

  /** Multiclass accuracy + per-class precision/recall/F1 (one row per
    * class, macro-averageable), all from a single confusion aggregation —
    * A3 generalized past the binary label set. */
  def multiclass(scored: DataFrame,
                 labelCol: String = "target",
                 predCol: String = "prediction"): DataFrame = {
    val cm = confusion(scored, labelCol, predCol).cache()
    val tp = cm.where(col("label") === col("prediction"))
      .select(col("label").as("cls"), col("cnt").as("tp"))
    val perLabel = cm.groupBy(col("label").as("cls"))
      .agg(sum(col("cnt")).as("n_true"))
    val perPred = cm.groupBy(col("prediction").as("cls"))
      .agg(sum(col("cnt")).as("n_pred"))
    perLabel.join(perPred, Seq("cls"), "full")
      .join(tp, Seq("cls"), "left")
      .select(col("cls"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        (coalesce(col("tp"), lit(0L)).cast("double") /
          greatest(coalesce(col("n_pred"), lit(0L)), lit(1L))).as("precision"),
        (coalesce(col("tp"), lit(0L)).cast("double") /
          greatest(coalesce(col("n_true"), lit(0L)), lit(1L))).as("recall"))
      .withColumn("f1",
        when(col("precision") + col("recall") > 0,
          lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall"))).otherwise(0.0))
      .orderBy(col("cls"))
  }

  case class BinaryMetrics(accuracy: Double, precision: Double,
                           recall: Double, f1: Double, mse: Double)

  /** Collapse the one-row aggregate to a case class (driver receives five
    * doubles — the only data that ever leaves the executors). */
  def binaryCollect(scored: DataFrame,
                    labelCol: String = "target",
                    predCol: String = "prediction"): BinaryMetrics = {
    val r = binary(scored, labelCol, predCol).head()
    BinaryMetrics(r.getDouble(0), r.getDouble(1), r.getDouble(2),
      r.getDouble(3), r.getDouble(4))
  }
}
