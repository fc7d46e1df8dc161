package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's user-visible report surface: accuracy + confusion matrix
  * (SURVEY.md §2.6 rows 19-20 [LINEAGE]; AUC is binary-only in the papers,
  * our labels are 10-class → out of scope).
  */
object Metrics {

  /** (label, predicted, n) from a predictions frame joined to truth. */
  def confusionMatrix(predictions: DataFrame, truth: DataFrame): DataFrame =
    predictions.join(truth, predictions("q_id") === truth("vec_id"))
      .groupBy(col("label"), col("predicted"))
      .agg(count(lit(1)).as("n"))

  /** Single-row accuracy, rounded 6dp (SURVEY §7.4 rule #2). */
  def accuracy(predictions: DataFrame, truth: DataFrame): DataFrame =
    predictions.join(truth, predictions("q_id") === truth("vec_id"))
      .agg(round(avg(when(col("predicted") === col("label"), 1.0).otherwise(0.0)), 6)
        .as("accuracy"))
}
