package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.RandomForestClassifier
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.DataFrame

/** Churn model training (SURVEY.md §2.13, parity-optional: VectorAssembler
  * + tree classifier + AUC evaluation + seeded split, the
  * mlflow_experiment_tracking.py:57-159 shape without the tracking
  * service).
  */
object ChurnModel {

  final case class Trained(
      model: org.apache.spark.ml.PipelineModel,
      aucRoc: Double,
      featureImportances: Map[String, Double])

  /** Train on a feature frame with a boolean `labelCol`; returns the
    * fitted pipeline + holdout AUC + per-feature importances. */
  def train(features: DataFrame, featureCols: Seq[String], labelCol: String,
      seed: Long = 42L): Trained = {
    val prepared = features.withColumn("label",
      org.apache.spark.sql.functions.col(labelCol).cast("double"))
    val Array(trainDf, testDf) = prepared.randomSplit(Array(0.8, 0.2), seed)

    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
    val rf = new RandomForestClassifier()
      .setLabelCol("label").setFeaturesCol("features")
      .setNumTrees(20).setMaxDepth(5).setSeed(seed)
    val model = new Pipeline().setStages(Array(assembler, rf)).fit(trainDf)

    val scored = model.transform(testDf)
    val auc = new BinaryClassificationEvaluator()
      .setLabelCol("label").setMetricName("areaUnderROC").evaluate(scored)
    val importances = model.stages.last
      .asInstanceOf[org.apache.spark.ml.classification.RandomForestClassificationModel]
      .featureImportances.toArray
    Trained(model, auc, featureCols.zip(importances).toMap)
  }
}
