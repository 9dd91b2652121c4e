package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.{GBTClassifier, RandomForestClassifier}
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame

/** Churn model training (SURVEY.md §2.13, parity-optional: VectorAssembler
  * + tree classifiers + AUC evaluation + seeded split, the
  * mlflow_experiment_tracking.py:57-159 shape without the tracking
  * service). The reference trains BOTH RandomForest and GBT and compares
  * AUC; `train` does the same and surfaces the winner as `best`.
  */
object ChurnModel {

  final case class ModelResult(
      name: String,
      model: org.apache.spark.ml.PipelineModel,
      aucRoc: Double,
      featureImportances: Map[String, Double])

  final case class Trained(models: Seq[ModelResult]) {
    /** Highest holdout AUC (name tiebreak for determinism). NaN AUC — the
      * evaluator's result on an empty or single-class holdout — ranks
      * BELOW every real number here (Scala's Double ordering would rank
      * it above, silently crowning an unevaluable model); all-NaN fails
      * loudly instead of returning a meaningless winner — LAZILY, at the
      * point a winner is asked for, so a caller inspecting only
      * models/aucByModel (e.g. for importances) keeps both fitted
      * pipelines instead of losing the whole training run. */
    lazy val best: ModelResult = {
      require(models.exists(!_.aucRoc.isNaN),
        "no model has a valid holdout AUC (empty or single-class holdout?)")
      models.maxBy(m =>
        (if (m.aucRoc.isNaN) Double.NegativeInfinity else m.aucRoc, m.name))
    }
    def model: org.apache.spark.ml.PipelineModel = best.model
    def aucRoc: Double = best.aucRoc
    def featureImportances: Map[String, Double] = best.featureImportances
    def aucByModel: Map[String, Double] = models.map(m => m.name -> m.aucRoc).toMap
  }

  /** Train RF + GBT on a feature frame with a boolean `labelCol`; returns
    * both fitted pipelines with holdout AUC + per-feature importances. */
  def train(features: DataFrame, featureCols: Seq[String], labelCol: String,
      seed: Long = 42L): Trained = {
    // scalar columns only: a vector-typed input would expand to multiple
    // assembler slots, and featureCols.zip(importances) would silently
    // truncate with SHIFTED alignment — every importance after the vector
    // attributed to the wrong feature
    featureCols.foreach { c =>
      require(features.schema(c).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"feature column $c must be a numeric scalar (got " +
          s"${features.schema(c).dataType.simpleString}); explode vector " +
          "columns into scalars before train() or importances misalign")
    }
    // target-leakage and reserved-name guards (the Quality/ZOrder
    // posture): withColumn("label") would silently REPLACE a feature
    // named 'label' with the target itself — near-perfect AUC, no error
    require(!featureCols.contains(labelCol),
      s"labelCol '$labelCol' must not also be a feature (target leakage)")
    require(!featureCols.contains("label") && !featureCols.contains("features"),
      "feature columns must not use the reserved names 'label'/'features'")
    require(labelCol == "label" || !features.columns.contains("label"),
      "input carries a 'label' column that is not the labelCol — rename it " +
        "(reserved for the cast target)")
    require(!features.columns.contains("features"),
      "input must not carry a 'features' column (reserved for the assembler)")
    val prepared = features.withColumn("label",
      org.apache.spark.sql.functions.col(labelCol).cast("double"))
    // cache BEFORE the split: randomSplit samples each half from its
    // parent independently, and a nondeterministic upstream lineage
    // (round-robin repartition) could otherwise put a row in both train
    // and holdout — silent AUC inflation
    prepared.cache()
    val Array(trainDf, testDf) = prepared.randomSplit(Array(0.8, 0.2), seed)
    trainDf.cache(); testDf.cache()

    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
    val rf = new RandomForestClassifier()
      .setLabelCol("label").setFeaturesCol("features")
      .setNumTrees(20).setMaxDepth(5).setSeed(seed)
    val gbt = new GBTClassifier()
      .setLabelCol("label").setFeaturesCol("features")
      .setMaxIter(20).setMaxDepth(5).setSeed(seed)
    val evaluator = new BinaryClassificationEvaluator()
      .setLabelCol("label").setMetricName("areaUnderROC")

    val results = Seq("random_forest" -> rf, "gbt" -> gbt).map {
      case (name, clf) =>
        val model = new Pipeline().setStages(Array(assembler, clf)).fit(trainDf)
        val auc = evaluator.evaluate(model.transform(testDf))
        // both tree models expose Gini-based featureImportances
        val importances = model.stages.last match {
          case m: org.apache.spark.ml.classification.RandomForestClassificationModel =>
            m.featureImportances
          case m: org.apache.spark.ml.classification.GBTClassificationModel =>
            m.featureImportances
        }
        ModelResult(name, model, auc,
          featureCols.zip(vecToArray(importances)).toMap)
    }
    trainDf.unpersist(); testDf.unpersist()
    Trained(results)
  }

  private def vecToArray(v: Vector): Array[Double] = v.toArray
}
