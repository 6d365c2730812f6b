package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.ml.feature.{HashingTF, Normalizer, VectorAssembler}
import org.apache.spark.ml.classification.LogisticRegression

/** Model-based quality filtering — the classifier stage of an LLM data
  * pipeline (CCNet/fasttext shape: a cheap rule labels clear positives
  * and negatives, a linear model over engineered stats + hashed
  * bag-of-words generalizes the judgment and scores the corpus).
  *
  * Scale shape: featurization (HashingTF + L1 Normalizer +
  * VectorAssembler) is map-only; LBFGS training is a bounded number of
  * treeAggregate rounds over the TRAINING SPLIT only (at 100 TB you
  * train on a small labeled sample — here the even-id half plays that
  * role); scoring broadcasts the coefficient vector and is map-only over
  * the full corpus. No shuffle grows with corpus size.
  *
  * The L1 normalization matters: it turns raw token counts into token
  * FREQUENCIES, so ratio-style quality signals (e.g. stopword density)
  * become linear in the features instead of being confounded by
  * document length.
  */
object QualityClassifier {

  /** Fit on `trainFilter` rows labeled by `ruleLabel` (boolean), score
    * the complement: (id, label, prediction) per holdout doc.
    * `numericCols` are engineered per-doc statistics assembled alongside
    * the hashed-BOW block. */
  def predictions(docs: DataFrame, idCol: String, toksCol: String,
                  numericCols: Seq[String], ruleLabel: Column,
                  trainFilter: Column,
                  numFeatures: Int = 1 << 12): DataFrame = {
    val labeled = docs.select(
      (Seq(col(idCol).as("id"), col(toksCol).as("toks"),
        ruleLabel.cast("double").as("label"), trainFilter.as("is_train")) ++
        numericCols.map(col)): _*)
    val tf = new HashingTF().setInputCol("toks").setOutputCol("rawF")
      .setNumFeatures(numFeatures)
    val nrm = new Normalizer().setInputCol("rawF").setOutputCol("bow").setP(1.0)
    val asm = new VectorAssembler()
      .setInputCols((numericCols :+ "bow").toArray).setOutputCol("features")
    // r16: featurization is referenced by BOTH the fit (train split)
    // and the scoring transform (holdout split) — without a barrier
    // the tokenize + hashing pipeline executed once per reference (no
    // AQE stage reuse fires in this codebase). Eager localCheckpoint,
    // never persist (honesty invariant). The train split additionally
    // coalesces toward ~50k rows/partition (floor 1): every LBFGS
    // iteration is a treeAggregate JOB over the split, and 50
    // iterations x 32 near-empty tasks of a ~1k-row sample was pure
    // scheduler overhead; a 100 TB-scale labeled sample still fans out.
    val feats = asm.transform(nrm.transform(tf.transform(labeled)))
      .localCheckpoint(true)
    val train = feats.filter(col("is_train"))
    val trainParts = math.max(1, math.min(
      docs.sparkSession.sparkContext.defaultParallelism,
      (train.count() / 50000L).toInt))
    val model = new LogisticRegression().setMaxIter(50).setRegParam(0.001)
      .setLabelCol("label").setFeaturesCol("features")
      .fit(train.coalesce(trainParts))
    model.transform(feats.filter(!col("is_train")))
      .select(col("id"), col("label"), col("prediction"))
  }

  /** Holdout agreement between the trained model and the labeling rule:
    * one metrics row (n_docs, agreement_ok) for driver gating. */
  def holdoutAgreement(docs: DataFrame, idCol: String, toksCol: String,
                       numericCols: Seq[String], ruleLabel: Column,
                       trainFilter: Column,
                       minAgreement: Double): DataFrame =
    predictions(docs, idCol, toksCol, numericCols, ruleLabel, trainFilter)
      .agg(count(lit(1)).as("n_docs"),
        (avg((col("prediction") === col("label")).cast("double"))
          >= minAgreement).as("agreement_ok"))
}
