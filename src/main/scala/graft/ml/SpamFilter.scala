package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.NaiveBayes
import org.apache.spark.ml.feature.{HashingTF, IDF, RegexTokenizer, StringIndexer, IndexToString}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** M1/M2: the reference's Spam Filter stage (reference diagram.svg:3
  * "Spam Filter (Lambda)" with optional SageMaker endpoint) as a
  * spark.ml pipeline: RegexTokenizer → HashingTF → IDF → NaiveBayes,
  * trained on a (label, text) corpus shaped like the UCI SMS Spam
  * Collection (reference generator.py:45-68).
  *
  * Scoring is a pure model.transform — usable identically on a batch
  * DataFrame or inside a streaming query, matching the
  * Lambda-per-record semantics with vectorized execution instead.
  */
object SpamFilter {

  /** Train on a corpus with columns (label: ham|spam, text). */
  def train(corpus: DataFrame, numFeatures: Int = 4096): PipelineModel = {
    val indexer = new StringIndexer()
      .setInputCol("label").setOutputCol("y")
      .setStringOrderType("alphabetAsc") // ham=0, spam=1, deterministic
    val tok = new RegexTokenizer()
      .setInputCol("text").setOutputCol("tokens")
      .setPattern("\\s+").setToLowercase(true)
    val tf = new HashingTF()
      .setInputCol("tokens").setOutputCol("tf").setNumFeatures(numFeatures)
    val idf = new IDF().setInputCol("tf").setOutputCol("features")
    val nb = new NaiveBayes().setLabelCol("y").setFeaturesCol("features")
      .setModelType("multinomial")
    new Pipeline().setStages(Array(indexer, tok, tf, idf, nb)).fit(corpus)
  }

  /** Score reviews: adds spam_pred (0.0 ham / 1.0 spam) over
    * review_title + review_text, mirroring the generator's
    * title+text split of corpus lines (reference generator.py:181-183). */
  def score(model: PipelineModel, reviews: DataFrame): DataFrame =
    model
      .transform(reviews.withColumn("text",
        concat_ws(" ", col("review_title"), col("review_text"))))
      .withColumnRenamed("prediction", "spam_pred")
      .drop("text", "tokens", "tf", "features", "rawPrediction", "probability", "y")

  /** Accuracy of the model on a labeled corpus. */
  def accuracy(model: PipelineModel, labeled: DataFrame): Double = {
    val scored = model.transform(labeled)
    val agg = scored.agg(
      sum(when(col("prediction") === col("y"), 1).otherwise(0)).cast("double").as("hit"),
      count(lit(1)).cast("double").as("n")).head()
    agg.getDouble(0) / agg.getDouble(1)
  }
}
