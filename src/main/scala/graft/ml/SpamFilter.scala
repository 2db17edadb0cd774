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

  // All intermediate columns carry a __spam_ prefix so that score() can
  // never clobber or collide with caller columns (a caller frame with
  // its own "features"/"text"/"prediction" — e.g. the embeddings tables
  // — would otherwise fail or silently lose data).
  private val TextCol = "__spam_text"
  private val PredCol = "__spam_prediction"

  /** Train on a corpus with columns (label: ham|spam, text). */
  def train(corpus: DataFrame, numFeatures: Int = 4096): PipelineModel = {
    val indexer = new StringIndexer()
      .setInputCol("label").setOutputCol("__spam_y")
      .setStringOrderType("alphabetAsc") // ham=0, spam=1, deterministic
    val tok = new RegexTokenizer()
      .setInputCol(TextCol).setOutputCol("__spam_tokens")
      .setPattern("\\s+").setToLowercase(true)
    val tf = new HashingTF()
      .setInputCol("__spam_tokens").setOutputCol("__spam_tf").setNumFeatures(numFeatures)
    val idf = new IDF().setInputCol("__spam_tf").setOutputCol("__spam_features")
    val nb = new NaiveBayes().setLabelCol("__spam_y").setFeaturesCol("__spam_features")
      .setPredictionCol(PredCol)
      .setRawPredictionCol("__spam_raw").setProbabilityCol("__spam_prob")
      .setModelType("multinomial")
    new Pipeline().setStages(Array(indexer, tok, tf, idf, nb))
      .fit(corpus.withColumn(TextCol, col("text")))
  }

  private val Intermediates = Seq(TextCol, "__spam_tokens", "__spam_tf",
    "__spam_features", "__spam_raw", "__spam_prob", "__spam_y")

  /** Score reviews: adds spam_pred (0.0 ham / 1.0 spam) over
    * review_title + review_text, mirroring the generator's
    * title+text split of corpus lines (reference generator.py:181-183). */
  def score(model: PipelineModel, reviews: DataFrame): DataFrame =
    model
      .transform(reviews.withColumn(TextCol,
        concat_ws(" ", col("review_title"), col("review_text"))))
      .withColumnRenamed(PredCol, "spam_pred")
      .drop(Intermediates: _*)

  /** Accuracy of the model on a labeled (label, text) corpus. */
  def accuracy(model: PipelineModel, labeled: DataFrame): Double = {
    val scored = model.transform(labeled.withColumn(TextCol, col("text")))
    val agg = scored.agg(
      sum(when(col(PredCol) === col("__spam_y"), 1).otherwise(0)).cast("double").as("hit"),
      count(lit(1)).cast("double").as("n")).head()
    // sum over zero rows is NULL -> an opaque NPE; fail with the cause
    require(agg.getDouble(1) > 0, "accuracy() on an empty labeled corpus")
    agg.getDouble(0) / agg.getDouble(1)
  }
}
