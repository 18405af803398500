package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextHashFunctions

/** Corpus vocabulary statistics — document frequency and TF-IDF — the
  * substrate for cheap quality classifiers and keyword-based corpus
  * slicing in a training-data pipeline.
  *
  * Scale shape: the corpus-wide pass is ONE shuffle keyed on `term`
  * whose input is already collapsed per partition (map-side combine over
  * per-document DISTINCT terms), so the shuffle volume is bounded by
  * vocabulary-per-partition, not token count. The resulting document-
  * frequency table is vocabulary-sized (≪ corpus — language vocabularies
  * plateau in the millions while corpora grow unbounded), so the idf
  * join back onto per-document terms BROADCASTS; the only other shuffle
  * is the per-document top-k window, which Catalyst pre-truncates on the
  * map side (`WindowGroupLimit`) — the same plan shape the per-group
  * quota cap rides ([[Curation.capPerGroup]]).
  *
  * Tokenization is the pipeline-wide whitespace split
  * ([[graft.functions.WhitespaceSplit]]) so TF-IDF, dedup and the
  * repetition signals all agree on what a token is.
  */
object Vocabulary {

  private def tokens(c: org.apache.spark.sql.Column) =
    TextHashFunctions.split_ws(trim(c))

  /** Document frequency per term: (term, df, idf) with the smoothed
    * `idf = ln((N+1)/(df+1)) + 1` (sklearn's formulation — never zero,
    * defined for unseen terms). One corpus scan, one term-keyed shuffle
    * of per-partition-combined distinct-term counts. */
  def documentFrequency(docs: DataFrame, textCol: String): DataFrame = {
    val n = docs.count()
    docs
      .select(explode(array_distinct(tokens(col(textCol)))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"))
      .withColumn("idf", log((lit(n) + 1.0) / (col("df") + 1.0)) + 1.0)
  }

  /** Top-k terms per document by TF-IDF (`tf = termCount/docLen`), ties
    * broken by term ascending so the result is deterministic. Pass a
    * precomputed [[documentFrequency]] to amortize the corpus pass across
    * calls (it is also the natural unit to persist next to a corpus
    * snapshot); computed from `docs` when absent. */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String, k: Int,
      df: Option[DataFrame] = None): DataFrame = {
    val freq = df.getOrElse(documentFrequency(docs, textCol))
    // counts aggregate INSIDE the row (native TokenCounts) — no (doc, term)
    // groupBy shuffle; all of a doc's term rows stay in its scan partition,
    // so the window's map-side WindowGroupLimit cuts the only shuffle that
    // remains to ≤ k rows per document
    val perTerm = docs
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), size(col("__toks")).as("__len"),
        explode(TextHashFunctions.token_counts(col("__toks"))).as("e"))
      .select(col(idCol), col("__len"), col("e.term").as("term"),
        col("e.cnt").as("tc"))
    val scored = perTerm
      .join(broadcast(freq.select(col("term"), col("idf"))), Seq("term"))
      .withColumn("tfidf", col("tc") / col("__len") * col("idf"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("tfidf").desc, col("term").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("tfidf"))
  }
}
