package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextHashFunctions

/** Benchmark decontamination — the training-data hygiene pass that flags
  * (or drops) training documents sharing verbatim word n-grams with an
  * evaluation/benchmark set, so held-out benchmarks stay held out.
  *
  * Scale shape (the part that must survive 100 TB): benchmark suites are
  * tiny relative to the corpus (MBs of eval text vs TBs of training text),
  * so the distinct benchmark n-gram set is built once and BROADCAST — the
  * corpus side then streams map-only through a broadcast hash join (no
  * corpus shuffle, no corpus n-gram materialization beyond the per-row
  * array), and only the matched (doc, gram) hits — a vanishingly small
  * fraction — shuffle into the per-document hit count. The corpus scan
  * reads exactly two columns (id, text).
  *
  * n-gram semantics are [[graft.functions.WordShingles]]': distinct
  * n-grams per document (so `n_hits` counts DISTINCT contaminated
  * n-grams), documents shorter than `n` tokens collapse to one n-gram of
  * the whole document.
  */
object Decontaminate {

  private def shingles(text: Column, n: Int): Column =
    TextHashFunctions.word_shingles(
      TextHashFunctions.split_ws(trim(text)), n)

  /** Per-document contamination hits: one row per training document that
    * shares ≥1 word `n`-gram with `bench`, with the distinct-overlap count
    * (`n_hits`). Anti-join the result against `docs` to decontaminate. */
  def contaminationHits(docs: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val benchGrams = bench
      .select(explode(shingles(col(textCol), n)).as("gram"))
      .distinct()
    docs
      .select(col(idCol), explode(shingles(col(textCol), n)).as("gram"))
      .join(broadcast(benchGrams), Seq("gram"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_hits"))
  }

  /** The corpus with contaminated documents removed (broadcast anti-join
    * on the same n-gram overlap). */
  def decontaminate(docs: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val hits = contaminationHits(docs, bench, idCol, textCol, n)
    docs.join(hits.select(col(idCol)), Seq(idCol), "left_anti")
  }
}
