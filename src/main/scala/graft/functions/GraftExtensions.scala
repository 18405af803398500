package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions installer — lets any session pick up the engine's
  * native functions at build time:
  *
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * }}}
  *
  * (No custom Rule/SparkStrategy is injected by design — SURVEY §4: all
  * Druid-specific rewrites live in the QueryPlanner before Catalyst, which
  * keeps the optimizer free to push down/prune a fully declarative plan.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo("graft.functions", null, name, usage, "", "", "", "", "", "", "built-in")

  private def register(e: SparkSessionExtensions, name: String, usage: String,
      builder: Seq[Expression] => Expression): Unit =
    e.injectFunction((FunctionIdentifier(name), info(name, usage), builder))

  override def apply(e: SparkSessionExtensions): Unit = {
    register(e, "cosine_similarity", "cosine similarity of two float/double arrays",
      es => CosineSimilarity(es(0), es(1)))
    register(e, "vector_dot", "dot product of two float/double arrays",
      es => VectorDot(es(0), es(1)))
    register(e, "simhash64", "64-bit SimHash of a token array",
      es => SimHash64(es(0)))
    register(e, "hll_sketch_estimate", "finalize an HLL sketch to a distinct count",
      es => HllSketchEstimate(es(0)))
    register(e, "hll_sketch_build", "aggregate values into a mergeable HLL sketch",
      es => HllSketchAgg(es.head, mergeSketches = false))
    register(e, "hll_sketch_merge", "merge pre-built HLL sketches",
      es => HllSketchAgg(es.head, mergeSketches = true))
  }
}
