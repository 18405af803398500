package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}

/** Registers the engine's native expressions as SQL functions so the SQL
  * surface (SURVEY §2.1 Q10) can use them alongside built-ins:
  *
  * {{{
  *   SELECT cosine_similarity(a.embedding, b.embedding) FROM ...
  *   SELECT hll_sketch_estimate(hll_sketch_merge(sk)) FROM rollup_table
  * }}}
  */
object GraftFunctionRegistry {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cosine_similarity",
      es => CosineSimilarity(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("vector_dot",
      es => VectorDot(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("minhash_signature",
      es => MinHashSignature(es(0), intArg(es(1), "numHashes"), intArg(es(2), "shingleN")),
      "built-in")
    reg.createOrReplaceTempFunction("simhash64",
      es => SimHash64(es(0)), "built-in")
    reg.createOrReplaceTempFunction("band_keys",
      es => SignatureBandKeys(es(0), intArg(es(1), "bands")), "built-in")
    reg.createOrReplaceTempFunction("hll_sketch_build",
      es => HllSketchAgg(es.head, mergeSketches = false), "built-in")
    reg.createOrReplaceTempFunction("hll_sketch_merge",
      es => HllSketchAgg(es.head, mergeSketches = true), "built-in")
    reg.createOrReplaceTempFunction("hll_sketch_estimate",
      es => HllSketchEstimate(es.head), "built-in")
  }
}
