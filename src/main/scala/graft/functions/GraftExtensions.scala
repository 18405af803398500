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

  override def apply(e: SparkSessionExtensions): Unit =
    // the ONE function table — shared with registerAll so the two
    // registration surfaces cannot drift (they had: extensions sessions
    // were missing minhash_signature, band_keys and all TIME_* functions)
    GraftFunctionRegistry.builders.foreach { case (name, usage, builder) =>
      register(e, name, usage, builder)
    }
}
