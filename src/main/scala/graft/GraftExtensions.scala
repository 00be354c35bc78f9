package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.CosineSim

/** The library's `SparkSessionExtensions` hook — how a user of the
  * engine gets graft's native expressions in plain SQL:
  *
  * {{{
  * spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * SELECT graft_cosine(a.embedding, b.embedding) FROM ...
  * }}}
  *
  * For programmatic sessions that didn't boot with the conf,
  * [[GraftExtensions.register]] installs the same functions into a
  * live session's registry (idempotent).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.injected.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private type Builder = Seq[Expression] => Expression

  private val injected: Seq[(String, ExpressionInfo, Builder)] = Seq(
    ("graft_cosine",
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      (args: Seq[Expression]) => CosineSim(args(0), args(1))))

  /** Install graft functions into an already-running session. */
  def register(spark: SparkSession): Unit =
    injected.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
}
