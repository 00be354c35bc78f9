package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{BoundedCollectList, BoundedCollectSet, CosineSim, DotProduct, PartitionToken, Prefix64, ShingleGenerator, UdtPack, UdtUnpack, VecBucket, VecDecode}

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
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.injected.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // (c)-tier extension points: a whole custom operator (logical node
    // + strategy + two-phase physical plan) and an optimizer rewrite.
    ext.injectPlannerStrategy(s => new graft.plans.TopKStrategy(s))
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinLengthGuard)
  }
}

object GraftExtensions {
  private type Builder = Seq[Expression] => Expression

  private val injected: Seq[(String, ExpressionInfo, Builder)] = Seq(
    ("graft_cosine",
      new ExpressionInfo(classOf[CosineSim].getName, "graft_cosine"),
      (args: Seq[Expression]) => CosineSim(args(0), args(1))),
    ("graft_dot",
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    ("graft_shingles",
      new ExpressionInfo(classOf[ShingleGenerator].getName,
        "graft_shingles"),
      (args: Seq[Expression]) => ShingleGenerator(args(0), args(1))),
    ("graft_collect_bounded",
      new ExpressionInfo(classOf[BoundedCollectList].getName,
        "graft_collect_bounded"),
      (args: Seq[Expression]) => BoundedCollectList(args(0),
        args(1).eval().asInstanceOf[Number].intValue())),
    ("graft_token",
      new ExpressionInfo(classOf[PartitionToken].getName, "graft_token"),
      (args: Seq[Expression]) => PartitionToken(args)),
    ("graft_udt_pack",
      new ExpressionInfo(classOf[UdtPack].getName, "graft_udt_pack"),
      (args: Seq[Expression]) => UdtPack(args.head, args.tail)),
    ("graft_udt_unpack",
      new ExpressionInfo(classOf[UdtUnpack].getName, "graft_udt_unpack"),
      (args: Seq[Expression]) => UdtUnpack(args(0), args(1))),
    ("graft_prefix64",
      new ExpressionInfo(classOf[Prefix64].getName, "graft_prefix64"),
      (args: Seq[Expression]) => Prefix64(args.head)),
    ("graft_vec_decode",
      new ExpressionInfo(classOf[VecDecode].getName, "graft_vec_decode"),
      (args: Seq[Expression]) => VecDecode(args.head)),
    ("graft_vec_bucket",
      new ExpressionInfo(classOf[VecBucket].getName, "graft_vec_bucket"),
      (args: Seq[Expression]) =>
        if (args.length >= 2) VecBucket(args.head,
          args(1).eval().asInstanceOf[Number].intValue())
        else VecBucket(args.head)),
    ("graft_collect_set_bounded",
      new ExpressionInfo(classOf[BoundedCollectSet].getName,
        "graft_collect_set_bounded"),
      (args: Seq[Expression]) => BoundedCollectSet(args(0),
        args(1).eval().asInstanceOf[Number].intValue())))

  /** Install graft functions, the custom-operator strategy, and the
    * optimizer rule into an already-running session (idempotent) — the
    * programmatic twin of booting with
    * `spark.sql.extensions=graft.GraftExtensions`.
    */
  def register(spark: SparkSession): Unit = {
    injected.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info, builder)
    }
    val exp = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .experimental
    if (!exp.extraStrategies.exists(_.isInstanceOf[graft.plans.TopKStrategy]))
      exp.extraStrategies =
        exp.extraStrategies :+ new graft.plans.TopKStrategy(spark)
    if (!exp.extraOptimizations.contains(graft.plans.LevenshteinLengthGuard))
      exp.extraOptimizations =
        exp.extraOptimizations :+ graft.plans.LevenshteinLengthGuard
  }
}
