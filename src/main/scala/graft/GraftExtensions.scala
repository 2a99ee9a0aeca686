package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, DotProduct, MinHashSignature}

/** Spark extensions entry point: registers the engine's custom Catalyst
  * expressions for any session, including spark-submit deployments:
  *
  * {{{
  * spark.sql.extensions=graft.GraftExtensions
  * // or: SparkSession.builder().withExtensions(new GraftExtensions)
  * }}}
  *
  * [[GraftSql.registerFunctions]] registers the same builders on an
  * already-built session (the interactive path); both share
  * [[GraftExtensions.builders]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name)

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name), builder))
    }
}

object GraftExtensions {

  /** Name → expression builder for every custom SQL function. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_similarity" -> ((exprs: Seq[Expression]) =>
      CosineSimilarity(exprs(0), exprs(1))),
    "dot_product" -> ((exprs: Seq[Expression]) =>
      DotProduct(exprs(0), exprs(1))),
    "minhash_signature" -> ((exprs: Seq[Expression]) => {
      if (exprs.length != 2)
        throw new IllegalArgumentException(
          s"minhash_signature expects (shingles, k), got ${exprs.length} arguments")
      if (!exprs(1).foldable)
        throw new IllegalArgumentException(
          "minhash_signature: k must be an integer literal")
      val k = exprs(1).eval(null) match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"minhash_signature: k must be an integer literal, got $other")
      }
      MinHashSignature(exprs(0), k)
    }))
}
