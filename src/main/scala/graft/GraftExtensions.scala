package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{CosineSimilarity, DotProduct, EuclideanDistance}

/** Session-extension registration (SparkSessionExtensions — SURVEY §7 /
  * prompt's custom-operator surface (d)): exposes graft's native
  * Catalyst expressions to SQL, so `spark.sql("SELECT cosine_sim(a, b)")`
  * plans the same codegen'd expression as the Scala DSL.
  *
  * Use either:
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *   // or config: spark.sql.extensions=graft.GraftExtensions
  * or post-hoc on an existing session: `GraftExtensions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.cosineSim)
    e.injectFunction(GraftExtensions.dotProduct)
    e.injectFunction(GraftExtensions.l2Distance)
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[CosineSimilarity].getName, null, name, usage, "")

  private def binary(name: String, f: (Expression, Expression) => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), info(name, s"$name(a, b) over array<float>"),
      exprs => {
        require(exprs.length == 2, s"$name expects 2 arguments, got ${exprs.length}")
        f(exprs(0), exprs(1))
      })

  val cosineSim: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    binary("cosine_sim", CosineSimilarity.apply)
  val dotProduct: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    binary("dot_product", DotProduct.apply)
  val l2Distance: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    binary("l2_distance", EuclideanDistance.apply)

  /** Register on an already-built session (tests / notebooks). */
  def register(spark: SparkSession): Unit =
    Seq(cosineSim, dotProduct, l2Distance).foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        id.funcName, builder, "built-in")
    }
}
