package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftbridge.CosineSimF32Expr

/** SparkSessionExtensions injector — the public registration path for
  * graft's native expressions, usable via
  * `spark.sql.extensions=graft.plans.GraftExtensions` so plain SQL can call
  * `cosine_f32(a, b)`. (SURVEY.md §7.3: custom Expression registered via
  * SparkSessionExtensions.)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.cosineF32)
}

object GraftExtensions {

  /** Register graft functions on an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graftbridge.Bridge
      .registerFunction(spark, "cosine_f32", exprs => CosineSimF32Expr(exprs.head, exprs(1)))

  val cosineF32: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_f32"),
    new ExpressionInfo(
      classOf[CosineSimF32Expr].getName,
      null,
      "cosine_f32",
      "cosine_f32(a, b) - float32 cosine similarity of two float arrays",
      ""
    ),
    (children: Seq[Expression]) => CosineSimF32Expr(children.head, children(1))
  )
}
