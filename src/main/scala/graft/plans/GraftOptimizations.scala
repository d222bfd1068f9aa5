package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.ScalaUDF
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/**
 * Catalyst optimizer rule: promote registered distance UDF calls to the
 * native expressions in [[DistanceExpressions]].
 *
 * Users of the SQL surface (`GraftFunctions.registerAll` +
 * `spark.sql("... vector_l2_distance(a, b) ...")`) get Scala UDFs — one
 * boxed Float per element per row. This rule rewrites those calls by
 * registered name into the allocation-lean native expressions, so the SQL
 * path and the Column API path execute identically — including NULL
 * semantics: both sides are STRICT (NULL argument → NULL result, like
 * the reference's PG functions) and both error on null elements INSIDE
 * a vector, so installing the rule never changes observable results.
 * The rewrite only fires for two-argument calls on `array<float>`
 * inputs; anything else is left to the UDF (which remains the semantic
 * reference).
 *
 * This is preference-order (c) from SURVEY §7.3 in miniature: a
 * `Rule[LogicalPlan]` packaged both as a `SparkSessionExtensions`
 * injector ([[GraftExtensions]], for `spark.sql.extensions`) and as
 * [[GraftOptimizations.install]] for an already-running session.
 */
object PromoteDistanceUdfs extends Rule[LogicalPlan] {

  private val promotions: Map[String, (org.apache.spark.sql.catalyst.expressions.Expression,
      org.apache.spark.sql.catalyst.expressions.Expression) =>
      org.apache.spark.sql.catalyst.expressions.Expression] = Map(
    "vector_l2_distance" -> (L2DistanceExpr(_, _)),
    "vector_cosine_distance" -> (CosineDistanceExpr(_, _)),
    "vector_inner_product" -> (InnerProductExpr(_, _)),
    "vector_dot" -> (DotProductExpr(_, _)),
    "vector_l1_distance" -> (L1DistanceExpr(_, _)),
    // r16: the long-tail metrics joined the native family (same
    // kernels, ArrayData in place — see DistanceExpressions)
    "vector_squared_l2_distance" -> (SquaredL2DistanceExpr(_, _)),
    "vector_chebyshev_distance" -> (ChebyshevDistanceExpr(_, _)),
    "vector_hamming_distance" -> (HammingDistanceExpr(_, _)),
    "vector_jaccard_distance" -> (JaccardDistanceExpr(_, _)),
    "vector_dice_distance" -> (DiceDistanceExpr(_, _)),
    "vector_bray_curtis_distance" -> (BrayCurtisDistanceExpr(_, _)),
    "vector_canberra_distance" -> (CanberraDistanceExpr(_, _)),
    "vector_sokal_michener_distance" -> (SokalMichenerDistanceExpr(_, _)),
    "vector_rogers_tanimoto_distance" -> (RogersTanimotoDistanceExpr(_, _)),
    "vector_russell_rao_distance" -> (RussellRaoDistanceExpr(_, _)),
    "vector_matching_coefficient" -> (MatchingCoefficientExpr(_, _)))

  private def isFloatArray(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
    e.dataType match {
      case org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, _) => true
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case udf: ScalaUDF if udf.udfName.exists(promotions.contains) &&
        udf.children.size == 2 && udf.children.forall(isFloatArray) =>
      promotions(udf.udfName.get)(udf.children.head, udf.children(1))
  }
}

/** Builder-time injection: `.config("spark.sql.extensions",
  * "graft.plans.GraftExtensions")` or `.withExtensions(new GraftExtensions)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => PromoteDistanceUdfs)
}

/** Runtime installation on a live session. */
object GraftOptimizations {
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(PromoteDistanceUdfs))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PromoteDistanceUdfs
}
