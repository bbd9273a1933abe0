package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/**
 * Native Catalyst expressions for float-embedding math — the one spot
 * where composing built-in operators is genuinely awkward: a dot product
 * over `array<float>` otherwise needs either an interpreted higher-order
 * fold or a dim-term unrolled `element_at` chain (64 null-checked array
 * probes per row, and the decimal variant overflows the generated-method
 * budget). Each expression here is a single tight loop over the unsafe
 * array data with a real `doGenCode`, dimension-agnostic.
 *
 * Semantics match graft.functions.vectors exactly:
 *  - [[FloatVecDot]]  == vectors.dotUnrolled: left-to-right double
 *    accumulation (deterministic; ~1e-13 error over 64 dims — prefilter
 *    and ranking use only).
 *  - [[FloatVecDotExact]] == vectors.dotExactUnrolled: every product is
 *    converted to decimal through the double's shortest string form
 *    (exactly what Spark's double→decimal(30,20) cast does, HALF_UP) and
 *    summed exactly — bit-identical across engines and parallelism.
 *
 * Registered under `graft_dot` / `graft_dot_exact` either imperatively
 * ([[VectorExpressions.ensureRegistered]] — called by the operators, so
 * any session works) or declaratively via [[GraftExtensions]]
 * (`spark.sql.extensions=graft.plans.GraftExtensions`).
 */
object VecOps {
  /** Exact decimal dot (see class doc); null array elements read as 0. */
  def dotExact(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = java.math.BigDecimal.ZERO
    var i = 0
    while (i < n) {
      val p = a.getFloat(i).toDouble * b.getFloat(i).toDouble
      acc = acc.add(java.math.BigDecimal.valueOf(p)
        .setScale(20, java.math.RoundingMode.HALF_UP))
      i += 1
    }
    acc.doubleValue
  }

  def dotApprox(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    acc
  }
}

abstract class FloatVecBinary extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
}

/** Fast approximate dot product (codegen'd single loop). */
case class FloatVecDot(left: Expression, right: Expression) extends FloatVecBinary {
  override def prettyName: String = "graft_dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dotApprox(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, i, acc) = (ctx.freshName("n"), ctx.freshName("i"), ctx.freshName("acc"))
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
        }
        ${ev.value} = $acc;"""
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Exact decimal-summed dot product (codegen'd call into [[VecOps]]). */
case class FloatVecDotExact(left: Expression, right: Expression) extends FloatVecBinary {
  override def prettyName: String = "graft_dot_exact"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecOps.dotExact(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.VecOps.dotExact($a, $b);")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorExpressions {
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (args => FloatVecDot(args(0), args(1))),
    "graft_dot_exact" -> (args => FloatVecDotExact(args(0), args(1))),
    "graft_del_neighborhood" -> (args => DeletionNeighborhood(args(0), args(1))),
    "graft_del_neighborhood_hash" -> (args => DeletionNeighborhoodHashes(args(0), args(1))),
    "graft_minhash_slices" -> (args => MinhashSlices(args(0), args(1))),
    "graft_md5_prefix64" -> (args => Md5Prefix64(args(0))),
    "graft_in_set" -> (args => InStringSet(args(0), args(1))),
    "graft_blockmean_bits" -> (args => BlockMeanBits(args(0))),
    "graft_unicode_fold" -> (args => UnicodeFold(args(0))))

  private def info(name: String) =
    new ExpressionInfo(classOf[FloatVecDot].getName, null, name,
      s"$name - graft native expression.", "")

  /** Idempotently register the native functions in ANY session (the
    * operators call this, so driver-owned sessions work too). */
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    functions.foreach { case (name, builder) =>
      val id = FunctionIdentifier(name)
      if (!reg.functionExists(id)) reg.registerFunction(id, info(name), builder)
    }
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` injects the native
  * functions at session build time (the declarative registration path). */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit =
    VectorExpressions.functions.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[FloatVecDot].getName, null, name,
          s"$name - graft native expression.", ""),
        builder))
    }
}
