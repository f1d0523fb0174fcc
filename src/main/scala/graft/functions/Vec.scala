package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dot product of two `array<double>` columns as a native Catalyst
  * expression — the hot kernel of every pairwise-similarity join.
  *
  * Left-to-right accumulation (`acc += a(i)*b(i)`), matching exactly the
  * oracle SQL's unrolled fold `((0.0 + t0) + t1) + …`, so doubles are
  * bit-identical across engines.
  *
  * Why native: `aggregate(zip_with(...))` is CodegenFallback (interpreted
  * per element with boxed lambdas). Fine for a 5k-row scan against one
  * query vector (n05/n06), catastrophic inside an O(n²) pair join where
  * the kernel runs tens of millions of times (n13); this stays inside
  * whole-stage codegen.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[Bridge.AbstractType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))

  override def nullSafeEval(l: Any, r: Any): Any =
    DotProduct.kernel(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DotProduct.kernel($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  // named `kernel`, not `eval`: the class inherits eval(InternalRow), which
  // suppresses the static forwarder — generated Java calling X.eval(args)
  // then fails janino compile and the whole stage silently de-codegens
  def kernel(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}

object Vec {
  /** Native dot product (bit-identical to the oracle's unrolled fold). */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Euclidean norm via the native kernel. */
  def norm(a: Column): Column = sqrt(dot(a, a))
}
