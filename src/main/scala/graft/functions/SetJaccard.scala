package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** Fused Jaccard similarity of two string-array sets — the native
  * kernel behind the [[graft.plans.FuseSetJaccard]] optimizer rule.
  *
  * Semantics are EXACTLY
  * `size(array_intersect(a,b)).cast("double") / size(array_union(a,b))`
  * (duplicate elements deduped, null elements counted as one distinct
  * element) — but in ONE pass over each array with NO intermediate
  * arrays: the built-in pair materializes the intersect AND union
  * arrays only for `size` to throw both away, plus each builds its own
  * hash table of the same inputs. At similarity-join verify volume
  * (every candidate pair, both arrays ~doc-shingle sized) the saved
  * allocations are the dominant cost.
  *
  * `failOnDivideByZero` mirrors the Divide the rule replaced: ANSI
  * divide (the Spark 4 default) throws DIVIDE_BY_ZERO when the union
  * is empty (both arrays empty); LEGACY divide returns NULL on a zero
  * divisor (Spark's DivModLike null-guards the divisor before any IEEE
  * op — it is NOT 0/0 = NaN), so the kernel returns null there and the
  * expression is marked nullable accordingly (ADVICE r8). The
  * SQL-registered `graft_jaccard` uses the legacy/null form; the rare
  * case only arises when both sets are empty. */
case class SetJaccard(left: Expression, right: Expression,
    failOnDivideByZero: Boolean = false)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[Bridge.AbstractType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def prettyName: String = "graft_jaccard"

  // beyond null-in/null-out: the legacy form is null on an empty union
  override def nullable: Boolean = !failOnDivideByZero || super.nullable

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    // union == 0 iff both arrays are empty (null elements still count)
    if (!failOnDivideByZero && a.numElements() == 0 && b.numElements() == 0) null
    else SetJaccard.kernel(a, b, failOnDivideByZero)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) =>
      if (failOnDivideByZero)
        s"${ev.value} = graft.functions.SetJaccard.kernel($l, $r, true);"
      else
        s"""
          if ($l.numElements() == 0 && $r.numElements() == 0) {
            ${ev.isNull} = true;
          } else {
            ${ev.value} = graft.functions.SetJaccard.kernel($l, $r, false);
          }""")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SetJaccard =
    copy(left = newLeft, right = newRight)
}

object SetJaccard {
  /** Stand-in hash key for a null element (array_intersect/union treat
    * null as one distinct element equal to itself). */
  private val NullKey = new Object

  def kernel(a: ArrayData, b: ArrayData, failOnDivideByZero: Boolean): Double = {
    val setA = new java.util.HashSet[AnyRef]()
    var i = 0
    while (i < a.numElements()) {
      setA.add(if (a.isNullAt(i)) NullKey else a.getUTF8String(i))
      i += 1
    }
    val seenB = new java.util.HashSet[AnyRef]()
    var inter = 0
    var j = 0
    while (j < b.numElements()) {
      val v: AnyRef = if (b.isNullAt(j)) NullKey else b.getUTF8String(j)
      if (seenB.add(v) && setA.contains(v)) inter += 1
      j += 1
    }
    val union = setA.size + seenB.size - inter
    if (union == 0) {
      // legacy (null) empties never reach the kernel — the expression
      // short-circuits to null before calling it
      if (failOnDivideByZero) throw Bridge.divideByZeroError()
      else throw new IllegalStateException(
        "SetJaccard.kernel called with two empty arrays in legacy mode")
    }
    inter.toDouble / union
  }
}
