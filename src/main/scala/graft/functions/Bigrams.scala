package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Adjacent-bigram array of a text column ("w1 w2" per position,
  * duplicates KEPT — these are occurrences, not a set), as a native
  * Catalyst expression.
  *
  * Why native: the HOF form (`transform(sequence(...),
  * struct(element_at...))`) is CodegenFallback — measured 2.3 s for
  * the bigram stage alone over sf0.1 documents vs 0.1 s for a plain
  * token explode; it was the whole bottleneck of n45/n49. Same
  * single-pass kernel shape as [[ShingleSet]], sharing its tokenizer
  * so the DuckDB oracles' `string_split`-based twins stay exact.
  * Fewer than 2 tokens → empty array.
  */
case class BigramArray(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(StringType)
  override def prettyName: String = "graft_bigrams"

  override def nullSafeEval(input: Any): Any =
    BigramArray.kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BigramArray.kernel($c);")

  override protected def withNewChildInternal(newChild: Expression): BigramArray =
    copy(child = newChild)
}

object BigramArray {
  def kernel(text: UTF8String): ArrayData = {
    val toks = ShingleSet.tokenize(text.toString)
    if (toks.length < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - 1)
    var i = 0
    while (i < toks.length - 1) {
      out(i) = UTF8String.fromString(toks(i) + " " + toks(i + 1))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API form. */
  def bigrams(c: Column): Column =
    Bridge.column(BigramArray(Bridge.expression(c)))
}
