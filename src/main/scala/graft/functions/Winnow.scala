package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint selection (Schleimer et al. SIGMOD'03 — the
  * MOSS scheme) as ONE native kernel: positional w-gram md5s, minimum
  * per sliding window of `win`, distinct + ascending sort.
  *
  * Semantics bit-identical to the HOF reference form n22 previously
  * inlined (positional grams — duplicates KEPT, unlike the Jaccard
  * shingle SET; lexicographic min on lowercase hex = byte compare;
  * guarantee: any shared substring of ≥ w+win−1 tokens contributes a
  * shared selected hash) and to the DuckDB oracle's list
  * comprehension.
  *
  * Why native: the HOF pipeline (transform→md5, transform(sequence)→
  * slice+array_min, array_distinct, array_sort) is CodegenFallback —
  * five interpreted passes allocating per window, ~2 s of the sf0.1
  * bench; and its md5-per-window CSE trap (the 101 s regression r2
  * caught) is structurally impossible here: each gram is hashed
  * exactly once in the loop.
  */
case class Winnow(child: Expression, w: Int, win: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    Winnow.kernel(input.asInstanceOf[UTF8String], w, win)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Winnow.kernel($c, $w, $win);")

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}

object Winnow {
  private val hexDigits = "0123456789abcdef".toCharArray

  def kernel(text: UTF8String, w: Int, win: Int): ArrayData = {
    val toks = tokenize(text.toString)
    if (toks.length < w)
      return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val m = toks.length - w + 1
    val hs = new Array[String](m)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < w) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = hexDigits((d(b) >> 4) & 0xf)
        hex(2 * b + 1) = hexDigits(d(b) & 0xf)
        b += 1
      }
      hs(i) = new String(hex)
      i += 1
    }
    val selected = new mutable.TreeSet[String]
    if (m < win) {
      var mn = hs(0)
      var k = 1
      while (k < m) { if (hs(k) < mn) mn = hs(k); k += 1 }
      selected.add(mn)
    } else {
      var s = 0
      while (s <= m - win) {
        var mn = hs(s)
        var k = s + 1
        while (k < s + win) { if (hs(k) < mn) mn = hs(k); k += 1 }
        selected.add(mn)
        s += 1
      }
    }
    new GenericArrayData(
      selected.iterator.map(UTF8String.fromString(_)).toArray[Any])
  }

  // tokenization is shared with ShingleSet — the oracles and the
  // w+win-1 sharing guarantee both assume the two agree exactly, so
  // there must be exactly one implementation of it
  private def tokenize(s: String): Array[String] = ShingleSet.tokenize(s)

  /** Column API: sorted distinct winnowing selection. */
  def winnowSet(text: Column, w: Int = 3, win: Int = 4): Column =
    Bridge.column(Winnow(Bridge.expression(text), w, win))
}
