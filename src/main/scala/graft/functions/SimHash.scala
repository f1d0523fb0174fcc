package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash (Charikar '02) over a token array, as a native Catalyst
  * expression returning the 16-hex-char digest.
  *
  * Definition (engine-portable, mirrored by the SQL oracle): for each
  * token, take md5(token); hex char j (j=0..15) contributes its nibble's
  * 4 bits; output bit k of char j is 1 iff strictly more than half the
  * tokens have that bit set. Near-duplicate texts differ in few bits, so
  * hamming distance on the digest (or banding on digest quarters) gives
  * O(n) near-dup grouping where MinHash needs a pair join.
  *
  * A custom Expression (not HOFs) because the per-token bit-count loop
  * over 64 counters is a tight scalar kernel — one md5 per token, no
  * intermediate arrays.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = StringType
  // reject non-array children at analysis time, not mid-eval
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(StringType))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val toks = new Array[Array[Byte]](arr.numElements())
    var i = 0
    while (i < toks.length) {
      toks(i) = arr.getUTF8String(i).getBytes
      i += 1
    }
    UTF8String.fromString(SimHash64.simhashHex(toks))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.SimHash64.simhashHexFromArrayData($c));")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  private val HEX = "0123456789abcdef".toCharArray

  def simhashHexFromArrayData(arr: ArrayData): String = {
    val toks = new Array[Array[Byte]](arr.numElements())
    var i = 0
    while (i < toks.length) {
      toks(i) = arr.getUTF8String(i).getBytes
      i += 1
    }
    simhashHex(toks)
  }

  /** counters over the first 8 md5 bytes (= 16 hex nibbles = 64 bits). */
  def simhashHex(tokens: Array[Array[Byte]]): String = {
    val counts = new Array[Int](64)
    val md = java.security.MessageDigest.getInstance("MD5")
    var t = 0
    while (t < tokens.length) {
      md.reset()
      val d = md.digest(tokens(t))
      var j = 0
      while (j < 16) { // hex char j = nibble (high first) of byte j/2
        val nib = if (j % 2 == 0) (d(j / 2) >> 4) & 0xf else d(j / 2) & 0xf
        var k = 0
        while (k < 4) {
          if (((nib >> k) & 1) == 1) counts(j * 4 + k) += 1
          k += 1
        }
        j += 1
      }
      t += 1
    }
    val n = tokens.length
    val out = new Array[Char](16)
    var j = 0
    while (j < 16) {
      var v = 0
      var k = 0
      while (k < 4) {
        if (2 * counts(j * 4 + k) > n) v |= (1 << k)
        k += 1
      }
      out(j) = HEX(v)
      j += 1
    }
    new String(out)
  }
}

object SimHash {
  /** Column API: simhash64(tokensArray) → 16-hex-char digest. */
  def simhash64(tokens: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens)))
}
