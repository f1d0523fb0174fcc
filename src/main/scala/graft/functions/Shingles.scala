package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Distinct w-word shingle set of a text column, as a native Catalyst
  * expression.
  *
  * Semantics (identical to the former HOF pipeline and to the DuckDB
  * oracle's list comprehension): whitespace tokens = split on single
  * space dropping empties; fewer than w tokens → empty array; shingles
  * joined by one space; distinct keeps first occurrence.
  *
  * Why native: the HOF chain (`transform(sequence(...), slice+concat_ws)`
  * then `array_distinct`) is CodegenFallback — interpreted per element,
  * allocating per shingle. On the sf0.1 bench the shingle computation
  * alone cost ~2 s per *evaluation site* (and self-joins evaluate it on
  * both sides), dominating n02/n03. This loop is the scalar kernel the
  * 100 TB scan wants: one pass, one output array.
  */
case class ShingleSet(child: Expression, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    ShingleSet.kernel(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleSet.kernel($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

object ShingleSet {
  def kernel(text: UTF8String, w: Int): ArrayData = {
    val toks = tokenize(text.toString)
    if (toks.length < w) return new GenericArrayData(Array.empty[Any])
    val seen = new mutable.LinkedHashSet[String]
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - w) {
      sb.setLength(0)
      var j = 0
      while (j < w) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    new GenericArrayData(seen.iterator.map(UTF8String.fromString(_)).toArray[Any])
  }

  /** split on single space, drop empties (Spark `split(c, " ")` + remove
    * "" — consecutive/leading/trailing spaces collapse). Shared with
    * [[Winnow]] — the cross-engine oracles assume ONE tokenization. */
  private[functions] def tokenize(s: String): Array[String] = {
    val out = mutable.ArrayBuilder.make[String]
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        if (i > start) out += s.substring(start, i)
        start = i + 1
      }
      i += 1
    }
    out.result()
  }
}

/** k-component MinHash signature over a string-array column (the
  * distinct shingle set), as a native Catalyst expression.
  *
  * Component i = min over shingles of XXH64(shingle bytes, seed = i) —
  * hashed straight off the UTF8String's memory, no per-seed array
  * materialization. The former HOF form (`transform` + `xxhash64` per
  * seed) interpreted k×|set| lambda calls per row (~8 M at sf0.1,
  * ≈ 8 s); this is one tight loop. Hash choice is free w.r.t. the
  * oracle: LSH output is verified against exact Jaccard, never against
  * the sketch itself (see MinHashLsh).
  *
  * Empty input array → all components Long.MaxValue (callers filter
  * empty sets before banding — an empty-set signature must never equal
  * another empty-set signature's bands, and MaxValue bands are
  * join-inert because real minima are astronomically unlikely to all
  * equal MaxValue).
  */
case class MinHashSig(child: Expression, k: Int, md5Mode: Boolean = false)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(ArrayType(StringType))

  override def nullSafeEval(input: Any): Any =
    if (md5Mode) MinHashSig.kernelMd5(input.asInstanceOf[ArrayData], k)
    else MinHashSig.kernel(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      if (md5Mode) s"${ev.value} = graft.functions.MinHashSig.kernelMd5($c, $k);"
      else s"${ev.value} = graft.functions.MinHashSig.kernel($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def kernel(arr: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      val base = s.getBaseObject
      val off = s.getBaseOffset
      val len = s.numBytes()
      var seed = 0
      while (seed < k) {
        val h = XXH64.hashUnsafeBytes(base, off, len, seed.toLong)
        if (h < mins(seed)) mins(seed) = h
        seed += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(Long.box(_)).toArray[Any])
  }

  /** ANSI-expressible variant for oracle-checked sketches: component i =
    * min over shingles of the first 60 bits (15 hex chars) of
    * md5(shingle || '#' || i), i.e. the DuckDB expression
    * `('0x' || substr(md5(s || '#' || i), 1, 15))::UBIGINT`. 60 bits
    * keeps the value positive in a signed long, so signed and unsigned
    * min agree across engines. XXH64 (`eval`) stays the production path —
    * this exists so the sketch itself can be hash-gated against DuckDB.
    */
  // "#<seed>" suffix bytes, precomputed — building the concatenated
  // string per (shingle, seed) cost ~k string encodes per shingle
  private val seedSuffix: Array[Array[Byte]] =
    Array.tabulate(256)(i => ("#" + i).getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def kernelMd5(arr: ArrayData, k: Int): ArrayData = {
    require(k <= seedSuffix.length, s"md5 minhash supports k <= ${seedSuffix.length}")
    val mins = Array.fill(k)(Long.MaxValue)
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val sBytes = arr.getUTF8String(i).getBytes
      var seed = 0
      while (seed < k) {
        md.reset()
        md.update(sBytes)
        md.update(seedSuffix(seed))
        val d = md.digest()
        var be = 0L
        var b = 0
        while (b < 8) { be = (be << 8) | (d(b) & 0xffL); b += 1 }
        val h = be >>> 4
        if (h < mins(seed)) mins(seed) = h
        seed += 1
      }
      i += 1
    }
    new GenericArrayData(mins.map(Long.box(_)).toArray[Any])
  }
}

object Shingles {
  /** Column API: distinct w-shingle set (native kernel). */
  def shingleSet(text: Column, w: Int = 3): Column =
    Bridge.column(ShingleSet(Bridge.expression(text), w))

  /** Column API: k-component MinHash signature (native kernel). */
  def minhashSig(shingleSet: Column, k: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(shingleSet), k))

  /** Column API: md5-based signature (ANSI-expressible; oracle path). */
  def minhashSigMd5(shingleSet: Column, k: Int): Column =
    Bridge.column(MinHashSig(Bridge.expression(shingleSet), k, md5Mode = true))
}
