package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass per-document token statistics as a native Catalyst
  * expression: `struct(n_tokens, len_sum, max_len, stop_hits)` over the
  * whitespace tokens of a text column.
  *
  * Semantics are EXACTLY the composable forms it replaces — the
  * explode+aggregate pipeline (n66) and the HOF chain
  * `size(toks) / aggregate(transform(toks, length)) / array_max /
  * size(filter(toks, isin(stopwords)))` (s24/n70): tokens are maximal
  * runs between single spaces (empties dropped), token length counts
  * CODE POINTS (UTF8 non-continuation bytes — identical to Spark's
  * `length()` and DuckDB's `length()`), a 0-token document yields
  * (0, 0, 0, 0) like the coalesced HOF form.
  *
  * Why native: the quality-gate family evaluates four independent
  * HOF/array pipelines over the same text — `split` materializes the
  * token ARRAY once per pipeline (4× per row), `filter`/`aggregate`
  * lambdas run interpreted per element, and the explode form inflates
  * each row into n_tokens shuffle-input rows. This kernel reads the
  * UTF8 bytes ONCE, allocates nothing but the 4-field result row, and
  * stays inside whole-stage codegen — the per-row scan shape an
  * ingest-time gate wants at 100 TB. Measured on the bench surface in
  * the round-9 A/A note (n66/s24/n70).
  */
case class TextStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def dataType: DataType = TextStats.Schema
  override def inputTypes: Seq[Bridge.AbstractType] =
    Seq(org.apache.spark.sql.types.StringType)
  override def prettyName: String = "graft_text_stats"

  override def nullSafeEval(input: Any): Any =
    TextStats.kernel(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TextStats.kernel($c);")

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {

  val Schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("len_sum", LongType, nullable = false),
    StructField("max_len", IntegerType, nullable = false),
    StructField("stop_hits", LongType, nullable = false)))

  /** ASCII byte images of [[Text.Stopwords]] for zero-copy run
    * comparison inside the scan. */
  private val Stop: Array[Array[Byte]] =
    Text.Stopwords.map(_.getBytes("UTF-8")).toArray

  def kernel(text: UTF8String): InternalRow = {
    val bytes = text.getBytes
    val n = bytes.length
    var i = 0
    var nTok = 0L
    var lenSum = 0L
    var maxLen = 0
    var stop = 0L
    while (i < n) {
      if (bytes(i) == ' ') i += 1
      else {
        val start = i
        var chars = 0
        while (i < n && bytes(i) != ' ') {
          if ((bytes(i) & 0xc0) != 0x80) chars += 1
          i += 1
        }
        nTok += 1
        lenSum += chars
        if (chars > maxLen) maxLen = chars
        val tl = i - start
        var s = 0
        var hit = false
        while (s < Stop.length && !hit) {
          val sw = Stop(s)
          if (sw.length == tl) {
            var k = 0
            while (k < tl && sw(k) == bytes(start + k)) k += 1
            hit = k == tl
          }
          s += 1
        }
        if (hit) stop += 1
      }
    }
    new GenericInternalRow(Array[Any](nTok, lenSum, maxLen, stop))
  }

  def textStats(c: Column): Column = Bridge.column(TextStats(Bridge.expression(c)))
}
