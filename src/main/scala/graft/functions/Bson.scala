package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** BSON document (binary column) → canonical JSON text, as a native
  * Catalyst expression.
  *
  * The reference consumes a Mongo-oplog Kafka topic and decodes each
  * message with `BSON.decode` (kafka_s.py:157) before the `o` /
  * `o.$set` envelope handling. On the Spark side the envelope
  * machinery is already JSON-based (`from_json` +
  * [[graft.sources.Kafka.envelopeSchema]]), so BSON support composes
  * as decode-to-JSON → existing path: one expression, no second
  * envelope code path.
  *
  * Decodes the BSON 1.1 subset an oplog envelope uses: double (0x01),
  * string (0x02), document (0x03), array (0x04), binary (0x05, emitted
  * as base64), ObjectId (0x07, emitted as 24-char hex), bool (0x08),
  * UTC datetime (0x09, emitted as ISO-8601 `Instant` text, which
  * Spark's JSON timestamp parser accepts), null (0x0A), int32 (0x10),
  * and int64 (0x12). Unknown element types fail the row to null
  * (malformed-input behavior mirroring `from_json`'s PERMISSIVE mode
  * rather than killing the job).
  */
case class BsonToJson(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = StringType
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(BinaryType)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    BsonToJson.kernel(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // kernel returns null on malformed bytes even for non-null input;
    // nullSafeCodeGen explicitly permits resultCode re-setting isNull
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.BsonToJson.kernel($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): BsonToJson =
    copy(child = newChild)
}

object BsonToJson {

  /** Null on malformed input (truncated doc, unknown type tag). */
  def kernel(bytes: Array[Byte]): UTF8String =
    try {
      val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      val sb = new java.lang.StringBuilder(bytes.length * 2)
      decodeDoc(buf, sb, array = false, depth = 0)
      UTF8String.fromString(sb.toString)
    } catch { case _: RuntimeException | _: java.nio.BufferUnderflowException => null }

  /** Recursion ceiling: corrupt bytes that are thousands of nested doc
    * headers would otherwise StackOverflowError (an Error — it would
    * sail past the malformed-input catch like the OOM the 0x05 branch
    * guards). Real oplog envelopes nest a handful of levels. */
  private val MaxDepth = 64

  private def decodeDoc(buf: ByteBuffer, sb: java.lang.StringBuilder,
      array: Boolean, depth: Int): Unit = {
    if (depth > MaxDepth) throw new RuntimeException("document nests too deep")
    val start = buf.position()
    val len = buf.getInt()
    val end = start + len - 1 // position of the 0x00 terminator
    sb.append(if (array) '[' else '{')
    var first = true
    while (buf.position() < end) {
      val t = buf.get()
      val key = cstring(buf)
      if (!first) sb.append(',')
      first = false
      if (!array) { appendJsonString(sb, key); sb.append(':') }
      t match {
        case 0x01 =>
          val d = buf.getDouble()
          // NaN/Infinity are legal BSON but not JSON — emit as strings
          // (the lossless textual forms) rather than bare tokens that
          // would invalidate the whole document downstream
          if (java.lang.Double.isFinite(d)) sb.append(java.lang.Double.toString(d))
          else appendJsonString(sb, java.lang.Double.toString(d))
        case 0x02 => appendJsonString(sb, string(buf))
        case 0x03 => decodeDoc(buf, sb, array = false, depth + 1)
        case 0x04 => decodeDoc(buf, sb, array = true, depth + 1)
        case 0x05 =>
          val n = buf.getInt(); buf.get() // subtype dropped
          // validate BEFORE allocating: a corrupt length field must
          // null the row, not OOM the executor (OutOfMemoryError is an
          // Error — it would sail past the malformed-input catch)
          if (n < 0 || n > buf.remaining())
            throw new RuntimeException(s"bad binary length $n")
          val b = new Array[Byte](n); buf.get(b)
          appendJsonString(sb, java.util.Base64.getEncoder.encodeToString(b))
        case 0x07 =>
          val b = new Array[Byte](12); buf.get(b)
          appendJsonString(sb, b.map(x => f"${x & 0xff}%02x").mkString)
        case 0x08 => sb.append(if (buf.get() != 0) "true" else "false")
        case 0x09 =>
          appendJsonString(sb,
            java.time.Instant.ofEpochMilli(buf.getLong()).toString)
        case 0x0A => sb.append("null")
        case 0x10 => sb.append(buf.getInt())
        case 0x12 => sb.append(buf.getLong())
        case other => throw new RuntimeException(f"unsupported BSON type 0x$other%02x")
      }
    }
    if (buf.get(end) != 0) throw new RuntimeException("missing document terminator")
    buf.position(end + 1)
    sb.append(if (array) ']' else '}')
  }

  private def cstring(buf: ByteBuffer): String = {
    val start = buf.position()
    while (buf.get() != 0) {}
    val n = buf.position() - start - 1
    new String(buf.array(), buf.arrayOffset() + start, n,
      java.nio.charset.StandardCharsets.UTF_8)
  }

  /** BSON string: int32 byte length INCLUDING the trailing NUL. */
  private def string(buf: ByteBuffer): String = {
    val n = buf.getInt() - 1
    val start = buf.position()
    val s = new String(buf.array(), buf.arrayOffset() + start, n,
      java.nio.charset.StandardCharsets.UTF_8)
    buf.position(start + n)
    if (buf.get() != 0) throw new RuntimeException("unterminated string")
    s
  }

  private def appendJsonString(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case x if x < ' ' => sb.append(f"\\u${x.toInt}%04x")
        case x => sb.append(x)
      }
      i += 1
    }
    sb.append('"')
  }
}

object Bson {
  /** Column API: BSON binary → canonical JSON text. */
  def bsonToJson(c: Column): Column = Bridge.column(BsonToJson(Bridge.expression(c)))
}
