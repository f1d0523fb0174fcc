package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC-4122 version-3 (MD5, name-based) UUID as a native Catalyst expression,
  * hex output with dashes stripped.
  *
  * The reference derives its deterministic record ids this way:
  * `uuid.uuid3(uuid.NAMESPACE_DNS, title+url+pubTime).replace('-','')`
  * (/root/reference/kafka_stream/kafka_s.py:460-468, call sites :322 and
  * :621). Spark has no uuid3 built-in, so this is a custom `UnaryExpression`
  * with full codegen support (stays inside whole-stage codegen; no UDF
  * serialization overhead at 100 TB scale).
  *
  * `namespace` is the 16-byte RFC namespace prefix; `Nil` means "no
  * namespace" (pure MD5 of the UTF-8 name with version/variant bits set),
  * which is the SQL-expressible variant used for the DuckDB oracle.
  */
case class Uuid3(child: Expression, namespace: Seq[Byte])
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = StringType
  // analysis-time type check (with implicit cast where sound) instead of
  // a runtime ClassCastException inside eval/codegen on e.g. an int child
  override def inputTypes: Seq[Bridge.AbstractType] = Seq(StringType)

  override def nullSafeEval(input: Any): Any = {
    val name = input.asInstanceOf[UTF8String].getBytes
    UTF8String.fromString(Uuid3.hexNoDash(namespace.toArray, name))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ns = ctx.addReferenceObj("uuid3ns", namespace.toArray, "byte[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.Uuid3.hexNoDash($ns, $c.getBytes()));")
  }

  override protected def withNewChildInternal(newChild: Expression): Uuid3 =
    copy(child = newChild)
}

object Uuid3 {
  /** uuid.NAMESPACE_DNS = 6ba7b810-9dad-11d1-80b4-00c04fd430c8 */
  val NamespaceDns: Seq[Byte] = Array(
    0x6b, 0xa7, 0xb8, 0x10, 0x9d, 0xad, 0x11, 0xd1,
    0x80, 0xb4, 0x00, 0xc0, 0x4f, 0xd4, 0x30, 0xc8).map(_.toByte).toSeq

  private val HEX = "0123456789abcdef".toCharArray

  def hexNoDash(ns: Array[Byte], name: Array[Byte]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    if (ns.nonEmpty) md.update(ns)
    md.update(name)
    val d = md.digest()
    d(6) = ((d(6) & 0x0f) | 0x30).toByte // version 3
    d(8) = ((d(8) & 0x3f) | 0x80).toByte // RFC variant
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HEX((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HEX(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}

object Ids {
  /** uuid3(NAMESPACE_DNS, name) — reference-parity id (kafka_s.py:460-468). */
  def uuid3(name: Column): Column =
    Bridge.column(Uuid3(Bridge.expression(name), Uuid3.NamespaceDns))

  /** Namespace-free variant: md5(name) with uuid v3 version/variant bits.
    * Same code path as [[uuid3]]; expressible in ANSI SQL for the oracle. */
  def deterministicId(name: Column): Column =
    Bridge.column(Uuid3(Bridge.expression(name), Nil))
}
