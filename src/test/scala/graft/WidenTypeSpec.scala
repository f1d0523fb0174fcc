package graft

import org.apache.spark.sql.types._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

/** Algebraic contract of the per-file schema widening
  * ([[Tables.widenType]]): `widenedSchema` folds it over a path's
  * files with `reduceLeft`, so the widened result must not depend on
  * the order the filesystem enumerates files — i.e. the partial
  * operation must be commutative, idempotent and associative on its
  * defined domain (a join semilattice). Pinned by property, not by
  * example: the lattice grows with every new supported widening, and
  * a future non-lattice edge (say int→double but not long→double)
  * would silently re-introduce listing-order dependence. */
class WidenTypeSpec extends AnyFunSuite {

  /** scalatest has no bundled scalacheck bridge in this build (offline
    * cache carries scalatest + scalacheck only), so drive scalacheck
    * directly: 200 cases per property, failure message carries the
    * shrunk counterexample. */
  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private val atomic: Gen[DataType] = Gen.oneOf(
    ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType,
    StringType, BinaryType, BooleanType, DateType, TimestampType,
    TimestampNTZType, DecimalType(10, 2), DecimalType(20, 4))

  private def genType(depth: Int): Gen[DataType] =
    if (depth <= 0) atomic
    else Gen.frequency(
      4 -> atomic,
      2 -> genType(depth - 1).map(ArrayType(_, containsNull = true)),
      1 -> (for {
        n  <- Gen.choose(1, 3)
        ns <- Gen.pick(n, Seq("a", "b", "c", "d"))
        ts <- Gen.listOfN(n, genType(depth - 1))
      } yield StructType(ns.toSeq.sorted.zip(ts).map { case (nm, t) =>
        StructField(nm, t, nullable = true) })))

  private val t2: Gen[DataType] = genType(2)

  /** Struct field ORDER may differ between a·b and b·a (union keeps
    * the left operand's order); compare order-insensitively. */
  private def sameType(x: DataType, y: DataType): Boolean = (x, y) match {
    case (StructType(fx), StructType(fy)) =>
      fx.length == fy.length &&
        fx.sortBy(_.name).zip(fy.sortBy(_.name)).forall { case (a, b) =>
          a.name == b.name && sameType(a.dataType, b.dataType) }
    case (ArrayType(ex, _), ArrayType(ey, _)) => sameType(ex, ey)
    case _ => x == y
  }

  test("widening is idempotent: a ∨ a = a") {
    check(forAll(t2) { a => Tables.widenType(a, a).exists(sameType(_, a)) })
  }

  test("widening is commutative up to struct field order: a ∨ b = b ∨ a") {
    check(forAll(t2, t2) { (a, b) =>
      (Tables.widenType(a, b), Tables.widenType(b, a)) match {
        case (Some(x), Some(y)) => sameType(x, y)
        case (None, None)       => true
        case _                  => false
      }
    })
  }

  test("widening absorbs: (a ∨ b) ∨ a = a ∨ b and (a ∨ b) ∨ b = a ∨ b") {
    check(forAll(t2, t2) { (a, b) =>
      Tables.widenType(a, b).forall { ab =>
        Tables.widenType(ab, a).exists(sameType(_, ab)) &&
          Tables.widenType(ab, b).exists(sameType(_, ab))
      }
    })
  }

  test("widening is associative on its defined domain: (a ∨ b) ∨ c = a ∨ (b ∨ c)") {
    check(forAll(t2, t2, t2) { (a, b, c) =>
      val left  = Tables.widenType(a, b).flatMap(Tables.widenType(_, c))
      val right = Tables.widenType(b, c).flatMap(Tables.widenType(a, _))
      (left, right) match {
        case (Some(x), Some(y)) => sameType(x, y)
        // one grouping may be undefined while the other collapses the
        // conflict first ONLY if the final widened results would agree;
        // for this lattice both sides must fail together
        case (None, None) => true
        case _ => false
      }
    })
  }

  test("never narrows: a ∨ b is readable from both (spot lattice edges)") {
    assert(Tables.widenType(IntegerType, LongType).contains(LongType))
    assert(Tables.widenType(ByteType, ShortType).contains(ShortType))
    assert(Tables.widenType(FloatType, DoubleType).contains(DoubleType))
    assert(Tables.widenType(BinaryType, StringType).contains(StringType))
    // cross-family stays undefined — loud failure, never a lossy pick
    assert(Tables.widenType(LongType, DoubleType).isEmpty)
    assert(Tables.widenType(DateType, TimestampType).isEmpty)
    assert(Tables.widenType(DecimalType(10, 2), DecimalType(20, 4)).isEmpty)
    assert(Tables.widenType(
      ArrayType(FloatType, true), ArrayType(DoubleType, true))
      .contains(ArrayType(DoubleType, true)))
  }
}
