package graft.sources.bucketed

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The int32 narrowing in the decimal row-group pruner must be
  * PROVABLE, not contingent (round 20): precision ≤ 9 decimals are
  * unscaled-int32 physical, and Spark's analysis normally guarantees
  * pushed literals fit — but the pruner is also callable directly, so
  * a literal whose rescaled unscaled value leaves Int range must BAIL
  * the conjunct (no predicate) rather than wrap into one that prunes
  * matching row groups.
  */
class DecimalPruningGuardSpec extends AnyFunSuite {

  private val schema = StructType(Seq(StructField("p", DecimalType(9, 2))))
  private def bd(s: String) = new java.math.BigDecimal(s)

  test("out-of-int-range rescaled literals bail the int32 decimal conjunct") {
    // unscaled at scale 2 = 9_999_999_999_900 — far past Int.MaxValue
    assert(ParquetPruning.predicate(schema, Array(LessThan("p", bd("99999999999.00")))).isEmpty)
    assert(ParquetPruning.predicate(schema,
      Array(GreaterThan("p", bd("-99999999999.00")))).isEmpty)
    // boundary: Int.MaxValue/100 rescales to exactly Int.MaxValue-ish
    assert(ParquetPruning.predicate(schema, Array(EqualTo("p", bd("21474836.47")))).nonEmpty,
      "unscaled == Int.MaxValue still converts")
    assert(ParquetPruning.predicate(schema, Array(EqualTo("p", bd("21474836.48")))).isEmpty,
      "unscaled == Int.MaxValue + 1 must bail")
  }

  test("in-range literals still build predicates; scale mismatch still bails") {
    assert(ParquetPruning.predicate(schema, Array(LessThan("p", bd("123.45")))).nonEmpty)
    // a literal not representable at the column scale bails (pre-existing contract)
    assert(ParquetPruning.predicate(schema, Array(EqualTo("p", bd("1.005")))).isEmpty)
  }

  test("compiled decimal In probe never throws on finer-than-column-scale heap rows") {
    // heap/delta rows can carry a finer scale than the column declares;
    // an unguarded setScale(s) would throw ArithmeticException mid-scan
    // where the exact evaluator (scale-insensitive cmp) answers fine
    val s18 = StructType(Seq(StructField("p", DecimalType(18, 2))))
    val probe = FilterEval.compile(s18, Array(In("p", Array(bd("1.00"), bd("2.00")))))
    assert(!probe(org.apache.spark.sql.Row(bd("1.005"))),
      "1.005 is not representable at scale 2 — definitively not in the list")
    assert(probe(org.apache.spark.sql.Row(bd("2.000"))),
      "a finer REPRESENTATION of a member (2.000) still matches")
    // out-of-precision magnitude: unscaled overflows a long — not in the list, no crash
    assert(!probe(org.apache.spark.sql.Row(new java.math.BigDecimal("9" * 25 + ".00"))))
  }
}
