package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GeneratePredicate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{FirstAgreeBand, SigLaneAgree}

/** The LSH band-join condition must COMPILE as a generated predicate —
  * not silently fall back to interpreted mode.
  *
  * Regression: Spark's `CodegenContext.splitExpressions` and the
  * predicate/WSCG class templates wrap generated bodies in their own
  * `s"""...""".stripMargin`, so any emitted Java line whose first
  * non-whitespace character is `|` is re-parsed as a margin and eaten.
  * FirstAgreeBand once emitted a continuation line starting with `||`;
  * after two template wrappings the operator vanished and Janino threw
  * "')' expected" — every band join ran interpreted. Generated code
  * must keep boolean operators at line ENDS.
  *
  * `GeneratePredicate.generate` (unlike `Predicate.create`) has no
  * interpreter fallback: a compile regression fails this test instead
  * of degrading performance silently.
  */
class PredicateCodegenSpec extends AnyFunSuite {

  private val sigA = BoundReference(0, ArrayType(LongType), nullable = true)
  private val sigB = BoundReference(1, ArrayType(LongType), nullable = true)
  private val band = BoundReference(2, IntegerType, nullable = false)

  /** The exact condition shape of the exactly-once band join as
    * production builds it (TextOps.sigAgreement — NO Round, the n/32
    * score is already an exact 5-decimal binary fraction):
    * band = first_agree_band(a, b, 8) AND
    * sig_lane_agree(a, b) / 32.0 >= threshold.
    */
  private def bandJoinCond(threshold: Double): Expression =
    And(
      EqualTo(band, FirstAgreeBand(sigA, sigB, 8)),
      GreaterThanOrEqual(
        Divide(Cast(SigLaneAgree(sigA, sigB), DoubleType), Literal(32.0)),
        Literal(threshold)))

  /** The historical rounded shape kept under test too — Round's
    * BigDecimal fragment interacts with splitExpressions differently,
    * and the regression this spec exists for surfaced under exactly
    * this wrapper.
    */
  private def roundedBandJoinCond(threshold: Double): Expression =
    And(
      EqualTo(band, FirstAgreeBand(sigA, sigB, 8)),
      GreaterThanOrEqual(
        Round(Divide(Cast(SigLaneAgree(sigA, sigB), DoubleType),
          Literal(32.0)), Literal(5)),
        Literal(threshold)))

  private def row(a: Array[Long], b: Array[Long], bd: Int): InternalRow =
    InternalRow(ArrayData.toArrayData(a), ArrayData.toArrayData(b), bd)

  test("band-join predicate compiles and matches interpreted eval") {
    // throws CompileException if the generated Java is malformed —
    // both the production (round-free) and historical (rounded) shapes
    GeneratePredicate.generate(roundedBandJoinCond(0.5)): Unit
    val compiled = GeneratePredicate.generate(bandJoinCond(0.5))
    val interpreted = InterpretedPredicate(bandJoinCond(0.5))
    val identical = Array.tabulate(32)(_.toLong)
    val half = Array.tabulate(32)(i => if (i < 16) i.toLong else -i.toLong)
    val cases = Seq(
      row(identical, identical, 0), // agrees on band 0 → keep
      row(identical, identical, 3), // band 3 is not the FIRST agreeing
      row(identical, half, 0),      // band 0 agrees, 16/32 lanes = 0.5
      row(half, identical, 7),      // first agreeing band is 0, not 7
      row(identical.take(16) ++ half.drop(16), identical, 4))
    cases.foreach { r =>
      assert(compiled.eval(r) == interpreted.eval(r),
        s"codegen/interpreted disagree on $r")
    }
    // and the semantics pin: identical sigs keep exactly band 0
    assert(compiled.eval(cases(0)) && !compiled.eval(cases(1)))
  }

  test("sig_lane_agree alone compiles under GeneratePredicate") {
    val cond = GreaterThan(SigLaneAgree(sigA, sigB), Literal(8))
    val compiled = GeneratePredicate.generate(cond)
    val full = Array.tabulate(32)(_.toLong)
    assert(compiled.eval(row(full, full, 0)))
    assert(!compiled.eval(row(full, full.map(-_ - 1), 0)))
  }
}
