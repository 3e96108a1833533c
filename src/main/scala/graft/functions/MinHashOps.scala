package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for the MinHash signature hot path.
  *
  * The higher-order-function formulation builds K separate
  * `array_min(zip_with(h1, h2, ...))` columns — K traversals of the
  * token arrays, K intermediate arrays, K lambda frames per row. This
  * expression computes ALL K seeded minima in ONE pass over the token
  * words inside WholeStageCodegen: per token, the seeded hashes
  * (h1 + i*h2) mod p are generated incrementally (one conditional-
  * subtract modular ADD per seed — no multiply, no overflow) and
  * folded into a K-lane running minimum.
  *
  * Semantics are identical to the HOF formulation lane by lane, so
  * the DuckDB oracle (which recomputes (h1 + i*h2) % p per seed) is
  * unchanged. Null or length-mismatched inputs and token-less arrays
  * return NULL, mirroring array_min's empty/null behavior; null
  * ELEMENTS are skipped like array_min skips them.
  */
case class MinHashSigs(left: Expression, right: Expression,
                       k: Int, p: Long)
    extends BinaryExpression {

  // fail at plan time, not from generated code mid-job: p = 0 would
  // divide by zero, p > 2^62 would overflow cur + step, k <= 0 would
  // allocate a negative array
  require(k > 0 && p > 0 && p <= (1L << 62),
    s"minhash_sigs needs k > 0 and 0 < p <= 2^62, got k=$k p=$p")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<long> arguments, got $l and $r")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  // nullable even over non-null inputs: empty/mismatched arrays → NULL
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sigs"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    val mins = Array.fill(k)(Long.MaxValue)
    var seen = false
    var t = 0
    while (t < n) {
      if (!x.isNullAt(t) && !y.isNullAt(t)) {
        seen = true
        // normalize into [0, p): the conditional-subtract loop below
        // assumes non-negative operands, and Java's % keeps the
        // dividend's sign. This computes the MATHEMATICAL mod —
        // identical to the HOF `(h1 + i*h2) % p` for the pipeline's
        // non-negative md5 words, and well-defined (not drifting
        // negative) for full-range signed inputs like the documented
        // xxhash64 swap, where the reference side must use pmod too.
        var cur = x.getLong(t) % p
        if (cur < 0) cur += p
        var step = y.getLong(t) % p
        if (step < 0) step += p
        var i = 0
        while (i < k) {
          if (cur < mins(i)) mins(i) = cur
          cur += step
          if (cur >= p) cur -= p
          i += 1
        }
      }
      t += 1
    }
    // primitive-array result — GenericArrayData would box all K longs
    // per row, pure GC churn on the signature map stage
    if (seen) UnsafeArrayData.fromPrimitiveArray(mins) else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val seen = ctx.freshName("seen")
      val t = ctx.freshName("t")
      val cur = ctx.freshName("cur")
      val step = ctx.freshName("step")
      val i = ctx.freshName("i")
      s"""
         |int $n = $x.numElements();
         |if ($y.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $mins = new long[$k];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  boolean $seen = false;
         |  for (int $t = 0; $t < $n; $t++) {
         |    if ($x.isNullAt($t) || $y.isNullAt($t)) continue;
         |    $seen = true;
         |    long $cur = $x.getLong($t) % ${p}L;
         |    if ($cur < 0) $cur += ${p}L;
         |    long $step = $y.getLong($t) % ${p}L;
         |    if ($step < 0) $step += ${p}L;
         |    for (int $i = 0; $i < $k; $i++) {
         |      if ($cur < $mins[$i]) $mins[$i] = $cur;
         |      $cur += $step;
         |      if ($cur >= ${p}L) $cur -= ${p}L;
         |    }
         |  }
         |  if ($seen) {
         |    ${ev.value} = org.apache.spark.sql.catalyst.expressions
         |      .UnsafeArrayData.fromPrimitiveArray($mins);
         |  } else {
         |    ${ev.isNull} = true;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSigs =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression for the SimHash fingerprint hot path.
  *
  * The HOF formulation takes 64 `size(filter(hs, bit-test))` passes
  * over the word arrays per document. This expression folds both
  * 32-bit words of every token into 64 bit-vote counters in ONE
  * traversal and packs the majority bits into the 64-bit fingerprint
  * (word-1 bits 0..31, word-2 bits 32..63 — the same layout as the
  * HOF build it replaces).
  *
  * Vote rule matches the HOF form exactly: bit i is set iff
  * 2 * (#tokens with bit i set) > numElements, with null elements
  * never voting but still counted in the denominator (filter drops
  * them, size does not). An empty array packs to 0L, as 64 zero
  * majorities did before.
  */
case class SimHashPack(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<long> arguments, got $l and $r")
    }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_pack"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    val cnt = new Array[Int](64)
    var t = 0
    while (t < n) {
      if (!x.isNullAt(t)) {
        val w = x.getLong(t)
        var i = 0
        while (i < 32) { cnt(i) += ((w >> i) & 1L).toInt; i += 1 }
      }
      if (!y.isNullAt(t)) {
        val w = y.getLong(t)
        var i = 0
        while (i < 32) { cnt(32 + i) += ((w >> i) & 1L).toInt; i += 1 }
      }
      t += 1
    }
    var fp = 0L
    var i = 0
    while (i < 64) {
      if (2 * cnt(i) > n) fp |= (1L << i)
      i += 1
    }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val cnt = ctx.freshName("cnt")
      val t = ctx.freshName("t")
      val w = ctx.freshName("w")
      val i = ctx.freshName("i")
      val fp = ctx.freshName("fp")
      s"""
         |int $n = $x.numElements();
         |if ($y.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $cnt = new int[64];
         |  for (int $t = 0; $t < $n; $t++) {
         |    if (!$x.isNullAt($t)) {
         |      long $w = $x.getLong($t);
         |      for (int $i = 0; $i < 32; $i++) {
         |        $cnt[$i] += (int) (($w >> $i) & 1L);
         |      }
         |    }
         |    if (!$y.isNullAt($t)) {
         |      long $w = $y.getLong($t);
         |      for (int $i = 0; $i < 32; $i++) {
         |        $cnt[32 + $i] += (int) (($w >> $i) & 1L);
         |      }
         |    }
         |  }
         |  long $fp = 0L;
         |  for (int $i = 0; $i < 64; $i++) {
         |    if (2 * $cnt[$i] > $n) $fp |= (1L << $i);
         |  }
         |  ${ev.value} = $fp;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SimHashPack =
    copy(left = newLeft, right = newRight)
}

/** Count of lane-equal positions between two equal-length long-array
  * signatures — the MinHash agreement numerator. A scalar loop in
  * WholeStageCodegen: the zip_with/aggregate HOF formulation is not
  * codegen-able and one HOF in a projection knocks the whole enclosing
  * stage out of codegen (measured 31 s vs ~3 s on a 5.7M-row LSH
  * collision stream), while unrolling K element_at comparisons as
  * Column arithmetic blows up the generated method instead. NULL on
  * null inputs or length mismatch; null lanes never count as equal.
  */
case class SigLaneAgree(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<long> arguments, got $l and $r")
    }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "sig_lane_agree"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var eq = 0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i))
        eq += 1
      i += 1
    }
    eq
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val eq = ctx.freshName("eq")
      val i = ctx.freshName("i")
      s"""
         |int $n = $x.numElements();
         |if ($y.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $eq = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$x.isNullAt($i) && !$y.isNullAt($i)
         |        && $x.getLong($i) == $y.getLong($i)) $eq++;
         |  }
         |  ${ev.value} = $eq;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SigLaneAgree =
    copy(left = newLeft, right = newRight)
}

/** Smallest band index (bands of `len/bands` consecutive lanes) on
  * which two signatures agree lane-for-lane; Int.MaxValue if none.
  * The exactly-once discipline of a band-bucket join (keep only the
  * collision row whose band equals this) as ONE codegen'd scalar loop
  * — see [[SigLaneAgree]] for why neither the HOF nor the unrolled
  * Column form survives on a collision stream. NULL on null inputs or
  * length mismatch; a null lane makes its band disagree (it would
  * never have produced a bucket collision).
  */
case class FirstAgreeBand(left: Expression, right: Expression, bands: Int)
    extends BinaryExpression {

  require(bands > 0, s"first_agree_band needs bands > 0, got $bands")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<long> arguments, got $l and $r")
    }
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "first_agree_band"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n || n % bands != 0) return null
    val r = n / bands
    var band = 0
    while (band < bands) {
      var ok = true
      var i = band * r
      val end = i + r
      while (ok && i < end) {
        if (x.isNullAt(i) || y.isNullAt(i) || x.getLong(i) != y.getLong(i))
          ok = false
        i += 1
      }
      if (ok) return band
      band += 1
    }
    Int.MaxValue
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val r = ctx.freshName("r")
      val band = ctx.freshName("band")
      val ok = ctx.freshName("ok")
      val i = ctx.freshName("i")
      val end = ctx.freshName("end")
      val res = ctx.freshName("res")
      s"""
         |int $n = $x.numElements();
         |if ($y.numElements() != $n || $n % $bands != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $r = $n / $bands;
         |  int $res = Integer.MAX_VALUE;
         |  for (int $band = 0; $band < $bands && $res == Integer.MAX_VALUE; $band++) {
         |    boolean $ok = true;
         |    int $end = ($band + 1) * $r;
         |    for (int $i = $band * $r; $ok && $i < $end; $i++) {
         |      if ($x.isNullAt($i) || $y.isNullAt($i) ||
         |          $x.getLong($i) != $y.getLong($i)) $ok = false;
         |    }
         |    if ($ok) $res = $band;
         |  }
         |  ${ev.value} = $res;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FirstAgreeBand =
    copy(left = newLeft, right = newRight)
}

object MinHashOps {

  /** Codegen'd lane-agreement count between two signature arrays. */
  def sigLaneAgree(a: Column, b: Column): Column =
    GraftBridge.column(SigLaneAgree(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Codegen'd first lane-agreeing band index (Int.MaxValue if none). */
  def firstAgreeBand(a: Column, b: Column, bands: Int): Column =
    GraftBridge.column(FirstAgreeBand(
      GraftBridge.expression(a), GraftBridge.expression(b), bands))

  /** Codegen'd one-pass 64-bit SimHash fingerprint. */
  def simhashPack(h1: Column, h2: Column): Column =
    GraftBridge.column(SimHashPack(
      GraftBridge.expression(h1), GraftBridge.expression(h2)))

  /** Codegen'd K-lane MinHash signature array. */
  def minhashSigs(h1: Column, h2: Column, k: Int, p: Long): Column =
    GraftBridge.column(MinHashSigs(
      GraftBridge.expression(h1), GraftBridge.expression(h2), k, p))

  /** Reference implementation with built-in higher-order functions —
    * used by specs to pin the custom expression's semantics lane by
    * lane (identical modular arithmetic). Only degenerate inputs
    * differ: a token-less array yields NULL from the kernel but an
    * array of NULL lanes here — both collapse to "no signature"
    * downstream.
    */
  def minhashSigsHof(h1: Column, h2: Column, k: Int, p: Long): Column =
    array((0 until k).map(i =>
      array_min(zip_with(h1, h2,
        (a, b) => (a + lit(i.toLong) * b) % lit(p)))): _*)

  /** HOF reference for [[SimHashPack]] — the 64 size(filter(...))
    * formulation the kernel replaced, kept HERE (not re-implemented in
    * tests) so both reference implementations of the hash family live
    * in one place.
    */
  def simhashPackHof(h1: Column, h2: Column): Column = {
    def word(hs: Column): Column = (0 until 32).map { i =>
      val ones = size(filter(hs,
        h => shiftright(h, i).bitwiseAND(lit(1L)) === 1L))
      shiftleft(when(ones * 2 > size(hs), 1L).otherwise(0L), i)
    }.reduce(_.bitwiseOR(_))
    word(h1).bitwiseOR(shiftleft(word(h2), 32))
  }
}
