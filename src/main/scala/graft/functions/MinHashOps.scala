package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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
        var cur = x.getLong(t) % p
        val step = y.getLong(t) % p
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
    if (seen) new GenericArrayData(mins) else null
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
         |    long $step = $y.getLong($t) % ${p}L;
         |    for (int $i = 0; $i < $k; $i++) {
         |      if ($cur < $mins[$i]) $mins[$i] = $cur;
         |      $cur += $step;
         |      if ($cur >= ${p}L) $cur -= ${p}L;
         |    }
         |  }
         |  if ($seen) {
         |    ${ev.value} =
         |      new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
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

object MinHashOps {

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
}
