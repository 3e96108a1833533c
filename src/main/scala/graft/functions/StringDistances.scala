package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Transposition-aware string edit distance as a native codegen'd
  * Catalyst expression.
  *
  * Spark ships `levenshtein` but nothing transposition-aware, and
  * record-linkage blocking wants one: a swapped character pair is one
  * keystroke, not two independent edits, so plain Levenshtein
  * over-penalizes the single most common human typo class (Damerau
  * 1964 measured ~80% of misspellings as one insert/delete/substitute
  * OR transpose). This is the FULL Damerau–Levenshtein metric
  * (Lowrance & Wagner 1975, the last-occurrence-matrix algorithm) —
  * not the restricted optimal-string-alignment variant — matching
  * DuckDB's native `damerau_levenshtein`, which is what lets the
  * q_damerau_match oracle hash-gate this expression cross-engine on
  * exact integers (no float tolerance anywhere).
  *
  * Engine shape: the kernel is a static JVM method so whole-stage
  * codegen emits one non-virtual call per row (same discipline as
  * Spark's own Levenshtein → UTF8String.levenshteinDistance); the
  * O(|a|·|b|) DP allocates two primitive arrays and, on the all-ASCII
  * fast path (every TPC-H/Latin corpus), a 256-slot last-occurrence
  * table — no boxing, no hashing. Distance is over Java chars (UTF-16
  * units), identical to DuckDB for the Basic Multilingual Plane.
  */
object StringDistances {

  /** Full Damerau–Levenshtein distance. Static so generated code calls
    * it directly. Null handling lives in the expression, not here.
    */
  def damerau(ua: UTF8String, ub: UTF8String): Int = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    val inf = la + lb
    // (la+2) x (lb+2) DP matrix, flattened; row -1 and column -1 hold
    // the `inf` sentinel the transposition recurrence reads through.
    val w = lb + 2
    val d = new Array[Int]((la + 2) * w)
    d(0) = inf
    var i = 0
    while (i <= la) { d((i + 1) * w + 1) = i; d((i + 1) * w) = inf; i += 1 }
    var j = 0
    while (j <= lb) { d(w + j + 1) = j; d(j + 1) = inf; j += 1 }
    // last row (1-based) in which each character occurred in `a`;
    // ASCII/Latin-1 chars hit the array, anything else the fallback map
    val daAscii = new Array[Int](256)
    var daWide: java.util.HashMap[Character, Integer] = null
    def lastRow(c: Char): Int =
      if (c < 256) daAscii(c)
      else if (daWide == null) 0
      else { val v = daWide.get(c); if (v == null) 0 else v.intValue() }
    i = 1
    while (i <= la) {
      var db = 0 // last column (1-based) in b matching a(i-1) so far
      val ca = a.charAt(i - 1)
      j = 1
      while (j <= lb) {
        val cb = b.charAt(j - 1)
        val k = lastRow(cb)
        val l = db
        var cost = 1
        if (ca == cb) { cost = 0; db = j }
        val sub = d(i * w + j) + cost
        val ins = d((i + 1) * w + j) + 1
        val del = d(i * w + j + 1) + 1
        val tra = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        var m = sub
        if (ins < m) m = ins
        if (del < m) m = del
        if (tra < m) m = tra
        d((i + 1) * w + j + 1) = m
        j += 1
      }
      if (ca < 256) daAscii(ca) = i
      else {
        if (daWide == null) daWide = new java.util.HashMap[Character, Integer]()
        daWide.put(ca, i)
      }
      i += 1
    }
    d((la + 1) * w + lb + 1)
  }

  /** Column API over [[DamerauLevenshtein]]. */
  def damerauLevenshtein(a: Column, b: Column): Column =
    GraftBridge.column(DamerauLevenshtein(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}

/** `damerau_levenshtein(a, b)` — see [[StringDistances.damerau]]. */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (_: StringType, _: StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two string arguments, got $l and $r")
    }
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "damerau_levenshtein"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringDistances.damerau(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.StringDistances.damerau($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}
