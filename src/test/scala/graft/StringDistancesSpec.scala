package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{DamerauLevenshtein, StringDistances}

class StringDistancesSpec extends SparkSpec {

  private def d(a: String, b: String): Int =
    StringDistances.damerau(UTF8String.fromString(a), UTF8String.fromString(b))

  test("full Damerau-Levenshtein: known values, incl. the OSA discriminator") {
    // 'CA' -> 'ABC' is THE case separating full DL (2: CA->AC->ABC via
    // transpose then insert, edits on an already-transposed block) from
    // restricted OSA (3) — DuckDB's native function returns 2.
    assert(d("CA", "ABC") == 2)
    assert(d("ab", "ba") == 1)       // one transposition
    assert(d("abcd", "acbd") == 1)   // interior transposition
    assert(d("kitten", "sitting") == 3)
    assert(d("", "abc") == 3 && d("abc", "") == 3 && d("", "") == 0)
    assert(d("same", "same") == 0)
    assert(d("brown blue", "blue brown") <= 8) // word swap, bounded
    // metric axioms on a small alphabet sample
    val words = Seq("abc", "acb", "bac", "ca", "abca", "x", "")
    for (x <- words; y <- words) {
      assert(d(x, y) == d(y, x), s"symmetry($x,$y)")
      assert((d(x, y) == 0) == (x == y), s"identity($x,$y)")
      for (z <- words)
        assert(d(x, z) <= d(x, y) + d(y, z), s"triangle($x,$y,$z)")
    }
  }

  test("expression matches DuckDB's native damerau_levenshtein semantics on random-ish pairs") {
    // deterministic pair set; the real cross-engine gate is the
    // q_damerau_match oracle — this pins a reference table computed
    // once with DuckDB 1.x so the suite catches drift offline
    val expected = Seq(
      ("CA", "ABC", 2), ("ab", "ba", 1), ("ifhs", "fish", 2),
      ("a cat", "an act", 2), ("tan", "ant", 2), ("zzzz", "zz", 2))
    expected.foreach { case (a, b, e) =>
      assert(d(a, b) == e, s"$a vs $b")
    }
  }

  test("damerau_levenshtein compiles under codegen and evaluates row-wise") {
    val a = BoundReference(0, StringType, nullable = true)
    val b = BoundReference(1, StringType, nullable = true)
    val proj = GenerateMutableProjection.generate(
      Seq(DamerauLevenshtein(a, b))) // no interpreter fallback
    val row = org.apache.spark.sql.catalyst.InternalRow(
      UTF8String.fromString("CA"), UTF8String.fromString("ABC"))
    assert(proj(row).getInt(0) == 2)
    // null propagation (nullIntolerant)
    val nrow = org.apache.spark.sql.catalyst.InternalRow(
      null, UTF8String.fromString("ABC"))
    assert(proj(nrow).isNullAt(0))
  }

  test("SQL registration: spark.sql plans the expression") {
    val out = spark.sql(
      "SELECT damerau_levenshtein('ab', 'ba') AS dl").collect()
    assert(out.head.getInt(0) == 1)
  }

  test("column API inside a DataFrame plan with whole-stage codegen") {
    // range source (not a local relation, which ConvertToLocalRelation
    // would pre-evaluate at plan time, leaving no codegen stage)
    val df = spark.range(4)
      .select(graft.functions.StringDistances.damerauLevenshtein(
        concat(lit("ab"), col("id").cast("string")), lit("ba0")).as("dl"))
    // ab0->ba0 = 1 transposition; ab1..ab3 -> ba0 = transposition + sub
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(1, 2, 2, 2))
    // '*(1)' prefix = the Project runs inside a WholeStageCodegen stage
    assert(plan(df).contains("*(1) Project"),
      "expression fell out of whole-stage codegen:\n" + plan(df))
  }
}
