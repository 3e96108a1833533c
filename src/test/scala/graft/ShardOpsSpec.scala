package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.BoundReference
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateMutableProjection
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{GroupShardOf, ShardOf, ShardSearch}
import graft.operators.Scale

class ShardOpsSpec extends SparkSpec {

  test("binary search matches the cut-count definition exhaustively (ties, key cuts, out-of-range)") {
    // composite cuts: plain value cuts (k = MinValue) and in-value key
    // cuts (the hot-value split) — shard = #cuts <= (b, k)
    val cb = Array(1L, 3L, 3L, 7L)
    val ck = Array(Long.MinValue, Long.MinValue, 5L, 2L)
    def naive(b: Long, k: Long): Long =
      cb.indices.count(i => cb(i) < b || (cb(i) == b && ck(i) <= k)).toLong
    for (b <- -2L to 9L; k <- Seq(Long.MinValue, -1L, 0L, 2L, 5L, 99L))
      assert(ShardSearch.search(cb, ck, b, k) == naive(b, k), s"($b, $k)")
    // grouped twin over the packed [cb… | ck…] layout
    val cuts = new java.util.HashMap[UTF8String, Array[Long]]()
    cuts.put(UTF8String.fromString("g"), cb ++ ck)
    for (b <- -2L to 9L; k <- Seq(Long.MinValue, 0L, 5L, 99L)) {
      assert(ShardSearch.searchGrouped(cuts, UTF8String.fromString("g"), b, k)
        == naive(b, k), s"grouped ($b, $k)")
      assert(ShardSearch.searchGrouped(cuts, UTF8String.fromString("x"), b, k)
        == 0L, "unknown group must shard to 0")
    }
  }

  test("ShardOf / GroupShardOf compile under codegen (no interpreter fallback); nulls propagate") {
    // the r8 Janino-regression discipline: generate the mutable
    // projection directly, so a codegen-compile break fails HERE, not
    // as a silent interpreter fallback in some downstream plan
    val b = BoundReference(0, LongType, nullable = true)
    val k = BoundReference(1, LongType, nullable = true)
    val proj = GenerateMutableProjection.generate(Seq(
      ShardOf(b, k, Array(1L, 5L), Array(Long.MinValue, Long.MinValue))))
    assert(proj(InternalRow(3L, 0L)).getLong(0) == 1L)
    assert(proj(InternalRow(7L, 0L)).getLong(0) == 2L)
    assert(proj(InternalRow(null, 0L)).isNullAt(0))
    val cuts = new java.util.HashMap[UTF8String, Array[Long]]()
    cuts.put(UTF8String.fromString("g"), Array(2L, Long.MinValue))
    val g = BoundReference(0, StringType, nullable = true)
    val b2 = BoundReference(1, LongType, nullable = true)
    val k2 = BoundReference(2, LongType, nullable = true)
    val proj2 = GenerateMutableProjection.generate(Seq(
      GroupShardOf(g, b2, k2, cuts)))
    assert(proj2(InternalRow(UTF8String.fromString("g"), 3L, 0L)).getLong(0) == 1L)
    assert(proj2(InternalRow(UTF8String.fromString("x"), 3L, 0L)).getLong(0) == 0L)
    assert(proj2(InternalRow(null, 3L, 0L)).isNullAt(0))
  }

  test("shard column evaluates inside whole-stage codegen in a DataFrame plan") {
    // range source (a local relation would be pre-evaluated at plan
    // time, leaving no codegen stage to assert on)
    val df = spark.range(100).select(
      Scale.shardCol(Seq((10L, Long.MinValue), (50L, Long.MinValue)),
        col("id"), col("id")).as("s"))
    val counts = df.groupBy(col("s")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == Map(0L -> 10L, 1L -> 40L, 2L -> 50L))
    assert(plan(df).contains("*(1)"),
      "shard expression fell out of whole-stage codegen:\n" + plan(df))
  }
}
