package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic banded interval-overlap join — the equi-join rewrite of
  * `l_lo <= r_hi AND r_lo <= l_hi`, which Spark would otherwise plan
  * as a broadcast-nested-loop (or worse). Both interval sets fan out
  * to the fixed-width buckets they cover, the join runs on bucket
  * equality plus the exact overlap residual, and each overlapping pair
  * is emitted EXACTLY once by keeping only the first bucket the two
  * intervals share (the bucket of max(l_lo, r_lo); integer division is
  * monotone, so greatest-of-buckets = bucket-of-greatest). No distinct
  * pass, no nested loop; cost scales with co-bucketed pairs, and the
  * bucket width is the one tuning knob (AQE re-splits hot buckets).
  */
object Intervals {

  /** Inner-join `left` × `right` on interval overlap (closed bounds,
    * touching endpoints match). Bound columns must be integral
    * (epoch seconds, positions, ...); all columns of both sides pass
    * through. Column names must not collide across sides.
    *
    * Every row is validated BEFORE the fan-out: `hi < lo` (where
    * Spark's `sequence()` would silently generate a descending range
    * and the join semantics stop meaning overlap) and spans wider than
    * `maxSpanBuckets` buckets (where one corrupt interval would fan
    * out to millions of rows and dominate the shuffle) fail the job
    * with the offending bounds in the message, rather than poisoning
    * the result. The cap is a data-quality contract: size it to the
    * widest interval the domain can legitimately produce.
    */
  def overlapJoin(left: DataFrame, right: DataFrame,
                  leftLo: String, leftHi: String,
                  rightLo: String, rightHi: String,
                  bucket: Long, maxSpanBuckets: Long = 1L << 20): DataFrame = {
    require(bucket > 0, s"bucket width must be positive, got $bucket")
    require(maxSpanBuckets > 0,
      s"maxSpanBuckets must be positive, got $maxSpanBuckets")
    require(!left.columns.contains("_b") && !right.columns.contains("_b"),
      "overlapJoin reserves the column name _b; rename it on the input")
    // The guard lives INSIDE the exploded expression so Catalyst can
    // never prune it away from the data path: invalid rows raise at
    // execution with row context instead of silently fanning out.
    def buckets(lo: String, hi: String) = {
      val span = expr(s"$hi DIV $bucket") - expr(s"$lo DIV $bucket")
      // NULL bounds fall to the otherwise-branch (NULL comparison is
      // not true); coalesce keeps the error message non-null so the
      // failure still names the offending row instead of
      // null-propagating into a bare "null" RuntimeException
      def shown(c: String) = coalesce(col(c).cast("string"), lit("NULL"))
      when(col(hi) >= col(lo) && span <= maxSpanBuckets,
        sequence(expr(s"$lo DIV $bucket"), expr(s"$hi DIV $bucket")))
        .otherwise(raise_error(concat(
          lit(s"overlapJoin: invalid or oversized interval [$lo,$hi]=["),
          shown(lo), lit(","), shown(hi),
          lit(s"] (bucket=$bucket, maxSpanBuckets=$maxSpanBuckets)"))))
    }
    // NULL-bound rows DROP (the overlap predicate could never match
    // them) — pinned HERE so the semantics don't depend on whether
    // Catalyst's inferred not-null constraints happen to push below
    // the explode (they usually do, but constraintPropagation is a
    // config, not a contract)
    val lb = left.filter(col(leftLo).isNotNull && col(leftHi).isNotNull)
      .withColumn("_b", explode(buckets(leftLo, leftHi)))
    val rb = right.filter(col(rightLo).isNotNull && col(rightHi).isNotNull)
      .withColumn("_b", explode(buckets(rightLo, rightHi)))
    lb.join(rb, Seq("_b"))
      .filter(col(leftLo) <= col(rightHi) && col(rightLo) <= col(leftHi) &&
        col("_b") === greatest(
          expr(s"$leftLo DIV $bucket"), expr(s"$rightLo DIV $bucket")))
      .drop("_b")
  }
}
