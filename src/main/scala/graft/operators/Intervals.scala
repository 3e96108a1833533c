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
    */
  def overlapJoin(left: DataFrame, right: DataFrame,
                  leftLo: String, leftHi: String,
                  rightLo: String, rightHi: String,
                  bucket: Long): DataFrame = {
    require(bucket > 0, s"bucket width must be positive, got $bucket")
    require(!left.columns.contains("_b") && !right.columns.contains("_b"),
      "overlapJoin reserves the column name _b; rename it on the input")
    val lb = left.withColumn("_b", explode(sequence(
      expr(s"$leftLo DIV $bucket"), expr(s"$leftHi DIV $bucket"))))
    val rb = right.withColumn("_b", explode(sequence(
      expr(s"$rightLo DIV $bucket"), expr(s"$rightHi DIV $bucket"))))
    lb.join(rb, Seq("_b"))
      .filter(col(leftLo) <= col(rightHi) && col(rightLo) <= col(leftHi) &&
        col("_b") === greatest(
          expr(s"$leftLo DIV $bucket"), expr(s"$rightLo DIV $bucket")))
      .drop("_b")
  }
}
