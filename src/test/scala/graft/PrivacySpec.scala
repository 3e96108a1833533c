package graft

import org.apache.spark.sql.functions._
import graft.analytics.Privacy

class PrivacySpec extends SparkSpec {

  test("piiMask: no raw identifier survives, group_k is the true anonymity-set size") {
    val masked = Privacy.piiMask(spark, sf)
    val rows = masked.collect()
    // pseudonymized columns never carry the raw values
    assert(rows.forall(_.getAs[String]("pseudo_id").length == 16))
    assert(rows.forall(r => r.getAs[String]("name_token").length == 32 &&
      !r.getAs[String]("name_token").contains("Customer")))
    // balance_band is a 100-multiple (generalization, not the raw balance)
    assert(rows.forall(_.getAs[Long]("balance_band") % 100 == 0))
    // group_k on each row equals the recomputed size of its QI group
    val recomputed = masked
      .groupBy(col("nation"), col("segment"), col("balance_band"))
      .agg(count(lit(1)).as("k"), first(col("group_k")).as("claimed"),
        countDistinct(col("group_k")).as("n_claims"))
      .collect()
    assert(recomputed.forall(r => r.getAs[Long]("n_claims") == 1 &&
      r.getAs[Long]("k") == r.getAs[Long]("claimed")),
      "group_k disagrees with the recomputed QI group size")
    // row count preserved: masking is 1:1, never filters
    assert(masked.count() ==
      graft.ingest.Sources.customer(spark, sf).count())
  }

  test("piiMask pseudo_id is deterministic and key-stable across runs") {
    val a = Privacy.piiMask(spark, sf).select("pseudo_id").collect().map(_.getString(0))
    val b = Privacy.piiMask(spark, sf).select("pseudo_id").collect().map(_.getString(0))
    assert(a.sameElements(b))
    assert(a.distinct.length == a.length, "pseudo_id collision on the test keyspace")
  }
}
