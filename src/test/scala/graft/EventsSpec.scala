package graft

import org.apache.spark.sql.functions._
import graft.analytics.Events

class EventsSpec extends SparkSpec {

  test("every events query returns rows and has an oracle") {
    assert(Events.queries.keySet == Events.oracles.keySet)
    Events.queries.foreach { case (name, fn) =>
      assert(fn(spark, sf).count() > 0, s"$name returned 0 rows")
    }
  }

  test("sessionization: no intra-session gap exceeds the threshold, session count is sane") {
    val sessions = Events.sessionize(spark, sf)
    // durations are non-negative and every session has >= 1 event
    val bad = sessions.filter(col("duration_s") < 0 || col("n_events") < 1).count()
    assert(bad == 0)
    // total events across sessions == total events in the table
    val total = sessions.agg(sum(col("n_events"))).collect().head.getLong(0)
    assert(total == graft.ingest.Sources.events(spark, sf).count())
  }

  test("sessionization plan shuffles once on user_id (window + groupBy share the exchange)") {
    val p = plan(Events.sessionize(spark, sf))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges == 1, s"expected exactly 1 hash exchange, got $exchanges:\n$p")
  }

  test("event props extraction parses every row's k") {
    val withK = graft.ingest.Sources.events(spark, sf)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
    assert(withK.filter(col("k").isNull).count() == 0)
  }

  test("funnel user counts sum to the number of distinct users") {
    val users = graft.ingest.Sources.events(spark, sf)
      .select(col("user_id")).distinct().count()
    val funnelTotal = Events.eventFunnel(spark, sf)
      .agg(sum(col("n_users"))).collect().head.getLong(0)
    assert(funnelTotal == users)
  }
}
