package graft.tools

import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.execution.SparkPlan

/** Broadcast build-side provenance over a FINAL (post-AQE) physical
  * plan. Round 6's audit counted BroadcastExchange nodes but could not
  * say what was being broadcast — which let a broadcast of the ENTIRE
  * postings table read as "the ≤3-row phrase frame". This walks every
  * broadcast's build subtree (crossing query-stage / reused-exchange
  * boundaries) and flags the ones that ship a fact-table scan with no
  * cardinality bound between the scan and the broadcast — the exact
  * shape that inverts (OOM or corpus-sized shuffle) at 100 TB.
  */
object PlanForensics {

  /** Tables that are corpus-sized at the target scale — anything
    * broadcast from these must pass through an aggregate / limit /
    * top-k first. Dim tables (region/nation/customer/supplier/part)
    * are legitimately broadcast whole.
    */
  val CorpusTables: Seq[String] =
    Seq("lineitem", "orders", "events", "documents", "embeddings")

  /** Nodes that bound cardinality independently of corpus size:
    * aggregates collapse to the group domain, limits / top-k to k.
    */
  private val Bounding: Set[String] = Set(
    "GlobalLimitExec", "CollectLimitExec", "TakeOrderedAndProjectExec",
    "HashAggregateExec", "SortAggregateExec", "ObjectHashAggregateExec")

  /** Full traversal, crossing AQE stage facades. */
  def walk(p: SparkPlan): Seq[SparkPlan] =
    p +: GraftBridge.planChildren(p).flatMap(walk)

  private def splitConjuncts(
      e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  /** A corpus-derived broadcast build side, classified by what (if
    * anything) bounds it. `filtered = true` means a Filter sits in the
    * build subtree — a literal key filter (e.g. `vec_id < 10` query
    * sample) is genuinely k-bounded, a selectivity filter is NOT;
    * a human must verify which. `filtered = false` (the hard flag) is
    * a raw fact-table broadcast: guaranteed to invert at scale.
    */
  final case class CorpusBroadcast(tables: String, filtered: Boolean)

  /** One entry per corpus-derived broadcast with no aggregate / limit
    * bound. Empty = every broadcast in the plan is dim-sized or
    * cardinality-bounded.
    */
  def corpusBroadcasts(root: SparkPlan): Seq[CorpusBroadcast] =
    walk(root)
      .filter(_.getClass.getSimpleName == "BroadcastExchangeExec")
      .flatMap { b =>
        val sub = walk(b)
        val bounded = sub.exists(n => Bounding(n.getClass.getSimpleName))
        if (bounded) None
        else {
          val tabs = sub
            .filter(_.getClass.getSimpleName.contains("FileSourceScan"))
            .flatMap(s => CorpusTables.filter(t =>
              s.toString.contains(s"$t.parquet")))
          if (tabs.nonEmpty) {
            // a Filter only counts as (possibly) bounding if it does
            // something beyond null guards: every equi-join build side
            // carries `isnotnull(key)` filters, which reject no
            // meaningful fraction of a fact table — treating them as
            // "filtered" would mean the RAW flag never fires on the
            // exact shape it exists for (found by the negative-path
            // spec; the round-6 phrase-search plan had null guards too)
            val filtered = sub.exists {
              case f: org.apache.spark.sql.execution.FilterExec =>
                splitConjuncts(f.condition).exists(p =>
                  !p.isInstanceOf[org.apache.spark.sql.catalyst.expressions.IsNotNull])
              case _ => false
            }
            Some(CorpusBroadcast(tabs.distinct.sorted.mkString("+"), filtered))
          } else None
        }
      }

  /** The hard flags only: raw (not even filter-bounded) fact-table
    * broadcasts — the round-6 q_phrase_search shape.
    */
  def rawCorpusBroadcasts(root: SparkPlan): Seq[String] =
    corpusBroadcasts(root).filterNot(_.filtered).map(_.tables)
}
