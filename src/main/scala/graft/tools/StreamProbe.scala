package graft.tools

/** Repeated-run floors for the [[graft.StreamBench]] lanes (round 11):
  * the suite artifact reports each streaming rate from ONE run at the
  * tail of a full batch bench, which round 9→10 showed can drift ±16%
  * with zero code changes on the lane (dedup_probe 2,019→1,705 rows/s
  * while `bandIndexOf` and the probe plan were untouched). This runs a
  * lane K times in one JVM and prints every rate plus the max — the
  * stable ceiling the one-shot number should be read against.
  *
  * The alert lane takes an optional state-store / API variant to A/B
  * the round-11/12 state hypotheses (AlertProfile pinned the lane's
  * floor to state-store machinery): `alert rocksdb` flips
  * `spark.sql.streaming.stateStore.providerClass` before the runs —
  * the conf is read at query START, so a per-run set is honored —
  * and `alert tws` runs the [[graft.streaming.Pipeline
  * .alertsToWarehouseTws]] transformWithState twin (RocksDB implied:
  * the new API rejects the HDFS store). A trailing key count sizes
  * the state (64 = toy default, 2048 = many-key; one AlertState per
  * key, total fed rows constant).
  *
  * args: lane(sink|dedup|alert|ar1) [runs] [hdfs|rocksdb|tws] [nKeys]
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val lane = args.headOption.getOrElse("dedup")
    val runs = args.drop(1).headOption.map(_.toInt).getOrElse(6)
    val provider = args.drop(2).headOption.getOrElse("hdfs")
    val nKeys = args.drop(3).headOption.map(_.toInt).getOrElse(64)
    val spark = graft.spark.Sessions.local("32", "32")
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if (provider == "rocksdb" || provider == "tws")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val rates = (1 to runs).map { _ =>
      lane match {
        case "sink"  => graft.StreamBench.parquetSinkRate(spark)
        case "dedup" => graft.StreamBench.dedupProbeRate(spark, sf)
        case "alert" => graft.StreamBench.alertUpsertRate(spark, nKeys,
          tws = provider == "tws")
        case "ar1"   => graft.StreamBench.ar1Rate(spark)
        case other   => sys.error(s"unknown lane $other")
      }
    }
    println(f"[streamprobe] $lane provider=$provider keys=$nKeys max=${rates.max}%.1f rows/s  all=${rates.map(r => f"$r%.0f").mkString(",")}")
    spark.stop()
  }
}
