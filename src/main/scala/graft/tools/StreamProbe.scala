package graft.tools

/** Repeated-run floors for the [[graft.StreamBench]] lanes (round 11):
  * the suite artifact reports each streaming rate from ONE run at the
  * tail of a full batch bench, which round 9→10 showed can drift ±16%
  * with zero code changes on the lane (dedup_probe 2,019→1,705 rows/s
  * while `bandIndexOf` and the probe plan were untouched). This runs a
  * lane K times in one JVM and prints every rate plus the max — the
  * stable ceiling the one-shot number should be read against.
  *
  * The alert lane takes an optional state-store provider to A/B the
  * round-11 RocksDB hypothesis (AlertProfile pinned the lane's floor
  * to state-store machinery): `alert rocksdb` flips
  * `spark.sql.streaming.stateStore.providerClass` before the runs —
  * the conf is read at query START, so a per-run set is honored.
  *
  * args: lane(sink|dedup|alert|ar1) [runs] [hdfs|rocksdb]
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val lane = args.headOption.getOrElse("dedup")
    val runs = args.drop(1).headOption.map(_.toInt).getOrElse(6)
    val provider = args.drop(2).headOption.getOrElse("hdfs")
    val spark = graft.spark.Sessions.local("32", "32")
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if (provider == "rocksdb")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val rates = (1 to runs).map { _ =>
      lane match {
        case "sink"  => graft.StreamBench.parquetSinkRate(spark)
        case "dedup" => graft.StreamBench.dedupProbeRate(spark, sf)
        case "alert" => graft.StreamBench.alertUpsertRate(spark)
        case "ar1"   => graft.StreamBench.ar1Rate(spark)
        case other   => sys.error(s"unknown lane $other")
      }
    }
    println(f"[streamprobe] $lane provider=$provider max=${rates.max}%.1f rows/s  all=${rates.map(r => f"$r%.0f").mkString(",")}")
    spark.stop()
  }
}
