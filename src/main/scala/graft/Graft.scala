package graft

import org.apache.spark.sql.SparkSession

/** Session factory and engine-wide conventions.
  *
  * Conventions (SURVEY.md §7.1): everything is DataFrame/Dataset over
  * Parquet; AQE on (runtime join-strategy switch + skew handling stand in
  * for the reference's hand-rolled shard parallelism,
  * /root/reference/README.md:45-48); UTC session timezone for oracle
  * parity; shuffle partitions sized to local cores, not the 200 default —
  * on a real cluster this is instead set ≈ 2-3× total executor cores.
  */
object Graft {

  /** Default local parallelism: matches the driver's local[32] rig. */
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def session(master: String = s"local[$cpus]", appName: String = "graft"): SparkSession = {
    val b = SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "127.0.0.1")
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Tune an externally created session (Verify/Bench build their own). */
  def configure(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark
  }
}
