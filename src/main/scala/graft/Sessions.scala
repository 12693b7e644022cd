package graft

import org.apache.spark.sql.SparkSession

/** Session wiring shared by the runnable mains.
  *
  * The north rule runs this engine via `spark-submit` on a multi-executor
  * cluster; a `.master("local[k]")` or `.config(...)` hardcoded in code
  * OVERRIDES whatever the launcher provided and would silently pin a cluster
  * run to local mode. `spark-submit` materializes its `--master`/`--conf`
  * as `spark.*` system properties in the driver JVM, so every default here
  * applies ONLY when the corresponding property is absent — in-sandbox runs
  * get the tuned local[k] setup, cluster runs keep the cluster's settings.
  */
object Sessions {

  def configIfUnset(b: SparkSession.Builder, key: String, value: String): SparkSession.Builder =
    if (sys.props.contains(key)) b else b.config(key, value)

  def masterIfUnset(b: SparkSession.Builder, default: String): SparkSession.Builder =
    if (sys.props.contains("spark.master") || sys.env.contains("MASTER")) b
    else b.master(default)

  /** The standard local session for a main: local[cores] master + matching
    * shuffle parallelism + AQE, each yielding to launcher-provided values. */
  def local(appName: String, cores: String): SparkSession = {
    var b = SparkSession.builder().appName(appName)
    b = masterIfUnset(b, s"local[$cores]")
    b = configIfUnset(b, "spark.sql.shuffle.partitions", cores)
    b = configIfUnset(b, "spark.sql.adaptive.enabled", "true")
    b = configIfUnset(b, "spark.sql.session.timeZone", "UTC")
    b = configIfUnset(b, "spark.ui.enabled", "false")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
