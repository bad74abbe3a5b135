package org.apache.spark.graftshim

import org.apache.hadoop.conf.Configuration
import org.apache.spark.util.SerializableConfiguration

/** Bridge to the `private[spark]` [[SerializableConfiguration]] — the
  * standard (and only) Spark-provided way to ship the session's Hadoop
  * configuration into executor tasks (a bare `Configuration` is not
  * serializable; a bare `new Configuration()` on the executor loses the
  * session's `spark.hadoop.*` credentials / fs impls). Lives in the
  * `org.apache.spark` package tree solely for access; contains no
  * Spark-internal logic. Same pattern as
  * [[org.apache.spark.sql.graftshim.ColumnShim]].
  */
class SerializableHadoopConf(@transient conf: Configuration) extends Serializable {
  private val inner = new SerializableConfiguration(conf)
  def value: Configuration = inner.value
}

object SerializableHadoopConf {
  /** The ACTIVE session's Hadoop conf, captured driver-side for shipping
    * into executor tasks — the one place that builds this, so a future
    * change (e.g. merging per-query options) lands everywhere. Must be
    * called on the driver (readers receive the captured instance). */
  def session(): SerializableHadoopConf =
    new SerializableHadoopConf(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
}
