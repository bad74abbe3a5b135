package graft

import org.apache.spark.sql.SparkSession

/** One lazily-created local session shared across suites (cheap re-use; the
  * getOrCreate returns the same session in one JVM). */
object SparkTestSession {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .withExtensions(new GraftExtensions) // SQL surface under test everywhere
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

trait SparkTestSession {
  lazy val spark: SparkSession = SparkTestSession.spark
}
