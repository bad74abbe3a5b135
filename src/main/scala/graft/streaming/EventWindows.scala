package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked windowed aggregation over an event stream (SURVEY §2.9's
  * streaming surface beyond the comparator): tumbling-window counts with
  * late-data handling — the standard shape for CDC throughput/lag
  * monitoring.
  *
  * State size is bounded by (windows retained under the watermark ×
  * groups); at scale the aggregation shuffles on (window, group) exactly
  * like its batch counterpart.
  */
object EventWindows {

  /** Tumbling-window counts per `groupCol`, dropping events later than
    * `watermarkDelay` behind the max seen event time. */
  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      groupCol: String,
      windowDuration: String,
      watermarkDelay: String): DataFrame =
    events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration), col(groupCol))
      .count()
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col(groupCol), col("count"))
}
