package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Streaming exact deduplication — the training-pipeline pattern of dropping
  * duplicate documents as they arrive. Dedup state is keyed on the 8-byte
  * content hash (not the text), so per-key state is fixed-width; with an
  * event-time column the bounded variant is `dropDuplicatesWithinWatermark`,
  * which ages state out — the unbounded variant here fits the static-corpus
  * harness (state = one long per distinct doc).
  */
object StreamDedup {

  /** First occurrence (by arrival) of each distinct text in the documents
    * stream; returns (doc_id, h) of survivors.
    */
  def dedupDocuments(spark: SparkSession, sfDir: String,
      queryName: String): DataFrame = {
    val schema: StructType = spark.read.parquet(s"$sfDir/documents.parquet").schema
    val stream = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sfDir)
      .withColumn("h", xxhash64(col("text")))
      .select("doc_id", "h")
      .dropDuplicates("h")
    StreamSupport.runToMemory(stream, queryName)
  }

  /** Bounded-state variant for event-timed streams: dedup state is aged out
    * once the watermark passes an event's time — the production shape when
    * duplicates only arrive within a bounded window (e.g. at-least-once
    * ingestion retries), keeping state O(recent window) instead of O(corpus).
    */
  def dedupEventsWithinWatermark(spark: SparkSession, sfDir: String,
      queryName: String, delay: String = "1 hour"): DataFrame = {
    val stream = StreamSupport.eventsFileStream(spark, sfDir)
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("event_time", timestamp_micros(col("ts_us")))
      .withWatermark("event_time", delay)
      .dropDuplicatesWithinWatermark("event_id")
      .select("event_id", "user_id", "ts_us")
    StreamSupport.runToMemory(stream, queryName)
  }
}
