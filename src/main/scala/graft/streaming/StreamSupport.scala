package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Shared plumbing for the streaming operators: the events file source (one
  * definition of the nanos conf / schema read / glob-filtered directory
  * stream) and the synchronous memory-sink drain the harness checks use.
  */
private[streaming] object StreamSupport {

  /** The events parquet as a file stream (the source requires a directory —
    * glob-filtered to the events file; schema from a batch read).
    */
  def eventsFileStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.streaming.schemaInference", "false")
    val schema: StructType = spark.read.parquet(s"$sfDir/events.parquet").schema
    spark.readStream
      .schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(sfDir)
  }

  /** Run a streaming DataFrame to a memory sink with AvailableNow, drain it,
    * and return the materialized table (cached — the sink table goes away
    * with the next query of the same name).
    */
  def runToMemory(df: DataFrame, queryName: String,
      outputMode: String = "append"): DataFrame = {
    val q = df.writeStream
      .outputMode(outputMode)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    val out = df.sparkSession.table(queryName)
    out.cache(); out.count()
    out
  }
}
