package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** The reference's implicit cadence — "re-run the whole batch pipeline
  * every poll" (SURVEY.md §2.11) — as Structured Streaming foreachBatch:
  * each micro-batch of freshly scraped grid rows flows through the SAME
  * batch plan (Normalize/Arbitrage are plain DataFrame => DataFrame),
  * so batch and streaming share one implementation.
  */
object MicroBatchPipeline {

  /** Attach a batch transformation + sink to a streaming source.
    * @param transform the batch plan to run per micro-batch
    * @param sink      called with the transformed batch + batch id
    */
  def attach(stream: DataFrame,
             transform: DataFrame => DataFrame,
             sink: (DataFrame, Long) => Unit,
             intervalMs: Long = 2000): DataStreamWriter[Row] =
    stream.writeStream
      .trigger(Trigger.ProcessingTime(intervalMs))
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sink(transform(batch), id)
      }

  def start(stream: DataFrame,
            transform: DataFrame => DataFrame,
            sink: (DataFrame, Long) => Unit,
            intervalMs: Long = 2000): StreamingQuery =
    attach(stream, transform, sink, intervalMs).start()
}
