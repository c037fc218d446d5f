package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.OutputMode

/** W1 driver: run the ProgressStream dataflow over a real unbounded file
  * source (`readStream.text`) — the Spark-native form of the reference's
  * stdout line stream (`interface.py:166-168`). New files dropped into
  * the watched directory are picked up by subsequent micro-batches.
  * Usage: runMain graft.tools.StreamDemo <watchDir> <timeoutMs>
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val watchDir = args(0)
    val timeoutMs = if (args.length > 1) args(1).toLong else 10000L
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val lines = spark.readStream.text(watchDir)
    val counts = graft.streaming.ProgressStream.counters(
      graft.streaming.ProgressStream.classify(lines))

    val q = counts.writeStream
      .format("console").outputMode(OutputMode.Complete())
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"))
      .start()
    q.awaitTermination(timeoutMs)
    q.stop()
    spark.stop()
  }
}
