package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Task-metric accumulation for Bench: shuffle bytes written and spill
  * across all tasks since the last [[reset]]. Listener events are
  * asynchronous; [[settle]] polls until the counters stop moving, which
  * is accurate enough for per-query attribution in a single-JVM bench
  * (queries run strictly sequentially). */
class BenchMetrics extends SparkListener {
  private val shuffleWrite = new LongAdder
  private val spill = new LongAdder

  override def onTaskEnd(taskEnd: SparkListenerTaskEnd): Unit = {
    val m = taskEnd.taskMetrics
    if (m != null) {
      shuffleWrite.add(m.shuffleWriteMetrics.bytesWritten)
      spill.add(m.diskBytesSpilled + m.memoryBytesSpilled)
    }
  }

  def reset(): Unit = { shuffleWrite.reset(); spill.reset() }

  /** Wait for the async listener bus to quiesce (counters unchanged for
    * two consecutive polls), then return (shuffleBytes, spillBytes). */
  def settle(): (Long, Long) = {
    var prev = (-1L, -1L)
    var cur = (shuffleWrite.sum(), spill.sum())
    var i = 0
    while (cur != prev && i < 50) {
      prev = cur
      Thread.sleep(50)
      cur = (shuffleWrite.sum(), spill.sum())
      i += 1
    }
    cur
  }
}
