package graft.examples

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Shared shuffle-byte metering for the evidence demos (the block was
  * copy-pasted across four *ScaleDemo mains; one fix — e.g. to the
  * listener-bus race below — now lands everywhere at once).
  *
  * Known weakness, shared by every user: stage-completion events are
  * delivered on the async listener bus, so [[step]] sleeps 300 ms after
  * the action before reading the adders — a heavily loaded bus can
  * still under-report a step's bytes (they then show up in the NEXT
  * step or the total). The committed PLANS.md numbers treat per-step
  * splits as indicative and the [[total]] line (read after all steps,
  * same grace) as the claim.
  */
final class ShuffleMeter(spark: SparkSession) {

  private val readBytes = new LongAdder
  private val writeBytes = new LongAdder

  spark.sparkContext.addSparkListener(new SparkListener {
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      readBytes.add(m.shuffleReadMetrics.totalBytesRead)
      writeBytes.add(m.shuffleWriteMetrics.bytesWritten)
    }
  })

  def readMB: Double = readBytes.sum() / 1e6
  def writeMB: Double = writeBytes.sum() / 1e6

  /** Run `f`, print `[step] name wall shuffle r/w` with the step's
    * shuffle-byte delta, return the result.
    */
  def step[A](name: String)(f: => A): A = {
    val r0 = readBytes.sum(); val w0 = writeBytes.sum()
    val t0 = System.nanoTime()
    val r = f
    val secs = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300) // listener-bus grace; see class doc
    val dr = (readBytes.sum() - r0) / 1e6
    val dw = (writeBytes.sum() - w0) / 1e6
    println(f"[step] $name%-28s ${secs}%8.1fs  shuffle r=${dr}%9.1fMB w=${dw}%9.1fMB")
    r
  }

  /** Print the run-total line with a claim suffix. */
  def total(note: String): Unit =
    println(f"[total-shuffle] read=${readMB}%.1fMB write=${writeMB}%.1fMB ($note)")
}
