package graft.serve

import java.util.concurrent.atomic.AtomicLong

/** Rolling serving-stats counters + a 10 s cadence logger — the
  * reference backend's periodic engine stats line
  * (`backend/lib/engine.c:480-514`: queries/inputs/errors/bytes/
  * connections deltas every 10 s on the serving path). Counters are
  * cumulative; the logger emits per-interval DELTAS, so an operator
  * tailing the log sees rates, not lifetime totals.
  *
  * `sink` + `intervalMillis` are injectable for tests; production
  * callers take the defaults (stderr, 10 s). */
final class ServeStats(name: String, intervalMillis: Long = 10000L,
    sink: String => Unit = s => System.err.println(s)) {

  val queries = new AtomicLong(0)
  val inputs = new AtomicLong(0)
  val errors = new AtomicLong(0)
  val bytesOut = new AtomicLong(0)
  /** Live connections (gauge, not a counter). */
  val connections = new AtomicLong(0)

  private var lastQ, lastI, lastE, lastB = 0L
  @volatile private var running = false
  private var thread: Thread = null

  /** One formatted delta line (also the logger's body — public so tests
    * and ad-hoc dumps share the exact format). */
  def deltaLine(): String = synchronized {
    val (q, i, e, b) =
      (queries.get(), inputs.get(), errors.get(), bytesOut.get())
    val line = s"[$name] queries=${q - lastQ} inputs=${i - lastI} " +
      s"errors=${e - lastE} bytes_out=${b - lastB} " +
      s"connections=${connections.get()}"
    lastQ = q; lastI = i; lastE = e; lastB = b
    line
  }

  def totals: Map[String, Long] = Map(
    "queries" -> queries.get(), "inputs" -> inputs.get(),
    "errors" -> errors.get(), "bytes_out" -> bytesOut.get(),
    "connections" -> connections.get())

  def start(): this.type = {
    if (thread == null) {
      running = true
      thread = new Thread(() => {
        while (running) {
          try Thread.sleep(intervalMillis)
          catch { case _: InterruptedException => }
          if (running) sink(deltaLine())
        }
      }, s"serve-stats-$name")
      thread.setDaemon(true)
      thread.start()
    }
    this
  }

  def stop(): Unit = {
    running = false
    if (thread != null) { thread.interrupt(); thread = null }
  }
}
