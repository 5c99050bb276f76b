package graft

import org.apache.spark.sql.SparkSession

/** Last-breath hygiene for the record-emitting mains (Bench,
  * BenchScale, Verify): the round driver parses the process's last
  * stdout line as the record, and Spark's StateStore maintenance
  * timer outlives `SparkSession.stop()` — on its next tick it logs a
  * `SparkEnv not active` WARN stack trace that lands BEHIND the
  * record and corrupts the capture (BENCH_r11.json `parsed: null`).
  * The on-disk artifact (BENCH_local.json / BENCH_scale.json /
  * the Verify dump) is always written FIRST and is the source of
  * truth; this helper then tears Spark down, kills the maintenance
  * timer, prints the record as the process's final output, and exits
  * the JVM before any other thread can speak — which also stops
  * lingering streaming threads from keeping the JVM alive after main
  * returns.
  */
object QuietExit {

  /** Stop the shared StateStore maintenance timer. `StateStore.stop()`
    * is `private[sql]` (public in bytecode), hence reflection; a miss
    * is harmless — the exit below wins the race anyway. */
  def stopStateStoreMaintenance(): Unit =
    try {
      val cls = Class.forName(
        "org.apache.spark.sql.execution.streaming.state.StateStore$")
      val module = cls.getField("MODULE$").get(null)
      cls.getMethod("stop").invoke(module)
    } catch { case _: Throwable => () }

  /** Tear down, emit `record` as the last stdout line, terminate. */
  def emitAndExit(spark: SparkSession, record: Option[String]): Nothing = {
    try spark.stop() catch { case _: Throwable => () }
    stopStateStoreMaintenance()
    record.foreach { r => System.out.println(r); System.out.flush() }
    sys.exit(0)
  }
}
