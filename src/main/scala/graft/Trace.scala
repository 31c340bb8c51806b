package graft

/** Env-gated phase tracer (`SPARK_GRAFT_TRACE=1`): stderr lines with
  * per-phase seconds, for attributing a query's wall time to its
  * sequential driver actions without an event-log round-trip. Zero cost
  * when the env var is absent (the label thunk is not forced).
  */
object Trace {
  val on: Boolean = sys.env.contains("SPARK_GRAFT_TRACE")

  def apply[T](label: => String)(body: => T): T =
    if (!on) body
    else {
      val t0 = System.nanoTime()
      val r = body
      System.err.println(
        f"[trace] ${label}%-34s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }
}
