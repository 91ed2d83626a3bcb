package graft.functions

/** Injectable virtual clock for deterministic tests — the reference's
  * env-gated `timefusion_set_clock`/`advance_clock`/`now_micros` trio
  * (`/root/reference/src/functions.rs:498-535`). Unfrozen, it reads wall
  * clock; frozen, time moves only via [[advance]]. */
object GraftClock {
  @volatile private var frozen: Option[Long] = None

  def set(micros: Long): Unit = frozen = Some(micros)
  def advance(micros: Long): Long = {
    val next = nowMicros + micros
    frozen = Some(next)
    next
  }
  def reset(): Unit = frozen = None
  def nowMicros: Long =
    frozen.getOrElse(System.currentTimeMillis() * 1000L)
}
