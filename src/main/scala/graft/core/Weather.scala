package graft.core

/** The ONE definition of the hypervisor-steal instrument (ADVICE r15:
  * the tick parsing + USER_HZ assumption were copy-pasted across
  * Bench, ScalingCurveSpec and D13FourthDecadeProbe — triplication
  * invites drift if either ever changes).
  *
  * Steal ticks (field 9 of /proc/stat's aggregate `cpu` line) count
  * time the hypervisor ran a CO-TENANT while this guest wanted CPU —
  * they only accrue under load, so an idle-time probe can never
  * reconstruct a run's weather; the delta must bracket the measured
  * window itself. Rounds 12–15 established that sub-1 % steal already
  * moves the 175-key bench total several percent diffusely, and that
  * steal inflates CORE-seconds too, not just walls (round 15: the same
  * 54 GB join stage read 10,586 core-s at 7 % steal vs 3,775 quiet).
  *
  * Ticks are USER_HZ units; [[stealPct]] assumes the near-universal
  * USER_HZ=100 ([[stealTickHz]] — emitted alongside every percentage
  * so an archive self-describes the assumption): on a kernel with a
  * different CLK_TCK the percentage is off by that ratio while the
  * raw tick delta stays exact. */
object Weather {

  /** The USER_HZ value [[stealPct]] assumes. Emit this next to any
    * persisted percentage (Bench's `steal_tick_hz` JSON field is the
    * schema record). */
  val stealTickHz = 100

  /** Cumulative steal ticks, or -1 where /proc/stat is unreadable or
    * malformed (non-Linux, locked-down container) — callers treat -1
    * as "no weather evidence either way". */
  def stealTicks(): Long =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try src.getLines().find(_.startsWith("cpu "))
        .map(_.trim.split("\\s+")(8).toLong).getOrElse(-1L)
      finally src.close()
    } catch { case scala.util.control.NonFatal(_) => -1L }

  /** Steal share of a window's total tick capacity, in percent:
    * `deltaTicks` over (wall seconds × nCpu × USER_HZ). -1.0 when
    * either endpoint was unreadable (negative delta input) OR the
    * window is degenerate (`wallSec <= 0` would divide to
    * Infinity/NaN, which Bench would serialize into the metric line
    * as a bare unparseable token — ADVICE r16). */
  def stealPct(deltaTicks: Long, wallSec: Double, nCpu: Int): Double =
    if (deltaTicks < 0 || wallSec <= 0) -1.0
    else 100.0 * deltaTicks / (wallSec * nCpu * stealTickHz.toDouble)
}
