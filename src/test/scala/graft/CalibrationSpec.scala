package graft

import org.scalatest.funsuite.AnyFunSuite

/** Synthetic-load A/B for the bench contention sentinel: the fixed
  * calibration loop must visibly inflate when the box is oversubscribed,
  * otherwise it cannot flag a polluted bench pass. Round-5 motivation: the
  * driver's official bench record (154.3 s, q52 at 20.8 s) was produced
  * under contention and read as a regression until a manual idle-box re-run
  * (108.6 s, q52 at 1.78 s) disproved it; with per-pass calibration_ms in
  * bench_out.json the polluted pass is self-identifying. */
class CalibrationSpec extends AnyFunSuite {

  test("calibration loop inflates under synthetic CPU oversubscription") {
    // warm the JIT so the idle measurement is steady-state
    Bench.calibrate()
    val idle = math.min(Bench.calibrate(), Bench.calibrate())

    // oversubscribe: 2x as many spin threads as cores, so the calibration
    // thread gets at most ~half a core on a fair scheduler
    val cores = Runtime.getRuntime.availableProcessors()
    @volatile var stop = false
    val spinners = (0 until cores * 2).map { _ =>
      val t = new Thread(() => {
        var x = 1L
        while (!stop) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17 }
        if (x == 0) println("")
      })
      t.setDaemon(true)
      t.start()
      t
    }
    val loaded =
      try math.min(Bench.calibrate(), Bench.calibrate())
      finally { stop = true; spinners.foreach(_.join(1000)) }

    info(s"calibration idle=${idle}ms loaded=${loaded}ms (${cores} cores, ${cores * 2} spinners)")
    assert(idle > 0)
    // conservative bar: full fair-share would be ~2x; require 1.25x so a
    // scheduler that favors the foreground thread still passes
    assert(loaded > idle * 1.25,
      s"sentinel failed to flag contention: idle=${idle}ms loaded=${loaded}ms")
  }
}
