package graft

/** Prints 5 runs of the host-steal canary (single-thread AND all-core
  * parallel) and their medians, for pasting into [[Bench.CanaryRef]] /
  * [[Bench.CanaryParRef]]. Run via tools/calibrate_canary.sh on a
  * verified-quiet machine (guest idle ~0.0 in /proc/stat deltas). The
  * parallel constant is best taken as the MIN across quiet-window runs —
  * any steal only ever inflates it. */
object CanaryCalibrate {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 5
    val cores = Runtime.getRuntime.availableProcessors()
    val times = (1 to n).map { i =>
      val t = Bench.canarySec()
      val p = Bench.canaryParSec(cores)
      val m = Bench.canaryMemGBs(cores)
      println(f"run $i: single $t%.3f s, par($cores) $p%.3f s, mem $m%.1f GB/s  (loadavg ${Bench.loadAvg()})")
      (t, p, m)
    }
    val s = times.map(_._1).sorted
    val p = times.map(_._2).sorted
    val m = times.map(_._3).sorted
    println(f"median single: ${s(s.length / 2)}%.3f s; min par: ${p.head}%.3f s; max mem: ${m.last}%.1f GB/s")
  }
}
