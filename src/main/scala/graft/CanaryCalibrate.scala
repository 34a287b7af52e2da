package graft

/** Prints 5 runs of the host-steal canary and their median, for pasting
  * into [[Bench.CanaryRef]]. Run via tools/calibrate_canary.sh on a
  * verified-quiet machine (guest idle ~0.0 in /proc/stat deltas). */
object CanaryCalibrate {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 5
    val times = (1 to n).map { i =>
      val t = Bench.canarySec()
      println(f"run $i: $t%.3f s  (loadavg ${Bench.loadAvg()})")
      t
    }.sorted
    println(f"median: ${times(times.length / 2)}%.3f s")
  }
}
