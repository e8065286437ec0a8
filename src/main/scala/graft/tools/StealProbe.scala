package graft.tools

/** Dev: measure hypervisor CPU-steal UNDER LOAD (the only way it shows —
  * idle sampling structurally undersamples it; see Bench.stealProbePct)
  * without starting Spark. Prints one line per sample. Used to find a
  * quiet window before launching a canonical bench attempt.
  * Usage: runMain graft.tools.StealProbe [samples] [millisEach]
  */
object StealProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(3)
    val ms = args.lift(1).map(_.toLong).getOrElse(5000L)
    (1 to n).foreach { i =>
      val pct = graft.Bench.stealProbePct(millis = ms)
      println(f"STEAL $i: $pct%.2f%% of requestable capacity")
    }
  }
}
