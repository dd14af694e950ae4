package graft
/** Solo-JVM timing probe (NOTES instrument, not a driver artifact): time a
  * few queries in a FRESH session/JVM to separate operator cost from
  * suite-JVM drag. Usage: runMain graft.SoloProbe <sfDir> <q1,q2,...> */
object SoloProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val spark = Graft.session("graft-solo")
    def run1(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach(run1) // warm: codegen + fixture ensure
    names.foreach { n =>
      val t = (1 to 3).map(_ => run1(n)).min
      println(f"[solo] $n min-of-3 $t%.2f s")
    }
    spark.stop()
  }
}
