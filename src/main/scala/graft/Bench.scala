package graft

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. Results are forced through
  * the `noop` sink so the full plan executes (a bare `.count()` would let
  * Catalyst prune the projected columns away and under-measure scans).
  *
  * Artifact integrity: a single timed run is never trustworthy — even on
  * an idle machine, individual queries show 10-25x one-off JIT/GC spikes
  * between back-to-back clean passes, and co-tenant JVMs inflate whole
  * stretches of a pass (both classes documented in NOTES.md and observed
  * in the r4/r5 driver artifacts). A per-query retry can't catch
  * contention that hits the warm and measured run alike. So: one untimed
  * warm sweep (codegen + shuffle files), then TWO timed end-to-end suite
  * passes, publishing the per-query MINIMUM — contention is bursty, and
  * two full passes rarely collide on the same query. The JSON also carries
  * the 1-minute system load average sampled at start and end, so the
  * driver can flag a dirty run instead of publishing it.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.session("graft-bench")
    def run1(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame, name: String): Unit =
      try fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
    def timed(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame, name: String): Double = {
      val t0 = System.nanoTime()
      run1(fn, name)
      (System.nanoTime() - t0) / 1e9
    }
    def loadavg: Double = {
      val v = java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
      math.round(v * 100) / 100.0
    }
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    // act on the contention signal instead of just reporting it (the r7
    // driver artifact published 2-4x-inflated queries at loadavg 7.92):
    // wait out co-tenant load in bounded 15 s steps — up to 10 min, then
    // run anyway (the waited_sec field + loadavg_start still tell the
    // reader exactly what happened)
    val settleLimitSec = 600
    var waited = 0
    while (loadavg > 2.0 && waited < settleLimitSec) {
      System.err.println(s"[bench] loadavg ${loadavg} > 2.0 — waiting (${waited}s/${settleLimitSec}s)")
      Thread.sleep(15000)
      waited += 15
    }
    val loadStart = loadavg
    // untimed warm sweep: one-time Janino codegen + plan-cache costs are
    // 0.9-6 s per query shape, independent of data size — noise at 100 TB,
    // dominant at sf0.1. Steady state is what the number should mean.
    names.foreach { case (name, fn) => run1(fn, name) }
    val pass1 = names.map { case (name, fn) => name -> timed(fn, name) }
    val pass2 = names.map { case (name, fn) => name -> timed(fn, name) }
    val results = pass1.zip(pass2).map { case ((name, a), (_, b)) => name -> math.min(a, b) }
    val loadEnd = loadavg
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","passes":2,"loadavg_start":$loadStart,"loadavg_end":$loadEnd,"waited_sec":$waited}"""
    println(line)
    // The stdout line is the contract, but a capture window that truncates
    // it loses the per-query record (observed in the r6 driver artifact) —
    // so the identical line is also written whole to a file the driver (or
    // a human) can lift after the fact.
    try {
      val w = new java.io.PrintWriter("bench_last.json"); w.println(line); w.close()
    } catch { case _: Throwable => () }
    spark.stop()
  }
}
