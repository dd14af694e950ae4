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
  * in the r4/r5 driver artifacts). So: one untimed warm sweep (codegen +
  * shuffle files), then up to TWO timed end-to-end suite passes,
  * publishing the per-query MINIMUM.
  *
  * Artifact availability (the r9 lesson): at 400+ queries the
  * warm+2-pass structure outgrew the driver's capture window (rc=124,
  * nothing parseable landed). Three defenses, in order of resort:
  *   1. The complete JSON line is printed AND file-flushed after the
  *      FIRST timed pass (`passes:1`), then overwritten after the second
  *      (`passes:2`) — any capture window that survives pass 1 holds a
  *      parseable artifact; a driver that takes the last stdout line gets
  *      the best one available.
  *   2. Pass 2 only runs if it fits the budget: skipped when elapsed so
  *      far + the measured pass-1 time would exceed
  *      SPARK_GRAFT_BENCH_BUDGET_SEC (default 1500 s).
  *   3. A JVM shutdown hook writes whatever per-query results exist to
  *      bench_last.json with `"partial":true` — so even a SIGTERM
  *      mid-pass leaves a lift-able per-query record on disk.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val budgetSec = sys.env.get("SPARK_GRAFT_BENCH_BUDGET_SEC").flatMap(s => scala.util.Try(s.toDouble).toOption).getOrElse(1500.0)
    val wallStart = System.nanoTime()
    def elapsedSec: Double = (System.nanoTime() - wallStart) / 1e9
    val spark = Graft.session("graft-bench")
    // A SIGTERM (driver timeout) stops the SparkContext via its own
    // shutdown hook while THIS main loop keeps running: every remaining
    // query then "fails" in ~0 s, and a min() against those fakes would
    // publish a complete-looking line with a fabricated fast tail
    // (observed r10: a killed pass 2 emitted passes:2/total 466 s).
    // Defense: a failed query yields NaN (never entered into the min),
    // and a stopped context aborts the sweep immediately.
    def stopped: Boolean = spark.sparkContext.isStopped
    def run1(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame, name: String): Boolean =
      try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
    def timed(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame, name: String): Double = {
      val t0 = System.nanoTime()
      val ok = run1(fn, name)
      if (!ok || stopped) Double.NaN else (System.nanoTime() - t0) / 1e9
    }
    def loadavg: Double = {
      val v = java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage
      math.round(v * 100) / 100.0
    }
    // best-known per-query seconds; the shutdown hook reads this, so it
    // must be consistent at every point (updated one entry at a time)
    val best = new java.util.concurrent.ConcurrentHashMap[String, Double]()
    def mkLine(passes: Int, loadStart: Double, waited: Int, partial: Boolean): String = {
      import scala.jdk.CollectionConverters._
      val entries = best.asScala.toSeq.sortBy(_._1)
      val qs = entries.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
      val total = entries.map(_._2).sum
      val partialField = if (partial) ""","partial":true""" else ""
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","passes":$passes,"loadavg_start":$loadStart,"loadavg_end":$loadavg,"waited_sec":$waited$partialField}"""
    }
    def writeFile(line: String): Unit =
      try { val w = new java.io.PrintWriter("bench_last.json"); w.println(line); w.close() }
      catch { case _: Throwable => () }

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
    @volatile var hookPasses = 0
    val hook = new Thread(() => writeFile(mkLine(hookPasses, loadStart, waited, partial = true)))
    Runtime.getRuntime.addShutdownHook(hook)
    // untimed warm sweep: one-time Janino codegen + plan-cache costs are
    // 0.9-6 s per query shape, independent of data size — noise at 100 TB,
    // dominant at sf0.1. Steady state is what the number should mean.
    names.iterator.takeWhile(_ => !stopped).foreach { case (name, fn) => run1(fn, name) }
    val pass1Start = elapsedSec
    names.iterator.takeWhile(_ => !stopped).foreach { case (name, fn) =>
      val t = timed(fn, name)
      if (!t.isNaN) best.put(name, t)
    }
    if (stopped) return // shutdown hook's partial line is the artifact
    val pass1Sec = elapsedSec - pass1Start
    hookPasses = 1
    val line1 = mkLine(1, loadStart, waited, partial = false)
    println(line1); Console.out.flush()
    writeFile(line1)
    // pass 2 publishes per-query min, but only if it fits the budget —
    // a lost artifact costs more than a slightly noisier one (r9: rc=124)
    val fits = elapsedSec + pass1Sec <= budgetSec
    if (fits) {
      names.iterator.takeWhile(_ => !stopped).foreach { case (name, fn) =>
        val t = timed(fn, name)
        if (!t.isNaN) {
          val prev = if (best.containsKey(name)) best.get(name) else Double.MaxValue
          best.put(name, math.min(prev, t))
        }
      }
      if (stopped) return // pass-1 line + the hook's partial both on disk
      hookPasses = 2
      val line2 = mkLine(2, loadStart, waited, partial = false)
      println(line2); Console.out.flush()
      writeFile(line2)
    } else {
      System.err.println(f"[bench] budget guard: elapsed ${elapsedSec}%.0f s + pass1 ${pass1Sec}%.0f s > budget ${budgetSec}%.0f s — skipping pass 2 (passes:1)")
    }
    Runtime.getRuntime.removeShutdownHook(hook)
    spark.stop()
  }
}
