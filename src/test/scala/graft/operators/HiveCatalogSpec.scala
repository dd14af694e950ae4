package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** S7 completion (VERDICT r4 #6): tables written through a PERSISTENT
  * metastore survive a full session/JVM restart. Each phase runs in its own
  * child JVM (embedded derby admits one JVM at a time, and a genuine
  * restart is the point): phase "create" saves a managed table via
  * `enableHiveSupport()`, phase "read" — a brand-new JVM — resolves it by
  * name through the same metastore and aggregates it.
  */
class HiveCatalogSpec extends AnyFunSuite {

  private def runPhase(phase: String, dir: String): (Int, String) = {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke", "java.base/java.lang.reflect",
      "java.base/java.io", "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic", "java.base/sun.nio.ch",
      "java.base/sun.nio.cs", "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ addOpens ++ Seq(
      "-Xmx2g",
      s"-Dderby.stream.error.file=$dir/derby.log",
      "-Dspark.ui.enabled=false",
      "-cp",
      System.getProperty("java.class.path"),
      "graft.operators.HiveMetastorePhases",
      phase,
      dir
    )
    val out = new StringBuilder
    val exit = scala.sys.process.Process(cmd, new java.io.File(dir)).!(
      scala.sys.process.ProcessLogger(l => out.append(l).append('\n'), _ => ())
    )
    (exit, out.toString)
  }

  test("S7: managed table written via hive metastore survives a JVM restart") {
    val dir = TestSpark.tempDir()
    val (e1, o1) = runPhase("create", dir)
    assert(e1 === 0, s"create phase failed:\n$o1")
    assert(o1.contains("GRAFT_PHASE_CREATE_OK"))
    // the catalog state is ON DISK between the two JVMs
    assert(new java.io.File(s"$dir/metastore_db").isDirectory, "derby metastore not materialized")
    assert(new java.io.File(s"$dir/warehouse/graft_persisted_dim").isDirectory, "managed table dir missing")

    val (e2, o2) = runPhase("read", dir)
    assert(e2 === 0, s"read phase failed:\n$o2")
    // sum(1..100) proves values, TABLES>=1 proves name resolution via catalog
    assert(o2.contains("GRAFT_PHASE_READ_SUM=5050"), s"unexpected read output:\n$o2")
  }
}
