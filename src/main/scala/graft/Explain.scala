package graft

/** Plan auditor: prints the formatted physical plan of selected queries (or
  * all) so scan pruning (ReadSchema), filter pushdown (PushedFilters), join
  * strategies, and WholeStageCodegen spans can be reviewed. Usage:
  *   runMain graft.Explain [sfDir] [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Graft.session("graft-explain")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
