package graft.etl

import org.apache.spark.sql.SparkSession

import scala.util.{Failure, Success, Try}

/** In-process job runner replacing the reference's entire control plane
  * (Airflow DAG + EMR + Livy, SURVEY.md §2.8 O1-O11). The only process
  * boundary that survives the rewrite is driver→executor; orchestration
  * collapses to an ordered `Seq[Job]` with retry, mirroring the DAG chain at
  * reference `dags/capstone_project.py:100` and its retry policy
  * (`default_args`, `dags/capstone_project.py:18-19`).
  */
object Pipeline {

  final case class Job(name: String, run: SparkSession => Unit, retries: Int = 1)

  final case class JobResult(name: String, attempts: Int, error: Option[Throwable]) {
    def ok: Boolean = error.isEmpty
  }

  /** Run jobs in order; a job failing all its retries stops the pipeline
    * (downstream jobs are skipped, like a failed Airflow chain). */
  def run(spark: SparkSession, jobs: Seq[Job]): Seq[JobResult] = {
    val results = Vector.newBuilder[JobResult]
    var halted = false
    jobs.foreach { job =>
      if (!halted) {
        var attempt = 0
        var outcome: Try[Unit] = Failure(new IllegalStateException("not run"))
        while (attempt <= job.retries && outcome.isFailure) {
          attempt += 1
          outcome = Try(job.run(spark))
        }
        outcome match {
          case Success(_) => results += JobResult(job.name, attempt, None)
          case Failure(e) => results += JobResult(job.name, attempt, Some(e)); halted = true
        }
      }
    }
    results.result()
  }
}
