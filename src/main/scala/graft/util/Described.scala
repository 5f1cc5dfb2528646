package graft.util

import org.apache.spark.sql.SparkSession

/** Set a Spark job description around an action so profilers (the
  * JobProfile tool, the UI) can attribute each job of a multi-action
  * protocol to its phase. Restores the previous description — Bench's
  * setJobGroup description and any outer Described scope survive.
  */
object Described {
  def apply[T](s: SparkSession, label: String)(body: => T): T = {
    val sc = s.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(label)
    try body
    finally sc.setJobDescription(prev)
  }
}
