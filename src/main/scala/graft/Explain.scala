package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Plan dumps for SparkEntry queries. Default: static `explain("formatted")`
  * at sf0.001. With `-final` as the first arg, EXECUTES each query first and
  * prints the AQE-final executed plan — the only view that shows runtime
  * exchange/stage reuse and AQE join downgrades, which the static explain
  * of an adaptive plan cannot.
  *
  * Static mode is NOT fully job-free: queries whose plan construction is
  * BUILD-TIME EAGER (the salted covers' census checkpoint, the LM nodes'
  * pinned count tables) run those jobs while BUILDING the plan — tolerable
  * at this sf0.001 scale, and showing anything else (e.g. forcing cap=0)
  * would print a plan production never runs. */
object Explain {
  def main(args: Array[String]): Unit = {
    val showFinal = args.headOption.contains("-final")
    val names: Seq[String] = if (showFinal) args.drop(1).toSeq else args.toSeq
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (n <- names) {
      println(s"########## $n")
      val df = SparkEntry.queries(n)(spark, dir)
      if (showFinal) {
        df.collect()
        df.queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => println(a.executedPlan.toString)
          case p => println(p.toString)
        }
      } else df.explain("formatted")
    }
    spark.stop()
  }
}
