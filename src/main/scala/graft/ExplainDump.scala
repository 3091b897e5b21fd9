package graft

/**
 * Plan-artifact dumper (r13 optimization round): writes
 * `.explain("formatted")` for the named contract queries to files, so
 * before/after physical plans can be committed under `plans/r13/` and
 * checked against the code without a live Spark session.
 *
 * Usage: runMain graft.ExplainDump <sfDir> <outDir> [q1,q2,...]
 * (no query list = every SparkEntry query). Plans only — nothing is
 * executed beyond what DataFrame construction itself runs (some fits
 * are eager by documented contract).
 */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: runMain graft.ExplainDump <sfDir> <outDir> [q1,q2,...]")
      sys.exit(2)
    }
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    java.nio.file.Files.createDirectories(outDir)
    val names: Seq[String] =
      if (args.length > 2) args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSessions.local("graft-explain",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val all = SparkEntry.queries
    val suffix = sys.env.getOrElse("SPARK_GRAFT_EXPLAIN_SUFFIX", "")
    names.foreach { n =>
      all.get(n) match {
        case None => System.err.println(s"[explain] unknown query: $n")
        case Some(q) =>
          try {
            val df = q(spark, sfDir)
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode)
            java.nio.file.Files.writeString(outDir.resolve(s"$n$suffix.txt"), txt)
            System.err.println(s"[explain] wrote $n$suffix.txt")
          } catch {
            case e: Throwable =>
              System.err.println(s"[explain] $n FAILED: ${e.getClass.getName}: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }
}
