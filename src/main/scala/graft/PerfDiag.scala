package graft

/**
 * Per-query time-attribution probe (r13 optimization round, guide §1/§7):
 * runs each named query once (after an untimed sf0.001 warm-up) and
 * prints, per query, where the wall time went —
 *
 *   - wall: driver-observed seconds for the count() action(s)
 *   - task: Σ executorRunTime over all tasks (cluster-side work)
 *   - cpu:  Σ executorCpuTime (task minus blocked I/O/scheduling)
 *   - gc:   Σ jvmGCTime
 *   - sched: Σ (task launch overheads) approximated by task − cpu
 *   - jobs/stages/tasks: scheduling surface
 *   - shuffle read/write bytes + fetch-wait/write ms
 *
 * wall ≫ task/cores ⇒ driver-bound (planning, eager collects,
 * checkpoint round-trips); task-dominated ⇒ cluster work; high
 * fetch-wait ⇒ shuffle-bound. One JSON line per query on stdout.
 *
 * Usage: runMain graft.PerfDiag <sfDir> q1,q2,...
 */
object PerfDiag {
  import org.apache.spark.scheduler._
  import scala.collection.concurrent.TrieMap

  private final class Acc {
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var runMs = 0L
    @volatile var cpuNs = 0L
    @volatile var gcMs = 0L
    @volatile var shRead = 0L
    @volatile var shWrite = 0L
    @volatile var fetchWaitMs = 0L
    @volatile var writeMs = 0L
    @volatile var spillDisk = 0L
  }

  private final class L extends SparkListener {
    val byGroup = TrieMap.empty[String, Acc]
    private val stageGroup = TrieMap.empty[Int, String]
    private val stageMode = sys.env.get("SPARK_GRAFT_DIAG_STAGES").contains("1")
    override def onJobStart(js: SparkListenerJobStart): Unit =
      Option(js.properties).flatMap(p => Option(p.getProperty("spark.jobGroup.id"))).foreach { g =>
        byGroup.getOrElseUpdate(g, new Acc).jobs += 1
        js.stageIds.foreach(id => stageGroup.putIfAbsent(id, g))
      }
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
      stageGroup.get(sc.stageInfo.stageId).flatMap(byGroup.get).foreach { a =>
        val m = sc.stageInfo.taskMetrics
        if (stageMode) {
          val si = sc.stageInfo
          System.err.println(f"[stage] ${si.stageId}%4d tasks=${si.numTasks}%4d " +
            f"run=${m.executorRunTime / 1e3}%8.1fs cpu=${m.executorCpuTime / 1e9}%8.1fs " +
            f"shR=${(m.shuffleReadMetrics.localBytesRead + m.shuffleReadMetrics.remoteBytesRead) / 1e6}%8.1fMB " +
            f"shW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB  ${si.name.take(110)}")
        }
        a.synchronized {
          a.stages += 1
          a.tasks += sc.stageInfo.numTasks
          a.runMs += m.executorRunTime
          a.cpuNs += m.executorCpuTime
          a.gcMs += m.jvmGCTime
          a.shRead += m.shuffleReadMetrics.localBytesRead + m.shuffleReadMetrics.remoteBytesRead
          a.shWrite += m.shuffleWriteMetrics.bytesWritten
          a.fetchWaitMs += m.shuffleReadMetrics.fetchWaitTime
          a.writeMs += m.shuffleWriteMetrics.writeTime / 1000000L
          a.spillDisk += m.diskBytesSpilled
        }
      }
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: runMain graft.PerfDiag <sfDir> q1,q2,...")
      sys.exit(2)
    }
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val spark = SparkSessions.local("graft-perfdiag",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val all = SparkEntry.queries
    val l = new L
    spark.sparkContext.addSparkListener(l)
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")
    if (new java.io.File(warmDir).isDirectory)
      names.foreach { n =>
        try all(n)(spark, warmDir).count() catch { case _: Throwable => () }
        spark.catalog.clearCache()
      }
    val reps = sys.env.getOrElse("SPARK_GRAFT_DIAG_REPS", "1").toInt
    for (rep <- 1 to reps; n <- names) {
      val group = s"$n#$rep"
      spark.sparkContext.setJobGroup(group, n, interruptOnCancel = true)
      val t0 = System.nanoTime()
      try {
        all(n)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        // drain the async listener bus deterministically (ADVICE r13:
        // a fixed sleep undercounts on stage-heavy or backed-up runs):
        // poll the group's stage/task counters until they stop moving
        // for 300 ms, capped at 5 s
        val a = l.byGroup.getOrElseUpdate(group, new Acc)
        val deadline = System.nanoTime() + 5000000000L
        var last = (-1, -1)
        var stableMs = 0
        while (stableMs < 300 && System.nanoTime() < deadline) {
          Thread.sleep(50)
          val cur = (a.stages, a.tasks)
          if (cur == last) stableMs += 50 else { stableMs = 0; last = cur }
        }
        println(f"""{"q":"$n","rep":$rep,"wall":$wall%.2f,"task_s":${a.runMs / 1e3}%.2f,"cpu_s":${a.cpuNs / 1e9}%.2f,"gc_s":${a.gcMs / 1e3}%.2f,"jobs":${a.jobs},"stages":${a.stages},"tasks":${a.tasks},"sh_read_mb":${a.shRead / 1e6}%.1f,"sh_write_mb":${a.shWrite / 1e6}%.1f,"fetch_wait_s":${a.fetchWaitMs / 1e3}%.2f,"write_s":${a.writeMs / 1e3}%.2f,"spill_disk_mb":${a.spillDisk / 1e6}%.1f}""")
      } catch {
        case e: Throwable => println(s"""{"q":"$n","rep":$rep,"error":"${e.getClass.getSimpleName}"}""")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
