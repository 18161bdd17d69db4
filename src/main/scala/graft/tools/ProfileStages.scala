package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev-only per-stage profiler: runs the `SPARK_GRAFT_ONLY` queries
  * (default: the bench's historical heavy set) with a stage listener and
  * flags UNDERPARALLELIZED HOT stages — long wall-clock on ≤4 tasks at
  * local[32]. That shape is almost always AQE coalescing a small-bytes
  * shuffle that feeds a row-explosion (self-join, posting-list join,
  * fan-out scoring): AQE sizes post-shuffle partitions by input bytes
  * and cannot see output fan-out, so the query's heaviest work
  * serializes onto 1-2 tasks (the copurchase_recall_at_k r8 finding —
  * 15.3 → 7.3 s from pinning explicit fan-out parallelism). Fix
  * pattern: explicit numbered `repartition(n, key)` feeding the
  * explosion stage.
  */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq("containment_pairs", "label_propagation",
        "link_predict_users", "knn_graph_grams", "dedup_incremental",
        "triangle_count", "source_overlap_matrix", "neighbor_degree_function"))
    val spark = SparkSession.builder()
      .appName("profile-stages").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class St(id: Int, ms: Long, tasks: Int, outRows: Long, shufWMb: Long)
    val stages = mutable.ArrayBuffer.empty[St]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for {s <- si.submissionTime; c <- si.completionTime}
          yield c - s).getOrElse(-1L)
        stages.synchronized {
          stages += St(si.stageId, ms, si.numTasks,
            si.taskMetrics.outputMetrics.recordsWritten,
            si.taskMetrics.shuffleWriteMetrics.bytesWritten / 1048576)
        }
      }
    })

    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"!! unknown query: $name")
        case Some(fn) =>
          stages.synchronized(stages.clear())
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).count()
            val total = (System.nanoTime() - t0) / 1e9
            Thread.sleep(300)
            val snap = stages.synchronized(stages.sortBy(-_.ms).toList)
            val hot = snap.filter(s => s.ms > 800 && s.tasks <= 4)
            val flag = if (hot.nonEmpty) "  <-- UNDERPARALLELIZED" else ""
            println(f"QUERY $name%-28s ${total}%6.2f s$flag")
            hot.foreach(s => println(
              f"    stage ${s.id}%4d ${s.ms}%6d ms on ${s.tasks}%2d tasks, " +
                f"shufW=${s.shufWMb}%4d MB"))
            // top stages by wall-clock regardless of task count, for
            // finding where an already-parallel query spends its time
            if (sys.env.contains("SPARK_GRAFT_PROFILE_TOP"))
              snap.takeWhile(_.ms > 200).take(8).foreach(s => println(
                f"    top stage ${s.id}%4d ${s.ms}%6d ms on ${s.tasks}%3d " +
                  f"tasks, shufW=${s.shufWMb}%4d MB"))
          } catch { case e: Throwable =>
            println(s"QUERY $name FAILED: ${e.getMessage}")
          }
          spark.sparkContext.getPersistentRDDs.values
            .foreach(_.unpersist(blocking = false))
      }
    }
    spark.stop()
  }
}
