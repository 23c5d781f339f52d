package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage truncation with a cluster-safe escape hatch.
  *
  * `localCheckpoint` stores blocks on executors — fast, zero config, fine on
  * local[32] and for tests, but an executor loss mid-job discards the only
  * copy and kills iterative jobs (connected components) that can no longer
  * recompute from lineage. On a real cluster the job should set
  * `sc.setCheckpointDir(...)` (HDFS/S3); every operator that cuts lineage
  * routes through here, so configuring the dir flips the whole library to
  * reliable checkpoints with no code change.
  *
  * Cleanup: reliable checkpoint files are reclaimed by the ContextCleaner
  * only when `spark.cleaner.referenceTracking.cleanCheckpoints=true`
  * (GraftSession sets it; deployments building their own session must too),
  * otherwise every cut leaks a checkpoint dir for the life of the app.
  */
object Checkpointing {

  /** Eagerly materialize `df` and truncate its lineage: reliable
    * `checkpoint` when the session has a checkpoint dir, `localCheckpoint`
    * otherwise. */
  def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(true)

  /** Recursive delete of a scratch tree (checkpoint/state-store dirs the
    * streaming gates create per run) — ONE definition, because filesystem
    * mutation logic must not drift across call-site clones. Quiet on a
    * missing path; never follows symlinks (Files.walk does not by
    * default). */
  def deleteRecursively(path: String): Unit = {
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(p)) {
      // materialize the listing, then close the walk stream BEFORE deleting:
      // Files.walk holds a directory fd until closed, and deleting out from
      // under a live walk is unspecified
      val walk = java.nio.file.Files.walk(p)
      val paths = try walk.iterator().asScala.toSeq.reverse finally walk.close()
      paths.foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }
}
