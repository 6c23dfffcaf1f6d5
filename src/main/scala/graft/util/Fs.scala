package graft.util

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Temp-file + atomic-rename table rewrites (the reference's atomic
  * write discipline, utils.rs:16-60, applied to parquet dirs). */
object Fs {

  def deleteRecursively(path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach(f => java.nio.file.Files.delete(f))
    }
  }

  def exists(path: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(path))

  /** Materialize `df` to `<dir>_tmp` (forcing the read of the current
    * version first), then swap it in. */
  def rewrite(df: DataFrame, dir: String): Unit = {
    val tmp = dir + "_tmp"
    df.write.mode(SaveMode.Overwrite).parquet(tmp)
    deleteRecursively(dir)
    java.nio.file.Files.move(java.nio.file.Paths.get(tmp), java.nio.file.Paths.get(dir))
  }
}
