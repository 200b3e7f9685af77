package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Deterministic file staging for streaming drives: split a frame into
  * single-file parquets whose MTIME ORDER is the intended micro-batch
  * order — the one replay contract (`maxFilesPerTrigger=1` + mtime
  * spacing) that the st21/st22 gates, their specs, and the ScaleBench
  * streaming probes all share. One definition, because the contract IS
  * the semantics: the TTL oracle's watermark lattice and the restart
  * probe's file split both replay "batch b = id range b" only while
  * every staging site slices and stamps identically.
  */
object FileStaging {

  /** Stage `df` into `nFiles` single-file parquets `dir/in/f{i}.parquet`
    * split by contiguous `idCol` ranges, mtimes one minute apart in file
    * order. Returns the staging root (callers may move files out of
    * `in/` to control visibility, as the restart drives do).
    */
  def stageMtimeFiles(df: DataFrame, tag: String, nFiles: Int,
      idCol: String = "doc_id"): String = {
    require(nFiles >= 1, s"nFiles must be >= 1, got $nFiles")
    val maxId = df.agg(org.apache.spark.sql.functions.max(col(idCol)))
      .head.getLong(0)
    val bSize = maxId / nFiles + 1
    val dir = java.nio.file.Files.createTempDirectory(tag).toString
    (0L until nFiles.toLong).foreach { f =>
      df.filter(col(idCol) >= f * bSize && col(idCol) < (f + 1) * bSize)
        .coalesce(1).write.parquet(s"$dir/stage$f")
      val part = new java.io.File(s"$dir/stage$f").listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath
      val dst = java.nio.file.Paths.get(s"$dir/in/f$f.parquet")
      java.nio.file.Files.createDirectories(dst.getParent)
      java.nio.file.Files.move(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(
          1600000000000L + f * 60000L))
    }
    dir
  }
}
