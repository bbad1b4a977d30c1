package graft.operators

import org.apache.spark.sql.SparkSession

/** The ONE implementation of the registry bootstrap policy (ADVICE
  * r4, refined by review): a state/registry path maps to "empty"
  * only when it has never been COMMITTED to — path absent, or
  * present without any committed data file (the crash-during-first-
  * append window leaves a dir holding only `_temporary`/markers; the
  * true registry state is still empty, and treating it as corruption
  * would brick ingestion where the documented contract is replay).
  * Anything else — the path exists with data files — must be read,
  * and schema problems then PROPAGATE: silently forgetting
  * dedup/state history re-admits every duplicate. */
object RegistryIO {

  /** True iff `path` holds at least one committed data file. ANY
    * non-marker file counts (ADVICE r5) — not just Spark's own
    * part-* naming: a registry whose data files were written or
    * compacted by another tool must be READ (and then judged by the
    * schema check), not silently treated as never-committed — that
    * is exactly the forget-history failure this policy exists to
    * prevent. Markers are `_`/`.`-prefixed (SUCCESS files, CRC
    * sidecars, in-flight tmp) — the same classes Spark's own reader
    * skips. */
  def committedDataExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && {
      def scan(dir: org.apache.hadoop.fs.Path): Boolean =
        fs.listStatus(dir).exists { s =>
          val n = s.getPath.getName
          if (s.isDirectory)
            // partition dirs (cell=...) hold the files; _temporary
            // and other _-prefixed dirs are uncommitted scaffolding
            !n.startsWith("_") && !n.startsWith(".") && scan(s.getPath)
          else !n.startsWith("_") && !n.startsWith(".")
        }
      scan(p)
    }
  }
}
