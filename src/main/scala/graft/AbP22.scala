package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.GraftInternals

/** Focused A/B runner for the p22 bench leg (build the release-store
  * template once untimed, then N timed copy+increment reps) — exists so
  * a flagged p22 floor move can be bisected tree-vs-tree on a fresh JVM
  * without paying the full 129-leg bench per sample, exactly like
  * [[QBench]] does for SparkEntry queries (p22 is not a SparkEntry
  * entry, so QBench can't reach it).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.AbP22"
  */
object AbP22 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("AB_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "65536")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def sweep(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    def rmTree(p: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
    }
    def copyTree(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(src).iterator().asScala.foreach { p =>
        val t = dst.resolve(src.relativize(p))
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.createDirectories(t)
        else { java.nio.file.Files.copy(p, t); () }
      }
    }
    val params = graft.release.ReleaseParams()
    val tmpl = java.nio.file.Files.createTempDirectory("graft_abp22")
    val stored = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .filter(col("doc_id") < 400)
    GraftInternals.freeLocalCheckpoint(graft.release.ReleaseStore.init(
      spark, stored, "doc_id", "text", params, tmpl.resolve("st").toString))
    sweep()
    (1 to reps).foreach { i =>
      val dir = java.nio.file.Files.createTempDirectory("graft_abp22_rep")
      try {
        val t0 = System.nanoTime()
        copyTree(tmpl.resolve("st"), dir.resolve("st"))
        val batch = Tables.documents(spark, sfDir)
          .select(col("doc_id"), col("text"))
          .filter(col("doc_id") >= 400)
        val rel = graft.release.ReleaseStore.increment(
          spark, batch, "doc_id", "text", params, dir.resolve("st").toString)
        require(rel.count() > 0L)
        GraftInternals.freeLocalCheckpoint(rel)
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"ABP22 rep=$i wall=$wall%.2f")
      } finally { sweep(); rmTree(dir) }
    }
    rmTree(tmpl)
    spark.stop()
  }
}
