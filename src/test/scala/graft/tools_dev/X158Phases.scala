package graft.tools_dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.TextDedup

/** Dev probe: per-phase wall time of the x158 stored-minhash lifecycle
  * (save → load → extend → remove → probe) — run on two checkouts to
  * localize a lifecycle-cost movement. Not part of the test suite. */
object X158Phases {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.queries.Q.tbl(spark, sfDir, "documents")
      .select(col("doc_id"), col("text"))
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          tasks.incrementAndGet(); ()
        }
      })
    def t[A](tag: String)(f: => A): A = {
      val j0 = jobs.get(); val k0 = tasks.get()
      val t0 = System.nanoTime(); val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(100) // let listener events drain
      println(f"PHASE $tag $dt%.2f s jobs=${jobs.get() - j0} tasks=${tasks.get() - k0}")
      r
    }
    (1 to 2).foreach { pass =>
      val root = s"/tmp/graft-x158phase-$pass-${System.getProperty("user.name")}"
      graft.storage.Hcfs.delete(spark, root)
      t(s"p$pass-save") {
        TextDedup.saveMinhashIndex(
          TextDedup.minhashIndex(
            docs.filter(col("doc_id") % 100 =!= 0), "doc_id", "text"),
          root, bandBuckets = 16, docBuckets = 16)
      }
      val loaded = t(s"p$pass-load") { TextDedup.loadMinhashIndex(spark, root) }
      val ext = t(s"p$pass-extend") {
        TextDedup.extendStoredMinhashIndex(loaded,
          docs.filter(col("doc_id") % 100 === 0), "doc_id", "text")
      }
      val pruned = t(s"p$pass-remove") {
        TextDedup.removeFromStoredMinhashIndex(ext,
          docs.filter(col("doc_id") % 100 === 50).select(col("doc_id").as("id")))
      }
      val batch = docs.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
      t(s"p$pass-probe") {
        TextDedup.nearDupAgainstStoredIndex(batch, "doc_id", "text", pruned)
          .orderBy(col("id"), col("dup_of")).count()
      }
    }
    spark.stop()
  }
}
