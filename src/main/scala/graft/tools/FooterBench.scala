package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement scaffolding for the commit-time parquet-footer harvest
  * (VERDICT r14 item 2): append a commit of N files to a scratch table
  * and report the footer-harvest phase wall-clock. Run with
  * `-Dgraft.debug.timing=true` and compare `-Dgraft.footer.ioThreads=1`
  * (the pre-r14 serial walk) against the default bounded pool.
  *
  *   sbt "runMain graft.tools.FooterBench 400"
  *
  * Not part of the library surface; prints the same `[timing]
  * commit.footers ... n=<N>` lines the production commit path emits.
  */
object FooterBench {
  def main(args: Array[String]): Unit = {
    val nFiles = args.headOption.map(_.toInt).getOrElse(400)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wh = java.nio.file.Files.createTempDirectory("graft_footerbench_").toString
    val cat = new graft.catalog.SnapshotCatalog(spark, wh)
    val df = spark.range(nFiles.toLong * 1000)
      .select(col("id"), (col("id") % 97).as("k"), (col("id") * 31 % 1009).as("v"))
      .repartition(nFiles)
    cat.createTable("bench", "t", df.schema)
    // three appends of nFiles each: the first absorbs JIT, compare the rest
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val snap = cat.append("bench", "t", df)
      println(f"[footerbench] append#$i files=${snap.summary("added_files")} " +
        f"total=${(System.nanoTime() - t0) / 1e6}%.1fms " +
        s"ioThreads=${sys.props.getOrElse("graft.footer.ioThreads", "default")}")
    }
    spark.stop()
  }
}
