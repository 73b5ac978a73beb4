package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional comma-separated name filter for fast single-query iteration
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // micros (not INT96) so DuckDB/pyarrow read identical timestamp values
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // the library's intended session shape: metadata-served aggregates +
      // SQL-registered kernel functions
      .config("spark.sql.extensions", "graft.catalog.spark.GraftSparkExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // session settings + cached fixtures the queries rely on (the per-query
    // conf guards were removed — prepare() is the one place session state
    // is established)
    SparkEntry.prepare(spark, sfDir)
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // control chars in builder-authored SQL must be escaped or the
    // driver's json.load fails and silently zeroes the round's correctness;
    // graft.catalog.Json.write handles quote/backslash/all <0x20 chars.
    val json = graft.catalog.Json.write(graft.catalog.JObj(
      SparkEntry.oracleSql.toVector.map { case (k, v) =>
        k -> (graft.catalog.JStr(v): graft.catalog.JValue) }))
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
