package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // 71 queries x several codegen stages each blows far past the default
      // 100-entry generated-code cache; evictions make LATER queries
      // re-compile (and re-JIT) code they already ran, so measured time
      // depends on session position (q22: 0.49s alone vs 1.1-1.3s after 20
      // neighbors — same commit, same plan). Size the cache for the suite.
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      // the library's intended session shape: metadata-served aggregates +
      // SQL-registered kernel functions
      .config("spark.sql.extensions", "graft.catalog.spark.GraftSparkExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // fixture warehouses are built outside the timed region
    SparkEntry.prepare(spark, sfDir)
    // a failed query reports as -1 (never as a fast success) and is listed
    // in "failed" — a regression that breaks a query must not read as a speedup
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Either[String, Double] = {
      val t0 = System.nanoTime()
      try {
        // noop sink executes the full plan (count() would let Catalyst
        // prune projections and skip the real work for row-level queries)
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        Right((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    // two timed runs, report the min: the first run of the session absorbs
    // one-off JIT/codegen/cleaner costs that would land on an arbitrary query
    val only = sys.env.get("SPARK_GRAFT_ONLY")
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(n.matches) }
      .map { case (name, fn) =>
        val t = (once(fn), once(fn)) match {
          case (Right(a), Right(b)) => Right(math.min(a, b))
          case (Left(err), _) => Left(err)
          case (_, Left(err)) => Left(err)
        }
        t match {
          case Right(v) => System.err.println(f"[bench] $name $v%.2fs")
          case Left(err) => System.err.println(s"[bench] $name FAILED: $err")
        }
        name -> t
      }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v.getOrElse(-1.0) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, Left(_)) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, Right(v)) => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
