package graft.sources

import java.util.Properties

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.SurrogateKeys

/** S3/S4/S6 verification against a real JDBC database: embedded Derby
  * (the driver ships in Spark's jar directory), so the round-trip runs
  * with zero network. Covers the reference's PostgreSQL load shape
  * (etl_ui.py:63-67,394-664): batched fact writes, dimension state
  * scans, get-or-create continuation against DB state, and
  * filter pushdown + partitioned scans on the read path.
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private lazy val url: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-derby")
    System.setProperty("derby.system.home", dir.toString)
    s"jdbc:derby:${dir.resolve("db")};create=true"
  }
  private def props: Properties = {
    val p = new Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    p
  }

  private def fato = (1 to 257).map { i =>
    (i.toLong, (i % 25 + 1).toLong, s"Município nº $i", (i % 7).toDouble, 2026)
  }.toDF("id_inquerito", "id_entidades", "ent_nome", "score", "ano")

  test("writeJdbc/readJdbc round-trip a star-shaped frame (batchsize set)") {
    Writers.writeJdbc(fato, url, "fato_inquerito", props, batchSize = 64,
      mode = SaveMode.Overwrite)
    val back = Writers.readJdbc(spark, url, "fato_inquerito", props)
    assert(back.columns.map(_.toLowerCase).sorted.sameElements(
      fato.columns.map(_.toLowerCase).sorted))
    val exp = fato.orderBy("id_inquerito")
      .collect().map(_.toSeq).toSeq
    val got = back.select(fato.columns.map(col): _*).orderBy("id_inquerito")
      .collect().map(_.toSeq).toSeq
    assert(got == exp) // values (incl. non-ASCII strings) survive the trip
  }

  test("append mode accumulates batches without RETURNING round-trips") {
    Writers.writeJdbc(fato, url, "fato_append", props, mode = SaveMode.Overwrite)
    Writers.writeJdbc(fato.withColumn("ano", lit(2027)), url, "fato_append", props)
    val back = Writers.readJdbc(spark, url, "fato_append", props)
    assert(back.count() == 514)
    assert(back.where($"ano" === 2027).count() == 257)
  }

  test("dim get-or-create continues from database state (S4 scan + S6 write)") {
    Seq((1L, "excel avançado"), (2L, "sig municipal"))
      .toDF("id_formacao", "nome_formacao")
      .pipe(d => Writers.writeJdbc(d, url, "dim_formacao", props,
        mode = SaveMode.Overwrite))
    val existing = Writers.readJdbc(spark, url, "dim_formacao", props)
      .select($"id_formacao", $"nome_formacao")
    val incoming = Seq("sig municipal", "lideranca", "lideranca").toDF("nome_formacao")
    val merged = SurrogateKeys.getOrCreate(
      existing, incoming, "id_formacao", "nome_formacao")
    Writers.writeJdbc(merged, url, "dim_formacao2", props, mode = SaveMode.Overwrite)
    val back = Writers.readJdbc(spark, url, "dim_formacao2", props)
      .orderBy("id_formacao").as[(Long, String)].collect().toSeq
    assert(back == Seq(
      (1L, "excel avançado"), (2L, "sig municipal"), (3L, "lideranca")))
  }

  test("read path pushes filters into the database scan") {
    Writers.writeJdbc(fato, url, "fato_push", props, mode = SaveMode.Overwrite)
    val scan = Writers.readJdbc(spark, url, "fato_push", props)
      .where($"ano" === 2026 && $"id_entidades" > 10L)
    val plan = scan.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"))
    assert(plan.contains("ANO") || plan.contains("ano"))
    assert(scan.count() === fato.where($"id_entidades" > 10).count())
  }

  test("partitioned JDBC scan splits the read across executors") {
    Writers.writeJdbc(fato, url, "fato_part", props, mode = SaveMode.Overwrite)
    val p = props
    p.setProperty("partitionColumn", "id_inquerito")
    p.setProperty("lowerBound", "1")
    p.setProperty("upperBound", "258")
    p.setProperty("numPartitions", "4")
    val back = Writers.readJdbc(spark, url, "fato_part", p)
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == 257)
  }

  implicit final class Piped[A](private val a: A) {
    def pipe[B](f: A => B): B = f(a)
  }
}
