package graft.etl

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Classpath fixtures (FIXTURES.md) extracted to a temp dir so Spark's
  * file-based readers can scan them even when the library runs from a jar.
  */
object Fixtures {

  private lazy val dir: Path = {
    val d = Files.createTempDirectory("graft-fixtures")
    d.toFile.deleteOnExit()
    d
  }

  def path(name: String): String = {
    val target = dir.resolve(name)
    if (!Files.exists(target)) {
      val in = getClass.getResourceAsStream(s"/fixtures/$name")
      require(in != null, s"fixture $name not on classpath")
      try Files.copy(in, target, StandardCopyOption.REPLACE_EXISTING)
      finally in.close()
    }
    target.toString
  }

  def config: EtlConfig = Config.fromJsonFile(path("config.json"))
}
