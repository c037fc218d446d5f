package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs. One session per suite-class is
  * wasteful; getOrCreate reuses the first across the forked test JVM. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = {
    // keep derby/warehouse litter inside the build tree
    System.setProperty("derby.system.home", "target/test-scratch/derby")
    SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "target/test-scratch/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  /** Scratch dir inside the build tree (never outside the repo). */
  def scratch(name: String): java.nio.file.Path = {
    val p = java.nio.file.Paths.get("target", "test-scratch", name)
    java.nio.file.Files.createDirectories(p.getParent)
    p
  }
}
