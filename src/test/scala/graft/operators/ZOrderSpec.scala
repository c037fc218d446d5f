package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Z-order clustering: Morton math, and the property the layout exists
  * for — per-file min-max ranges stay narrow on BOTH keys, where a
  * single-key sort leaves the other key's ranges full-width. */
class ZOrderSpec extends SparkSpec {

  test("mortonCode interleaves bits (known values) and preserves " +
      "quad-tree locality") {
    import spark.implicits._
    val rows = Seq((0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (3, 3), (255, 255))
      .toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.mortonCode(col("x"), col("y"), 8).as("z"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    assert(rows((0, 0)) == 0L && rows((1, 0)) == 1L && rows((0, 1)) == 2L &&
      rows((1, 1)) == 3L && rows((2, 0)) == 4L && rows((3, 3)) == 15L &&
      rows((255, 255)) == 65535L)
  }

  test("z-ordered files have narrow min-max ranges on BOTH keys; " +
      "x-sorted files are full-width on y") {
    import spark.implicits._
    // 256×256 grid, deterministically scrambled write order
    val pts = (0 until 65536).map { i =>
      val j = ((i.toLong * 48271L) % 65536L).toInt
      (j % 256, j / 256)
    }.toDF("x", "y")

    def fileSpreads(path: String): (Double, Double) = {
      val files = new java.io.File(path).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.toString)
      assert(files.length >= 8, s"want many files, got ${files.length}")
      val spreads = files.map { f =>
        val r = spark.read.parquet(f)
          .agg(min("x"), max("x"), min("y"), max("y")).collect()(0)
        ((r.getInt(1) - r.getInt(0)) / 255.0,
          (r.getInt(3) - r.getInt(2)) / 255.0)
      }
      (spreads.map(_._1).sum / spreads.length,
        spreads.map(_._2).sum / spreads.length)
    }

    val zPath = scratch("zorder").toString
    ZOrder.writeZOrdered(pts, zPath, col("x"), col("y"), bits = 8,
      nFiles = 16)
    val (zx, zy) = fileSpreads(zPath)

    val xPath = scratch("xsort").toString
    pts.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xPath)
    val (sx, sy) = fileSpreads(xPath)

    // 16 z-range files over a 256×256 grid ≈ quad cells: both spreads
    // well under half the domain; the x-sort leaves y unconstrained
    assert(zx <= 0.5 && zy <= 0.5,
      f"z-order spreads too wide: x=$zx%.2f y=$zy%.2f")
    assert(sx <= 0.2 && sy >= 0.9,
      f"control x-sort should be narrow on x, full on y: x=$sx%.2f y=$sy%.2f")
    // the whole point: worst-axis spread is much better than sorting
    assert(math.max(zx, zy) < sy * 0.6)
  }
}
