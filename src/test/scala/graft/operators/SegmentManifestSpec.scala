package graft.operators

import graft.SparkSpec

/** Commit-protocol unit coverage for [[SegmentManifest]] that the
  * index-level specs don't reach: the legacy-upgrade bootstrap must
  * treat write-once crash debris as invisible, exactly like the
  * sealed-mode reader does. */
class SegmentManifestSpec extends SparkSpec {

  private def fs(path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("bootstrap skips token-suffixed crash debris: a books_" +
      "<gen>-<token> dir left by a rebuild that died before its " +
      "first seal must not wedge the upgrade path") {
    val dir = scratch("smf_debris").toString
    val f = fs(dir)
    f.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/centroid_id=3"))
    f.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/centroid_id=11"))
    // the debris: a write-once books dir staged by ivfPqRebuildMvcc
    // whose seal never happened — unreferenced, supposed to be
    // invisible until vacuum, and previously a NumberFormatException
    // that permanently wedged every bootstrap retry
    f.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/books_1-deadbeef"))
    val m = SegmentManifest.bootstrap(spark, dir,
      Seq(SegmentManifest.CellLayout, SegmentManifest.BooksLayout))
    assert(m.gen == 0)
    assert(m.entries("cells").map(_.seg) == Seq(3, 11),
      s"got ${m.entries("cells")}")
    assert(m.entries("books").isEmpty,
      "unreferenced books debris folded into generation 0")
  }
}
