package graft

import org.apache.spark.sql.functions._

/** Round-13 batch-18 invariants: histogram join sizing, multiline CSV
  * integrity, confusion-matrix conservation, and vacuum orphan listing.
  */
class Round13RSpec extends SparkTestBase {
  import spark.implicits._

  test("q_join_cardinality: the histogram prediction IS the join size") {
    val out = SparkEntry.queries("q_join_cardinality")(spark, sf0001)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(out.size == 2)
    out.foreach { case (shape, (pred, actual)) =>
      assert(pred == actual, s"$shape: predicted $pred != actual $actual")
    }
    // The self-join is at least the table size (every row matches itself).
    val n = Catalog.load(spark, sf0001, "lineitem").count()
    assert(out("lineitem_self_partkey")._1 >= n)
    assert(out("orders_lineitem_orderkey")._1 == n) // every item has its order
  }

  test("q_source_csv_multiline: embedded newlines do not shred records") {
    val r = SparkEntry.queries("q_source_csv_multiline")(spark, sf0001)
      .head()
    val part = Catalog.load(spark, sf0001, "part")
    assert(r.getLong(0) == part.count())
    assert(r.getLong(1) == part.agg(sum($"p_partkey")).head().getLong(0))
  }

  test("q_text_langid_eval conserves documents and class shares") {
    val out = SparkEntry.queries("q_text_langid_eval")(spark, sf0001)
      .collect()
    val nDocs = Catalog.load(spark, sf0001, "documents").count()
    assert(out.map(_.getLong(2)).sum == nDocs)
    // Per labeled class, shares sum to 10^6 within integer-floor slack.
    out.groupBy(_.getString(0)).foreach { case (lang, rows) =>
      val s = rows.map(_.getLong(4)).sum
      assert(s <= 1000000L && s > 1000000L - rows.length,
        s"$lang shares sum to $s")
    }
  }

  test("vacuum view: orphan files = on-disk dirs minus the head live set") {
    // The LakeOps scratch at HEAD (v6, since round 14): live = {fileD,
    // fileF} plus the registered DV dv1; the dirs A, B, C (+ the log)
    // remain on disk as vacuum candidates — exactly what a
    // retention-windowed VACUUM would delete (and q_lake_vacuum executes
    // on its own table).
    SparkEntry.queries("q_lake_compact")(spark, sf0001).collect()
    val live4 = graft.operators.LakeOps.timeTravelLiveFiles(spark, sf0001, 4)
      .map(p => java.nio.file.Path.of(p).getFileName.toString).toSet
    assert(live4 == Set("fileD"))
    val head = graft.operators.LakeOps.timeTravelLiveFiles(spark, sf0001, 6)
      .map(p => java.nio.file.Path.of(p).getFileName.toString).toSet
    assert(head == Set("fileD", "fileF"))
    val base = java.nio.file.Path.of(
      graft.operators.LakeOps.timeTravelLiveFiles(spark, sf0001, 4).head)
      .getParent
    val onDisk = {
      val ls = java.nio.file.Files.list(base)
      try {
        import scala.jdk.CollectionConverters._
        ls.iterator().asScala.filter(java.nio.file.Files.isDirectory(_))
          .map(_.getFileName.toString).toSet
      } finally ls.close()
    }
    // dv1 is not a data file but is referenced by v5+ snapshots — a vacuum
    // must keep it alongside the files it masks.
    assert(onDisk -- head -- Set("dv1") == Set("fileA", "fileB", "fileC"))
  }
}
