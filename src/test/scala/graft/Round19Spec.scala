package graft

import org.apache.spark.sql.functions._

/** Round-19 gates: checkpoint persistence of the everAdded schema-fallback
  * set (the r18 ADVICE item); plus the round's new operators as they land
  * (suffix-span dedup, multi-level Louvain, snapshot expiry, MoR-aware MV
  * refresh, graded HNSW).
  */
class Round19Spec extends SparkTestBase {
  import spark.implicits._

  // ---- checkpoint everAdded persistence (r18 ADVICE fix) ----

  /** A file added-then-removed BEFORE the checkpoint is still on disk and
    * still the empty-snapshot schema fallback's source; the checkpoint
    * must persist it (as a `schema` action) so a checkpoint-resolved
    * state's everAdded equals the full-replay everAdded. */
  test("checkpoint persists pre-checkpoint added-then-removed schema sources") {
    val d = java.nio.file.Files.createTempDirectory("graft_ckpt_schema_")
    java.nio.file.Files.write(d.resolve("_log.json"), Seq(
      s"""{"v":1,"op":"add","path":"f1","min":0,"max":9}""",
      s"""{"v":2,"op":"remove","path":"f1"}""",
      s"""{"v":3,"op":"add","path":"f2","min":10,"max":19}"""
    ).mkString("\n").getBytes("UTF-8"))
    operators.LakeOps.writeCheckpointFor(d.toString, 3)
    val (st, cv, tail) = operators.LakeOps.ckptStateFor(d.toString, 3)
    assert(cv == 3 && tail == 0)
    assert(st.live == Seq("f2"))
    // f1 must survive resolution THROUGH the checkpoint (it was never
    // vacuumed, so it remains a valid schema source on disk).
    assert(st.everAdded.toSet == Set("f1", "f2"),
      s"everAdded lost a pre-checkpoint schema source: ${st.everAdded}")
    // And a vacuumed file must NOT reappear via the schema record.
    val d2 = java.nio.file.Files.createTempDirectory("graft_ckpt_schema2_")
    java.nio.file.Files.write(d2.resolve("_log.json"), Seq(
      s"""{"v":1,"op":"add","path":"f1","min":0,"max":9}""",
      s"""{"v":2,"op":"remove","path":"f1"}""",
      s"""{"v":3,"op":"vacuum","path":"f1"}""",
      s"""{"v":4,"op":"add","path":"f2","min":10,"max":19}"""
    ).mkString("\n").getBytes("UTF-8"))
    operators.LakeOps.writeCheckpointFor(d2.toString, 4)
    val (st2, _, _) = operators.LakeOps.ckptStateFor(d2.toString, 4)
    assert(st2.everAdded.toSet == Set("f2"))
  }
}
