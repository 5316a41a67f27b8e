package graft.pipeline

import graft.SparkSpec
import graft.tools.ReconcileCorpus

/** The N-zip corpus parity loop (reference `scripts/validate.sh` +
  * `src/bin/verify.rs` analog): split N multi-table zips into one lake,
  * reconcile D-lines zip↔parquet, compact, reconcile again — and prove
  * the gate can actually fail by deleting a parquet file. */
class ReconcileCorpusSpec extends SparkSpec {

  test("20-zip corpus reconciles at split AND after compaction; tampering flips it") {
    val work = tmpDir("reconcile_corpus")
    val n = 20
    val rep = ReconcileCorpus.run(spark, work, n)
      .orderBy("stage", "table").collect()
    assert(rep.length == 4, s"expected 2 stages x 2 tables, got ${rep.toSeq}")
    assert(rep.forall(_.getAs[Boolean]("matches")),
      s"corpus does not reconcile: ${rep.mkString("\n")}")
    // source counts cross-checked against the independent formula, so a
    // generator bug and a counting bug can't cancel out
    val expected = ReconcileCorpus.expectedRows(n)
    rep.foreach { r =>
      val t = r.getAs[String]("table")
      assert(r.getAs[Long]("source_rows") == expected(t),
        s"$t: source_rows ${r.getAs[Long]("source_rows")} != expected ${expected(t)}")
      assert(r.getAs[Long]("lake_rows") == expected(t))
    }
    // compaction must actually compact: N-ish per-zip files before, a
    // single-digit generation after — with counts unmoved (asserted above)
    val filesBefore = rep.filter(_.getAs[String]("stage") == "split")
      .map(_.getAs[Int]("files")).max
    val filesAfter = rep.filter(_.getAs[String]("stage") == "compacted")
      .map(_.getAs[Int]("files")).max
    assert(filesBefore >= n / 2, s"split stage should have many small files, got $filesBefore")
    assert(filesAfter < filesBefore,
      s"compaction did not reduce file count: $filesBefore -> $filesAfter")

    // the gate fires: drop one parquet file, the report must flag it
    val lake = java.nio.file.Path.of(work, "lake", "FPP---UNIT_MW---1")
    val victim = {
      val s = java.nio.file.Files.walk(lake)
      try s.filter(_.toString.endsWith(".parquet")).findFirst().get()
      finally s.close()
    }
    java.nio.file.Files.delete(victim)
    val zips = (0 until n).map(i =>
      java.nio.file.Path.of(work, "zips", f"PUBLIC_FPP_20250607_$i%04d.zip").toString)
    val tampered = Reconcile.run(spark, zips, s"$work/lake").collect()
      .map(r => r.getAs[String]("table") -> r.getAs[Boolean]("matches")).toMap
    assert(!tampered("FPP---UNIT_MW---1"), "lost file not flagged")
    assert(tampered("FPP---REGION_FREQ_MEASURE---1"), "untouched table wrongly flagged")
  }
}
