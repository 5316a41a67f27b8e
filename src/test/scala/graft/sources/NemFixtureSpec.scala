package graft.sources

import graft.SparkSpec
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** The roundtrip fixtures are bench queries (`nem_split_roundtrip`,
  * `nem_compact_roundtrip`) invoked many times per bench run — they must
  * not leak their temp lakes (r11 verdict #1: leaked dirs degraded warm
  * samples 0.7→8.7 s across reps and littered /tmp). */
class NemFixtureSpec extends SparkSpec {

  private def graftTmpDirs(): Set[String] = {
    val tmp = Path.of(System.getProperty("java.io.tmpdir"))
    val s = Files.list(tmp)
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(n => n.startsWith("graft_nem_") || n.startsWith("graft_codec")).toSet
    finally s.close()
  }

  test("splitRoundtrip produces the summary and leaves no temp dirs behind") {
    val before = graftTmpDirs()
    val rows = NemFixture.splitRoundtrip(spark).orderBy("table").collect()
    assert(rows.length == 2)
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("FPP---REGION_FREQ_MEASURE---1", "FPP---UNIT_MW---1"))
    assert(graftTmpDirs() == before, "splitRoundtrip leaked temp dirs")
  }

  test("compactRoundtrip is rep-stable: repeated invocations leak nothing and agree") {
    val before = graftTmpDirs()
    val r1 = NemFixture.compactRoundtrip(spark).orderBy("table", "partition").collect()
    val r2 = NemFixture.compactRoundtrip(spark).orderBy("table", "partition").collect()
    assert(r1.nonEmpty)
    assert(r1.map(_.toString).toSeq == r2.map(_.toString).toSeq)
    assert(graftTmpDirs() == before, "compactRoundtrip leaked temp dirs")
  }
}
