package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.plans.SchemaEvolution
import org.apache.spark.sql.types._

/** Property tests for the pure kernels of the ingest path — the pieces a
  * malformed wire file hits first. No SparkSession needed. Deterministic
  * seeds (scalatestplus bridge isn't in the offline cache, so a minimal
  * forAll is rolled here over raw scalacheck Gen). */
class NemCsvPropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], cases: Int = 200)(check: A => Unit): Unit =
    (0 until cases).foreach { i =>
      gen(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)).foreach { a =>
        try check(a)
        catch { case e: Throwable => fail(s"failed for input (seed $i): $a", e) }
      }
    }

  private def forAll[A, B](ga: Gen[A], gb: Gen[B])(check: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => check(t._1, t._2))

  private def forAll[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(
      check: (A, B, C) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc))(t => check(t._1, t._2, t._3))

  /** RFC-4180 encode one field the way writers do: quote when the field
    * contains a comma or quote, doubling embedded quotes. */
  private def encodeField(f: String): String =
    if (f.contains(",") || f.contains("\"")) "\"" + f.replace("\"", "\"\"") + "\""
    else f

  private val fieldGen: Gen[String] =
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(',', '"', ' ', '.', '-')))
      .map(_.mkString)

  test("splitCsvLine inverts RFC-4180 field encoding for any field content") {
    forAll(Gen.nonEmptyListOf(fieldGen)) { fields =>
      val line = fields.map(encodeField).mkString(",")
      assert(NemCsv.splitCsvLine(line).toSeq === fields)
    }
  }

  test("cleanStr contracts, and is idempotent once no outer quote pair remains") {
    forAll(fieldGen) { s =>
      val once = NemCsv.cleanStr(s)
      assert(once.length <= s.length)
      // the contract is ONE outer quote pair stripped per call (after
      // trim); only a result still wrapped in quotes may strip further
      val stillQuoted = once.length >= 2 && once.startsWith("\"") && once.endsWith("\"")
      if (!stillQuoted) assert(NemCsv.cleanStr(once) === once)
    }
  }

  test("dateFromFilename finds any embedded compact date with a valid year") {
    val dateGen = for {
      y <- Gen.choose(2000, 2030)
      m <- Gen.choose(1, 12)
      d <- Gen.choose(1, 28)
    } yield (y, m, d)
    forAll(dateGen, Gen.alphaStr, Gen.alphaStr) { case ((y, m, d), pre, post) =>
      val name = f"${pre}_$y$m%02d$d%02d${post}.zip"
      assert(NemCsv.dateFromFilename(name) === f"$y-$m%02d-$d%02d")
    }
  }

  test("scanLines never throws and never emits wider rows than the header") {
    val lineGen = Gen.oneOf(
      Gen.const("C,header,stuff"),
      Gen.const("I,FPP,T1,1,A,B,C"),
      Gen.const("I,FPP,T2,1,X"),
      fieldGen.map(v => s"D,FPP,T1,1,$v"),
      fieldGen.map(v => s"D,FPP,T1,1,$v,$v,$v,$v,$v"),
      Gen.const(""),
      fieldGen) // junk line
    forAll(Gen.listOf(lineGen)) { lines =>
      val recs = NemCsv.scanLines("f_20250607.csv", lines.iterator).toVector
      recs.foreach { r =>
        assert(r.values.size === r.header.size) // ragged rows padded/truncated
        assert(r.table.nonEmpty)
      }
    }
  }

  private val typeGen: Gen[DataType] = Gen.oneOf(
    StringType, IntegerType, LongType, DoubleType, FloatType, DateType, TimestampType)

  test("widenTypes is commutative and idempotent; widening to itself is identity") {
    forAll(typeGen, typeGen) { (a, b) =>
      assert(SchemaEvolution.widenTypes(a, b) === SchemaEvolution.widenTypes(b, a))
      assert(SchemaEvolution.widenTypes(a, a) === a)
    }
  }

  test("widen yields the union of field names, alphabetical, all nullable") {
    val schemaGen = Gen.nonEmptyListOf(
      Gen.zip(Gen.oneOf("a", "b", "c", "d", "e"), typeGen))
      .map(fs => StructType(fs.distinctBy(_._1).map { case (n, t) => StructField(n, t) }))
    forAll(Gen.nonEmptyListOf(schemaGen)) { schemas =>
      val w = SchemaEvolution.widen(schemas)
      val names = schemas.flatMap(_.fieldNames).distinct.sorted
      assert(w.fieldNames.toSeq === names)
      assert(w.fields.forall(_.nullable))
    }
  }
}
