package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusAssemblySpec extends SparkSpec {

  def corpus() = {
    import spark.implicits._
    val langs = Seq("en", "de", "zh")
    val srcs = Seq("s0", "s1")
    (1L to 300L).map { i =>
      val text =
        if (i % 50 == 0) "dup dup dup shared boilerplate body here"   // exact dups
        else if (i % 37 == 0) "tiny"                                  // under the gate
        else s"doc number $i with some unique words " + ("tok " * (i % 20).toInt).trim
      (i, text, langs((i % 3).toInt), srcs((i % 2).toInt), text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("assemble: every stage's invariant holds on the composed output") {
    val out = CorpusAssembly.assemble(corpus(), "doc_id", "text",
      minTokens = 3,
      langRate = when(col("lang") === "en", lit(0.9)).otherwise(lit(0.5)),
      tokenBudget = 500L, shuffleShards = 4, packBudget = 64, packShards = 2)
    val rows = out.collect()
    assert(rows.nonEmpty)
    val ids = rows.map(_.getLong(0))
    // survivors are unique docs from the input
    assert(ids.distinct.length === ids.length)
    // stage 1+2: no short docs, at most one survivor per duplicated text
    val survivors = corpus().join(out.select("doc_id"), Seq("doc_id"))
    assert(survivors.filter(col("text") === "tiny").count() === 0)
    assert(survivors.filter(col("text").startsWith("dup dup")).count() <= 1)
    // stage 4: per source the selection obeys the budget (each kept doc
    // STARTED under it)
    rows.groupBy(_.getString(2)).foreach { case (_, rs) =>
      // cum offsets are not in the output; re-derive the bound from
      // n_tokens: the sum of all but the largest kept doc stays < budget
      // + the crossing doc rule means total < budget + max doc
      val toks = rs.map(_.getAs[Long]("n_tokens"))
      assert(toks.sum < 500L + toks.max, s"budget blown: ${toks.sum}")
    }
    // stage 5: shuffle_pos is a permutation of [0, n)
    val pos = rows.map(_.getAs[Long]("shuffle_pos")).sorted
    assert(pos === (0L until rows.length.toLong).toArray)
    // stage 6: offsets telescope exactly per pack shard
    rows.groupBy(_.getAs[Long]("pack_shard")).foreach { case (_, rs) =>
      val inOrder = rs.sortBy(_.getAs[Long]("offset_tokens"))
      assert(inOrder.head.getAs[Long]("offset_tokens") === 0L)
      inOrder.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("offset_tokens")
            === a.getAs[Long]("offset_tokens") + a.getAs[Long]("n_tokens"))
        case _ => ()
      }
      inOrder.foreach { r =>
        assert(r.getAs[Long]("pack_id") === r.getAs[Long]("offset_tokens") / 64)
      }
    }
    // deterministic end to end — clear the plan-keyed caches so run 2
    // recomputes every stage instead of replaying run 1's blocks
    spark.catalog.clearCache()
    val again = CorpusAssembly.assemble(corpus(), "doc_id", "text",
      minTokens = 3,
      langRate = when(col("lang") === "en", lit(0.9)).otherwise(lit(0.5)),
      tokenBudget = 500L, shuffleShards = 4, packBudget = 64, packShards = 2)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("shuffle_pos")).toMap
    assert(rows.map(r => r.getLong(0) -> r.getAs[Long]("shuffle_pos")).toMap === again)
  }

  test("assemble rejects a caller n_tokens column instead of silently recomputing over it") {
    val withTokens = corpus().withColumn("n_tokens", lit(7L))
    val e = intercept[IllegalArgumentException] {
      CorpusAssembly.assemble(withTokens, "doc_id", "text",
        minTokens = 3, langRate = lit(1.0), tokenBudget = 500L,
        shuffleShards = 4, packBudget = 64, packShards = 2)
    }
    assert(e.getMessage.contains("n_tokens"))
  }
}
