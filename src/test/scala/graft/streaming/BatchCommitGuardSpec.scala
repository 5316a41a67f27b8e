package graft.streaming

import graft.SparkSpec
import org.apache.hadoop.fs.{Path, RawLocalFileSystem}
import java.net.URI

/** Local FS whose rename FAILS only for the publish step's
  * `batch<id>-` destination names — the parquet committer's own
  * internal renames (part files, task dirs) pass through, so the
  * failure is injected exactly at [[BatchCommit.publish]]'s move. */
class RenameFailFs extends RawLocalFileSystem {
  override def getUri: URI = URI.create("failfs:///")
  override def rename(src: Path, dst: Path): Boolean =
    if (dst.getName.startsWith("batch")) false else super.rename(src, dst)
}

/** Drives the two defensive guards the r11 verdict flagged as untested
  * failure paths: publish's rename-failure throw and the HLL mixed-p /
  * truncated-partial requires. */
class BatchCommitGuardSpec extends SparkSpec {

  test("publish: a failed rename fails the tick with NO committed batch files") {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.failfs.impl", classOf[RenameFailFs].getName)
    val dir = tmpDir("bc_renamefail")
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")

    val ex = intercept[java.io.IOException] {
      BatchCommit.publish(conf, df, s"failfs://$dir", 7L)
    }
    assert(ex.getMessage.contains("rename"))
    // the throw happened BEFORE any caller could write the commit marker,
    // and no batch-prefixed file was committed — the replay path sees a
    // clean (rollbackable) partial state
    val committed = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("batch7-"))
    assert(committed.isEmpty, "failed rename must not leave committed batch files")

    // the standard replay sequence over the same dir (plain scheme)
    // recovers: rollback sweeps nothing committed, republish lands
    BatchCommit.rollback(conf, dir, 7L)
    BatchCommit.publish(conf, df, dir, 7L)
    assert(spark.read.parquet(dir).count() === 2)
    assert(new java.io.File(dir).listFiles().exists(_.getName.startsWith("batch7-")))
  }

  test("readTokenCardinality: mixed-p register partials are refused at the fold") {
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    val statsDir = tmpDir("hll_mixedp")
    val toks = Seq("alpha", "beta", "gamma", "delta").toDF("tok")
    // two ticks written at DIFFERENT p — the merged dense grids union to
    // the larger grid (a power of two!), so only the p stamp catches it
    graft.operators.TextSketches.hllRegisters(toks, col("tok"), p = 4)
      .withColumn("p", lit(4)).write.mode("append").parquet(s"$statsDir/hll")
    graft.operators.TextSketches.hllRegisters(toks, col("tok"), p = 5)
      .withColumn("p", lit(5)).write.mode("append").parquet(s"$statsDir/hll")
    val ex = intercept[IllegalArgumentException] {
      CorpusStream.readTokenCardinality(spark, statsDir)
    }
    assert(ex.getMessage.contains("mixed"))
  }

  test("readTokenCardinality: stamped + unstamped partials mixed in one dir are refused") {
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    val statsDir = tmpDir("hll_mixedstamp")
    val toks = Seq("alpha", "beta").toDF("tok")
    graft.operators.TextSketches.hllRegisters(toks, col("tok"), p = 4)
      .withColumn("p", lit(4)).write.mode("append").parquet(s"$statsDir/hll")
    // a pre-stamp partial: same grid, no p column — its rows surface p
    // as null under schema merge, which must refuse, not NPE
    graft.operators.TextSketches.hllRegisters(toks, col("tok"), p = 4)
      .write.mode("append").parquet(s"$statsDir/hll")
    val ex = intercept[IllegalArgumentException] {
      CorpusStream.readTokenCardinality(spark, statsDir)
    }
    assert(ex.getMessage.contains("unstamped"))
  }

  test("readTokenCardinality: truncated (non-power-of-two) unstamped partials are refused") {
    import spark.implicits._
    val statsDir = tmpDir("hll_truncated")
    // hand-written corrupt partial: 3 buckets, no p stamp
    Seq((0L, 1), (1L, 2), (2L, 1)).toDF("bucket", "rho")
      .write.parquet(s"$statsDir/hll")
    val ex = intercept[IllegalArgumentException] {
      CorpusStream.readTokenCardinality(spark, statsDir)
    }
    assert(ex.getMessage.contains("power-of-two"))
  }

  test("readTokenCardinality: full stamped grid still folds (guards pass on the good path)") {
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    val statsDir = tmpDir("hll_good")
    val toks = Seq("alpha", "beta", "gamma", "delta").toDF("tok")
    graft.operators.TextSketches.hllRegisters(toks, col("tok"), p = 4)
      .withColumn("p", lit(4)).write.mode("append").parquet(s"$statsDir/hll")
    val row = CorpusStream.readTokenCardinality(spark, statsDir).head()
    assert(row.getAs[Long]("m") === 16L)
    assert(row.getAs[Double]("est_raw") > 0.0)
  }
}
