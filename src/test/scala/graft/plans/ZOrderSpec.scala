package graft.plans

import graft.SparkSpec
import graft.sources.ParquetMeta
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  test("zValue2 matches the bit-interleave reference on sample points") {
    import spark.implicits._
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
        .reduce(_ | _)
    val pts = Seq((0L, 0L), (3L, 5L), (4095L, 1L), (1L, 4095L), (2048L, 2048L))
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue2(col("x"), col("y"), 12).as("zv"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, zv) => assert(zv === ref(x, y, 12), s"($x,$y)") }
  }

  test("zOrdered rejects a caller _zv column instead of silently clobbering it") {
    import spark.implicits._
    val df = Seq((1L, 2L, 99L)).toDF("x", "y", "_zv")
    val e = intercept[IllegalArgumentException] {
      ZOrder.zOrdered(df, col("x"), col("y"), files = 1)
    }
    assert(e.getMessage.contains("_zv"))
  }

  test("two-dimension filter prunes more row groups on a z-ordered write than an unordered one") {
    import spark.implicits._
    // end-to-end proof of the layout's point: the same rectangle filter,
    // adjudicated purely from parquet FOOTER stats (what a scan's
    // row-group pruning reads), must qualify fewer row groups under the
    // Z-order layout than under an unordered write of identical data
    val grid = (for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val key = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "100000") // exact boundaries (see test above)
    val zDir = tmpDir("zskip_z")
    val uDir = tmpDir("zskip_u")
    try ZOrder.zOrdered(grid, col("x"), col("y"), files = 8, bits = 6)
      .write.mode("overwrite").parquet(zDir)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
    grid.repartition(8).write.mode("overwrite").parquet(uDir)
    // rectangle predicate: 8 <= x <= 23 AND 8 <= y <= 23 (1/16 of the grid)
    def qualifying(dir: String): (Int, Int) = {
      val stats = new java.io.File(dir).listFiles
        .filter(_.getName.endsWith(".parquet")).map(_.getPath)
        .flatMap(f => ParquetMeta.columnStats(spark, f))
      val groups = stats.groupBy(s => (s.path, s.rowGroup))
      val hit = groups.count { case (_, cols) =>
        def overlaps(c: String): Boolean = {
          val s = cols.find(_.column == c).get
          s.min.toLong <= 23L && s.max.toLong >= 8L
        }
        overlaps("x") && overlaps("y")
      }
      (hit, groups.size)
    }
    val (zHit, zTotal) = qualifying(zDir)
    val (uHit, uTotal) = qualifying(uDir)
    // unordered: every row group spans the full range → nothing prunes
    assert(uHit === uTotal, s"unordered layout unexpectedly pruned ($uHit/$uTotal)")
    // z-order: the rectangle intersects a strict minority of z-ranges
    assert(zHit < uHit, s"z-order must qualify fewer groups ($zHit/$zTotal vs $uHit/$uTotal)")
    assert(zHit <= zTotal / 2, s"expected <= half the z-ordered groups to qualify, got $zHit/$zTotal")
  }

  test("z-ordered layout bounds every file in BOTH dimensions") {
    import spark.implicits._
    // uniform 64×64 grid; 4 z-range files should land near the 4
    // quadrants — each bounded to ~half the global range in x AND y,
    // which single-column sorting cannot do for the second column
    val grid = (for { x <- 0 until 64; y <- 0 until 64 } yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val out = tmpDir("zord")
    // exhaustive range-boundary sampling: the default (100/partition)
    // can misplace a quartile boundary and make one file straddle two
    // quadrants — production runs take that slack, a 4-file assertion
    // can't
    val key = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "100000")
    try ZOrder.zOrdered(grid, col("x"), col("y"), files = 4, bits = 6)
      .write.mode("overwrite").parquet(out)
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
    val files = new java.io.File(out).listFiles
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath)
    assert(files.length === 4)
    val widths = files.map { f =>
      val stats = ParquetMeta.columnStats(spark, f)
      def width(c: String): Long = {
        val s = stats.filter(_.column == c)
        s.map(_.max.toLong).max - s.map(_.min.toLong).min
      }
      (width("x"), width("y"))
    }
    // range-partition boundaries are sampled, so allow slack over the
    // ideal 32; the point is every file is well under the global 63
    widths.foreach { case (wx, wy) =>
      assert(wx <= 48, s"x width $wx")
      assert(wy <= 48, s"y width $wy")
    }
  }
}
