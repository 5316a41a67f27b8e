package graft.tools

import org.apache.spark.sql.functions._

/** Measure the deterministic-presentation-sort tax (r20): a global
  * `orderBy` plans as a RangePartitioning exchange whose bounds come
  * from SAMPLING the child RDD — the child executes once for the sample
  * and again for the shuffle write, so everything between the last
  * materialized stage and the sort runs twice (guide §2.4 names the
  * "orderBy used only to make output deterministic" as a removable
  * shuffle; here it is the ORACLE's determinism contract, so the
  * question is its cost, not its removal). Times three representative
  * shapes with and without the final sort.
  * Usage: sbt "runMain graft.tools.SortTax [sfDir] [n]" */
object SortTax {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    import graft.Tables
    def j02body = {
      val li = Tables(spark, sfDir, "lineitem")
      val ps = li.groupBy(col("l_partkey").as("partkey"), col("l_suppkey").as("suppkey"))
        .agg(count(lit(1)).as("n_ps"))
      li.join(ps, col("l_partkey") === col("partkey") && col("l_suppkey") === col("suppkey"))
        .select("l_orderkey", "l_linenumber", "n_ps")
    }
    def p01body = Tables(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("okey"), col("l_linenumber").as("line"),
        col("l_quantity").as("qty"))
    def u02body = {
      val o = Tables(spark, sfDir, "orders")
        .select(col("o_orderkey").as("k"), lit("o").as("src"))
      val l = Tables(spark, sfDir, "lineitem")
        .select(col("l_orderkey").as("k"), lit("l").as("src"))
      o.unionByName(l)
    }
    val shapes = Seq(
      ("j02", () => j02body, Seq("l_orderkey", "l_linenumber")),
      ("p01", () => p01body, Seq("okey", "line")),
      ("u02", () => u02body, Seq("k", "src")))
    shapes.foreach { case (name, body, keys) =>
      def mk(mode: String) = mode match {
        case "orderBy" => body().orderBy(keys.map(col): _*)
        case "none"    => body()
        case "rr1sort" => body().repartition(1).sortWithinPartitions(keys.map(col): _*)
        case "range1"  => body().repartitionByRange(1, keys.map(col): _*)
          .sortWithinPartitions(keys.map(col): _*)
      }
      def run(mode: String): Double = {
        val df = mk(mode)
        val t0 = System.nanoTime()
        graft.Bench.force(df)
        (System.nanoTime() - t0) / 1e9
      }
      Seq("orderBy", "none", "rr1sort", "range1").foreach(run) // cold, discard
      Seq("orderBy", "none", "rr1sort", "range1").foreach { m =>
        val ts = (1 to n).map(_ => run(m))
        println(f"[sorttax] $name%-4s $m%-8s ${ts.map(t => f"$t%.2f").mkString("/")}")
      }
    }
    spark.stop()
  }
}
