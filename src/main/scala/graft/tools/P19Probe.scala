package graft.tools
import org.apache.spark.sql.functions._

/** Scratch decomposition probe for p19's lake-20 superlinearity (round 14). */
object P19Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_lake20")
    val spark = graft.GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    val ev = graft.Tables(spark, dir, "events")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[p19probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }
    ev.persist(); ev.count()
    time("scan only (noop)") { graft.Bench.force(ev.select(col("event_id"), col("props"))) }
    time("json only") { graft.Bench.force(ev.select(col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k"))) }
    time("sort only") { graft.Bench.force(ev.select(col("event_id"), col("props")).orderBy("event_id")) }
    time("json+sort (=p19)") { graft.Bench.force(ev.select(col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k")).orderBy("event_id")) }
    time("json+sort again") { graft.Bench.force(ev.select(col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k")).orderBy("event_id")) }
    ev.select(col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k")).orderBy("event_id")
      .explain("formatted")
    spark.stop()
  }
}
