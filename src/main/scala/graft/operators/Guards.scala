package graft.operators

/** Shared operator-input guards. */
private[graft] object Guards {

  /** Fail fast when an operator would overwrite caller columns: the
    * `withColumn` family silently replaces same-named columns, which
    * turns a schema coincidence into silent data loss. Case-insensitive,
    * matching the analyzer's default resolution. One definition so clash
    * semantics cannot drift between operators. */
  def requireFreshColumns(df: org.apache.spark.sql.DataFrame,
      op: String, cols: Seq[String]): Unit = {
    val clash = cols.filter(c => df.columns.exists(_.equalsIgnoreCase(c)))
    require(clash.isEmpty,
      s"graft $op writes column(s) ${clash.mkString(", ")} that already " +
        "exist on the input frame — rename or drop them upstream")
  }
}
