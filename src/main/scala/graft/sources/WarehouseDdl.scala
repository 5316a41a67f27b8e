package graft.sources

/** S14: external-warehouse DDL over the hive layout — the reference
  * mounts its `compacted/` lake as BigQuery external tables
  * (/root/reference/src/bin/load_bigquery.rs:62-79). The engine's only
  * job is emitting a layout any warehouse can mount; this renders the
  * same DDL shape. */
object WarehouseDdl {

  /** CREATE EXTERNAL TABLE statement for one lake table dir. */
  def bigQueryExternalTable(dataset: String, table: String, bucketUri: String): String = {
    val safe = table.replaceAll("[^A-Za-z0-9_]", "_")
    s"""CREATE EXTERNAL TABLE IF NOT EXISTS `$dataset.$safe`
       |WITH PARTITION COLUMNS (date DATE)
       |OPTIONS (
       |  format = 'PARQUET',
       |  uris = ['$bucketUri/$table/*'],
       |  hive_partition_uri_prefix = '$bucketUri/$table'
       |);""".stripMargin
  }

  /** Spark-side equivalent: an external parquet table over the same dir. */
  def sparkExternalTable(db: String, table: String, lakeRoot: String): String = {
    val safe = table.replaceAll("[^A-Za-z0-9_]", "_")
    s"""CREATE TABLE IF NOT EXISTS $db.$safe
       |USING PARQUET
       |PARTITIONED BY (date)
       |LOCATION '$lakeRoot/$table';""".stripMargin
  }
}
