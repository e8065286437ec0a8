package graft.cdc

/** Port of the reference's `generate` subcommand (DebeziumConfiguration.java:19-67):
  * derive a Debezium Server properties file from the pipeline config. Pure
  * string templating, no Spark involvement — kept as a CLI utility so the
  * capture side can be column-pruned at the PRODUCER (the reference's manual
  * stand-in for predicate/column pushdown, SURVEY §4.1).
  */
object DebeziumConfigGen {

  /** Minimal properties template with the same placeholder surface as the
    * reference's templates/debezium.properties ({{KEY}} substitution,
    * DebeziumConfiguration.java:42-51,62-67). Authored fresh for this engine.
    */
  val defaultTemplate: String =
    """debezium.sink.type=redis
      |debezium.sink.redis.address={{REDIS_ADDRESS}}
      |debezium.sink.redis.db={{REDIS_DB}}
      |debezium.source.connector.class=io.debezium.connector.mysql.MySqlConnector
      |debezium.source.topic.prefix={{TOPIC_PREFIX}}
      |debezium.source.database.include.list={{DB_NAME}}
      |debezium.source.table.include.list={{DB_WATCH_TABLES}}
      |debezium.source.column.include.list={{DB_WATCH_COLUMNS}}
      |debezium.format.key.schemas.enable=false
      |debezium.format.value.schemas.enable=false
      |""".stripMargin

  /** Build substitution values from the config:
    *   - TOPIC_PREFIX / DB_NAME from splitting `source.prefix` on '.'
    *     (DebeziumConfiguration.java:27-29)
    *   - table/column include lists from the mapping keys (:33-40).
    */
  def substitutions(config: CdcConfig): Map[String, String] = {
    val parts = config.source.prefix.split('.').filter(_.nonEmpty)
    val topicPrefix = parts.headOption.getOrElse("cdc")
    val dbName = if (parts.length > 1) parts(1) else topicPrefix
    val tables = config.mapping.keys.toSeq.sorted
    val tableList = tables.map(t => s"$dbName.$t").mkString(",")
    val columnList = (for {
      (table, cols) <- config.mapping.toSeq.sortBy(_._1)
      column <- cols.keys.toSeq.sorted
    } yield s"$dbName.$table.$column").mkString(",")
    Map(
      "TOPIC_PREFIX" -> topicPrefix,
      "DB_NAME" -> dbName,
      "DB_WATCH_TABLES" -> tableList,
      "DB_WATCH_COLUMNS" -> columnList,
      "REDIS_ADDRESS" ->
        s"${config.source.connection.host}:${config.source.connection.port}",
      "REDIS_DB" -> config.source.connection.db.toString)
  }

  def generate(config: CdcConfig, template: String = defaultTemplate): String =
    substitutions(config).foldLeft(template) {
      case (acc, (k, v)) => acc.replace(s"{{$k}}", v)
    }
}
