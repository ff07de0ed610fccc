package graft.streaming

import graft.auth.TokenProvider
import graft.model.StreamConfig
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Topic-source builders. Every builder produces the engine's frame
  * contract — (value string, tableId int, partitionId long,
  * offset long) — so [[CdcEngine.startFromFrames]] is source-agnostic,
  * the same seam the reference's reader abstracts
  * (internal/reader/reader.go:145-292).
  */
object TopicSource {

  /** Directory analog of a topic: srcPath/partition=<p>/<file>, one
    * JSON message per line carrying its own "offset" field (the file
    * source has no broker offsets). Unbounded: files appended while
    * the stream runs are picked up by subsequent micro-batches, and
    * Spark's file-source checkpoint replays unseen files after a
    * restart.
    */
  def directory(spark: SparkSession, s: StreamConfig): DataFrame =
    spark.readStream
      .schema(StructType(Seq(StructField("value", StringType))))
      .text(s"${s.srcPath}/partition=*/")
      .withColumn("tableId", lit(s.tableId))
      .withColumn("partitionId",
        regexp_extract(input_file_name(), "partition=(\\d+)", 1).cast("long"))
      .withColumn("offset",
        get_json_object(col("value"), "$.offset").cast("long"))

  /** Option map for a Kafka topic source, auth included — kept pure so
    * it is testable without a broker. `srcPath` is
    * "<bootstrap-servers>/<topic>" (the connection-string analog of
    * the reference's src_topic + src_connection_string).
    */
  def kafkaOptions(s: StreamConfig,
      auth: Option[TokenProvider] = None,
      startingOffsets: String = "earliest"): Map[String, String] = {
    val (brokers, topic) = s.srcPath.split("/", 2) match {
      case Array(b, t) => (b, t)
      case _ => throw new IllegalArgumentException(
        s"kafka srcPath must be <brokers>/<topic>: ${s.srcPath}")
    }
    val base = Map(
      "kafka.bootstrap.servers" -> brokers,
      "subscribe" -> topic,
      "startingOffsets" -> startingOffsets,
      // the engine's checkpoint filter + atomic sink give effectively
      // -once apply; the source only needs at-least-once delivery
      "failOnDataLoss" -> "true")
    auth.fold(base) {
      // OAuth2 exchange: do NOT resolve a token at option-build time —
      // a long-lived stream outlives it. Delegate to kafka-clients'
      // built-in OAUTHBEARER/OIDC login (KIP-768): the client calls
      // the token endpoint itself and re-logins before expiry, so
      // refresh needs no engine-side plumbing. The credentials file
      // holds {"clientId": ..., "clientSecret": ...}.
      case p: graft.auth.OAuth2FileProvider =>
        val creds = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(java.nio.file.Files.readString(
            java.nio.file.Paths.get(p.credentialsPath)))
        def field(name: String): String = {
          val v = Option(creds.get(name)).map(_.asText()).getOrElse(
            throw new IllegalArgumentException(
              s"oauth2 credentials file missing '$name'"))
          v.replace("\\", "\\\\").replace("\"", "\\\"")
        }
        base ++ Map(
          "kafka.security.protocol" -> "SASL_SSL",
          "kafka.sasl.mechanism" -> "OAUTHBEARER",
          "kafka.sasl.login.callback.handler.class" ->
            "org.apache.kafka.common.security.oauthbearer.OAuthBearerLoginCallbackHandler",
          "kafka.sasl.oauthbearer.token.endpoint.url" -> p.endpoint,
          "kafka.sasl.jaas.config" ->
            ("org.apache.kafka.common.security.oauthbearer.OAuthBearerLoginModule required " +
              s"""clientId="${field("clientId")}" clientSecret="${field("clientSecret")}";"""))
      case p =>
        // static token (auth.go:69-89 analog): resolved once by design
        val tok = p.token().replace("\\", "\\\\").replace("\"", "\\\"")
        base ++ Map(
          "kafka.security.protocol" -> "SASL_SSL",
          "kafka.sasl.mechanism" -> "PLAIN",
          "kafka.sasl.jaas.config" ->
            ("org.apache.kafka.common.security.plain.PlainLoginModule required " +
              s"""username="token" password="$tok";"""))
    }
  }

  /** Kafka record shape → the engine's frame contract: the broker's
    * partition/offset become partitionId/offset, so per-partition
    * order verification and the checkpoint filter work identically to
    * the directory analog. Factored out of [[kafka]] so the mapping
    * is contract-testable without the connector jar (TopicStreamSpec
    * drives the engine through a kafka-SHAPED MemoryStream with this
    * projection, including checkpointed restart).
    */
  def kafkaProjection(records: DataFrame, tableId: Int): DataFrame =
    records.select(col("value").cast("string").as("value"),
      lit(tableId).as("tableId"),
      col("partition").cast("long").as("partitionId"),
      col("offset").cast("long").as("offset"))

  /** Kafka topic source. The connector round-trip itself is untested
    * in this environment (no Kafka connector jar / broker offline);
    * the option map and the projection are each covered by specs.
    */
  def kafka(spark: SparkSession, s: StreamConfig,
      auth: Option[TokenProvider] = None,
      startingOffsets: String = "earliest"): DataFrame = {
    val reader = kafkaOptions(s, auth, startingOffsets)
      .foldLeft(spark.readStream.format("kafka")) {
        case (r, (k, v)) => r.option(k, v)
      }
    kafkaProjection(reader.load(), s.tableId)
  }

  /** Build the union frame for a set of streams by source type. */
  def forStreams(spark: SparkSession, streams: Seq[StreamConfig],
      sourceType: String = "directory",
      auth: Option[TokenProvider] = None): DataFrame =
    streams.map { s =>
      sourceType match {
        case "directory" => directory(spark, s)
        case "kafka" => kafka(spark, s, auth)
        case other =>
          throw new IllegalArgumentException(s"unknown source type $other")
      }
    }.reduce(_ unionByName _)
}
