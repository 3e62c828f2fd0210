package graft.types

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.types._
import graft.ingest.MoreTables
import graft.ingest.Tables._

/** Schema registry + DDL generation (K1).
  *
  * The reference derives `CREATE TABLE IF NOT EXISTS` DDL from struct fields
  * (huckli-import-derive/src/lib.rs:80-90, huckli-db/src/lib.rs:58-120;
  * default column type TEXT, default NOT NULL). Here every table's
  * StructType is derived from its case class — one source of truth shared by
  * the ingest encoders and the DDL — and `ddl()` renders the same
  * DuckDB-flavored statement for interop.
  */
object Schemas {

  // Every column in the reference catalog is NOT NULL (no struct uses the
  // `nullable` attribute — SURVEY §1.1), so strip the encoder's nullability.
  private def nonNull(dt: DataType): DataType = dt match {
    case s: StructType => StructType(s.fields.map(f =>
      f.copy(dataType = nonNull(f.dataType), nullable = false)))
    case a: ArrayType => a.copy(elementType = nonNull(a.elementType), containsNull = false)
    case other => other
  }

  private def schemaOf[T <: Product : scala.reflect.runtime.universe.TypeTag]: StructType =
    nonNull(Encoders.product[T].schema).asInstanceOf[StructType]

  private def flat(parent: StructType, structCol: String, extra: (String, DataType)*): StructType = {
    val inner = parent(structCol).dataType.asInstanceOf[StructType]
    StructType(extra.map { case (n, t) => StructField(n, t, nullable = false) } ++ inner.fields)
  }

  val filesProcessed: StructType = schemaOf[FileProcessed]
  val verifiedSpeedtestReport: StructType = schemaOf[VerifiedSpeedtestReport]

  private val mobileShare = schemaOf[MobileShareFlat]
  private val epochCols = Seq(
    StructField("start_period", TimestampType, nullable = false),
    StructField("end_period", TimestampType, nullable = false))
  private def armTable(col: String): StructType = {
    val inner = mobileShare(col).dataType.asInstanceOf[StructType]
    StructType(epochCols ++ inner.fields :+ StructField("file_source", StringType, false))
  }

  val mobileGatewayRewards: StructType = armTable("gateway")
  val mobileSubscriberRewards: StructType = armTable("subscriber")
  val mobileServiceProviderRewards: StructType = armTable("service_provider")
  val mobileUnallocatedRewards: StructType = armTable("unallocated")
  val mobilePromotionRewards: StructType = armTable("promotion")

  private val radioStruct = mobileShare("radio").dataType.asInstanceOf[StructType]
  val mobileRadioRewards: StructType = StructType(
    Seq(radioStruct("id")) ++ epochCols ++
      radioStruct.fields.filterNot(f => Set("id", "location_trust_scores", "speedtests",
        "covered_hexes").contains(f.name)) :+ StructField("file_source", StringType, false))
  private def childTable(col: String): StructType = {
    val elem = radioStruct(col).dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    StructType(StructField("id", StringType, false) +: elem.fields :+
      StructField("file_source", StringType, false))
  }
  val mobileRewardTrustScores: StructType = childTable("location_trust_scores")
  val mobileRewardSpeedtests: StructType = childTable("speedtests")
  val mobileRewardCoveredHexes: StructType = childTable("covered_hexes")

  private val iotShare = schemaOf[IotShareFlat]
  private def iotArm(col: String): StructType = {
    val inner = iotShare(col).dataType.asInstanceOf[StructType]
    StructType(epochCols ++ inner.fields :+ StructField("file_source", StringType, false))
  }
  val iotGatewayRewards: StructType = iotArm("gateway")
  val iotOperationalRewards: StructType = iotArm("operational")
  val iotUnallocatedRewards: StructType = iotArm("unallocated")

  private val coverage = schemaOf[CoverageObjectFlat]
  val coverageObject: StructType = StructType(coverage.fields.filterNot(_.name == "locations"))
  val coverageLocation: StructType = {
    val elem = coverage("locations").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    StructType(StructField("uuid", StringType, false) +: elem.fields :+
      StructField("file_source", StringType, false))
  }

  /** Full catalog: table name → schema. */
  val catalog: Map[String, StructType] = Map(
    "files_processed" -> filesProcessed,
    "verified_speedtest_report" -> verifiedSpeedtestReport,
    "mobile_gateway_rewards" -> mobileGatewayRewards,
    "mobile_subscriber_rewards" -> mobileSubscriberRewards,
    "mobile_service_provider_rewards" -> mobileServiceProviderRewards,
    "mobile_unallocated_rewards" -> mobileUnallocatedRewards,
    "mobile_promotion_rewards" -> mobilePromotionRewards,
    "mobile_radio_rewards" -> mobileRadioRewards,
    "mobile_reward_trust_scores" -> mobileRewardTrustScores,
    "mobile_reward_speedtests" -> mobileRewardSpeedtests,
    "mobile_reward_covered_hexes" -> mobileRewardCoveredHexes,
    "iot_gateway_rewards" -> iotGatewayRewards,
    "iot_operational_rewards" -> iotOperationalRewards,
    "iot_unallocated_rewards" -> iotUnallocatedRewards,
    "coverage_object" -> coverageObject,
    "coverage_location" -> coverageLocation,
    "data_transfer_ingest_report" -> schemaOf[MoreTables.DataTransferIngestReport],
    "verified_data_transfer_ingest_report" -> schemaOf[MoreTables.VerifiedDataTransferIngestReport],
    "data_transfer_burn" -> schemaOf[MoreTables.DataTransferBurn],
    "verified_wifi_heartbeat" -> schemaOf[MoreTables.VerifiedWifiHeartbeat],
    "wifi_heartbeat_ingest_report" -> schemaOf[MoreTables.WifiHeartbeatIngestReport],
    "boosted_hex_update" -> schemaOf[MoreTables.BoostedHexUpdate],
    "subscriber_mapping_activity_ingest" -> schemaOf[MoreTables.SubscriberMappingActivityIngest],
    "verified_subscriber_mapping_activity" -> schemaOf[MoreTables.VerifiedSubscriberMappingActivity],
    "verified_radio_threshold" -> schemaOf[MoreTables.VerifiedRadioThreshold],
    "verified_invalidated_radio_threshold" -> schemaOf[MoreTables.VerifiedInvalidatedRadioThreshold],
    "verified_cdr_verification" -> schemaOf[MoreTables.VerifiedCdrVerification],
    "verified_unique_connections" -> schemaOf[MoreTables.VerifiedUniqueConnections],
    "enabled_carriers_info" -> schemaOf[MoreTables.EnabledCarriersInfo],
    "radio_usage_stats" -> schemaOf[MoreTables.RadioUsageStats],
    "radio_usage_stats_v2" -> schemaOf[MoreTables.RadioUsageStatsV2],
    "mobile_reward_manifest" -> schemaOf[MoreTables.MobileRewardManifest])

  private def sqlType(dt: DataType): String = dt match {
    case StringType => "TEXT"
    case TimestampType => "timestamptz"
    case LongType => "bigint"
    case IntegerType => "int32"
    case DoubleType => "double"
    case BooleanType => "bool"
    case other => other.sql
  }

  /** K1: render the reference-style CREATE TABLE statement. */
  def ddl(table: String): String = {
    val schema = catalog(table)
    val cols = schema.fields.map { f =>
      val nullable = if (f.nullable) "NULL" else "NOT NULL"
      s"${f.name} ${sqlType(f.dataType)} $nullable"
    }
    s"CREATE TABLE IF NOT EXISTS $table (${cols.mkString(",")})"
  }

  /** Single-artifact interop — the reference's `--db` DuckDB output
    * (huckli-import writes tables into one .db file) re-expressed for a
    * warehouse that must scale: data stays in parquet, and a generated
    * catalog script exposes every table as a DuckDB view. `duckdb my.db <
    * catalog.sql` yields the same queryable single artifact without
    * funnelling 100 TB through a single-node database file. */
  def duckDbCatalog(warehouse: String, tables: Iterable[String]): String =
    tables.toSeq.sorted.map { t =>
      s"CREATE OR REPLACE VIEW $t AS SELECT * FROM read_parquet('$warehouse/$t/*.parquet');"
    }.mkString("", "\n", "\n")

  /** Write `catalog.sql` next to the warehouse tables (every non-internal
    * directory becomes a view). Returns the rendered script. */
  def writeDuckDbCatalog(spark: org.apache.spark.sql.SparkSession,
                         warehouse: String): String = {
    val p = new org.apache.hadoop.fs.Path(warehouse)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tables =
      if (!fs.exists(p)) Seq.empty
      else fs.listStatus(p).toSeq.filter(_.isDirectory)
        .map(_.getPath.getName).filterNot(_.startsWith("_"))
    val sql = duckDbCatalog(warehouse, tables)
    val out = fs.create(new org.apache.hadoop.fs.Path(p, "catalog.sql"), true)
    try out.write(sql.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    sql
  }
}
