package graft.ingest

import java.sql.Timestamp

/** Output rows for the remaining 16 record types (SURVEY §1.2 catalog).
  * JSON-typed columns in the reference (`serde_json::Value`) become typed
  * arrays here (SURVEY §1.3's preferred mapping) — `to_json` is applied only
  * if byte-compatible output is required at a sink.
  */
object MoreTables {

  // data_transfer.rs
  case class DataTransferIngestReport(
      hotspot_key: String, upload_bytes: Long, download_bytes: Long,
      rewardable_bytes: Long, technology: String, event_id: String, payer: String,
      timestamp: Timestamp, received_timestamp: Timestamp, carrier_id: String,
      file_source: String)
  case class VerifiedDataTransferIngestReport(
      hotspot_key: String, upload_bytes: Long, download_bytes: Long,
      rewardable_bytes: Long, technology: String, event_id: String, payer: String,
      timestamp: Timestamp, received_timestamp: Timestamp, verified_timestamp: Timestamp,
      status: String, carrier: String, file_source: String)
  case class DataTransferBurn(
      hotspot_key: String, upload_bytes: Long, download_bytes: Long, num_dcs: Long,
      payer: String, first_timestamp: Timestamp, last_timestamp: Timestamp,
      rewardable_bytes: Long, burn_timestamp: Timestamp, file_source: String)

  // heartbeats.rs
  case class VerifiedWifiHeartbeat(
      hotspot_key: String, timestamp: Timestamp, validity: String, lat: Double,
      lon: Double, coverage_object: String, location_validation_timestamp: Timestamp,
      distance_to_asserted: Long, location_trust_score_multiplier: Int,
      location_source: String, file_source: String)
  case class WifiHeartbeatIngestReport(
      hotspot_key: String, timestamp: Timestamp, lat: Double, lon: Double,
      coverage_object: String, received_timestamp: Timestamp, operation_mode: Boolean,
      location_validation_timestamp: Timestamp, location_source: String,
      file_source: String)

  // boosting.rs (T8: multipliers.first, default 0)
  case class BoostedHexUpdate(
      timestamp: Timestamp, location: Long, start_ts: Timestamp, end_ts: Timestamp,
      period_length: Int, multiplier: Int, version: Int, file_source: String)

  // subscribers.rs
  case class SubscriberMappingActivityIngest(
      subscriber_id: String, discovery_reward_shares: Long,
      verification_reward_shares: Long, timestamp: Timestamp,
      received_timestamp: Timestamp, reward_override_entity_key: String,
      file_source: String)
  case class VerifiedSubscriberMappingActivity(
      subscriber_id: String, discovery_reward_shares: Long,
      verification_reward_shares: Long, timestamp: Timestamp,
      received_timestamp: Timestamp, verification_timestamp: Timestamp,
      reward_override_entity_key: String, status: String, file_source: String)

  // radio_thresholds.rs (T7 key coalesce)
  case class VerifiedRadioThreshold(
      radio_key: String, bytes_threshold: Long, subscriber_threshold: Int,
      threshold_timestamp: Timestamp, received_timestamp: Timestamp,
      verified_timestamp: Timestamp, status: String, file_source: String)
  case class VerifiedInvalidatedRadioThreshold(
      radio_key: String, reason: String, threshold_timestamp: Timestamp,
      received_timestamp: Timestamp, verified_timestamp: Timestamp, status: String,
      file_source: String)

  // sp_banned_radio.rs (T7 key-type oneof)
  case class VerifiedCdrVerification(
      hotspot_key: String, reason: String, until: Timestamp, ban_type: String,
      received_timestamp: Timestamp, verified_timestamp: Timestamp, status: String,
      file_source: String)

  // unique_connections.rs
  case class VerifiedUniqueConnections(
      hotspot_key: String, start_timestamp: Timestamp, end_timestamp: Timestamp,
      unique_connections: Long, sent_timestamp: Timestamp,
      received_timestamp: Timestamp, verified_timestamp: Timestamp, status: String,
      file_source: String)

  // enabled_carriers_info.rs (T9: repeated enums → arrays)
  case class EnabledCarriersInfo(
      hotspot_key: String, enabled_carriers: Seq[String], sampled_carriers: Seq[String],
      firmware_version: String, timestamp_ms: Timestamp, file_source: String)

  // usage.rs / usage_v2.rs (T9: repeated messages → typed arrays)
  case class CarrierTransfer(carrier_id: String, transfer_bytes: Long, user_count: Long)
  case class RadioUsageStats(
      hotspot_key: String, start_period: Timestamp, end_period: Timestamp,
      service_provider_user_count: Long, disco_mapping_user_count: Long,
      offload_user_count: Long, service_provider_transfer_bytes: Long,
      offload_transfer_bytes: Long, timestamp: Timestamp,
      received_timestamp: Timestamp, carrier_transfer: Seq[CarrierTransfer],
      file_source: String)
  case class CarrierTransferV2(carrier_id: String, user_count: Long,
                               rewarded_bytes_transferred: Long,
                               unrewarded_bytes_transferred: Long)
  case class SamplingCarrierTransfer(carrier_id: String, user_count: Long,
                                     bytes_transferred: Long)
  case class RadioUsageStatsV2(
      hotspot_key: String, start_period: Timestamp, end_period: Timestamp,
      timestamp: Timestamp, received_timestamp: Timestamp, carrier_pubkey: String,
      user_count_total: Long, rewarded_bytes_transferred_total: Long,
      unrewarded_bytes_transferred_total: Long, sampling_user_count_total: Long,
      sampling_bytes_transferred_total: Long,
      carrier_transfer_info: Seq[CarrierTransferV2],
      sampling_carrier_transfer_info: Seq[SamplingCarrierTransfer],
      file_source: String)

  // mobile_rewards.rs manifest (written_files → array)
  case class MobileRewardManifest(
      start_period: Timestamp, end_period: Timestamp, epoch: Long, price: Long,
      written_files: Seq[String], file_source: String)
}
