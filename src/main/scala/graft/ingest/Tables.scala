package graft.ingest

import java.sql.Timestamp

/** Output-table row types (column names = reference table columns,
  * SURVEY §1.2). Every table carries the injected `file_source` lineage
  * column (K3, huckli-import-derive/src/lib.rs:83-88).
  */
object Tables {

  // checkpoint table (huckli-db/src/lib.rs:16-30)
  case class FileProcessed(file_name: String, prefix: String,
                           file_timestamp: Timestamp, processed_at: Timestamp)

  // verified_speedtest_report (verified_speedtest.rs:13-29)
  case class VerifiedSpeedtestReport(
      hotspot_key: String, serial: String, timestamp: Timestamp,
      upload_speed: Long, download_speed: Long, latency: Int,
      received_timestamp: Timestamp, verified_timestamp: Timestamp,
      result: String, file_source: String)

  // mobile rewards family (mobile_rewards.rs) ---------------------------
  case class GatewayFlat(hotspot_key: String, dc_transfer_reward: Long,
                         rewardable_bytes: Long, price: Long)
  case class SubscriberFlat(subscriber_id: String, discovery_location_amount: Long,
                            verification_mapping_amount: Long,
                            reward_override_entity_key: String)
  case class ServiceProviderFlat(service_provider: String, amount: Long,
                                 rewardable_entity_key: String)
  case class UnallocatedFlat(reward_type: String, amount: Long)
  case class PromotionFlat(entity: String, service_provider_amount: Long,
                           matched_amount: Long)
  case class TrustScoreFlat(meters_to_asserted: Long, trust_score: Double)
  case class RadioSpeedtestFlat(upload: Long, download: Long, latency_ms: Int,
                                timestamp: Timestamp)
  case class CoveredHexFlat(location: Long, base_coverage_points: Double,
                            boosted_coverage_points: Double, urbanized: String,
                            footfall: String, landtype: String,
                            assignment_multiplier: Double, rank: Int,
                            rank_multiplier: Double, boosted_multiplier: Int,
                            service_provider_override: Boolean)
  case class RadioFlat(id: String, hotspot_key: String,
                       base_coverage_points_sum: Double, boosted_coverage_points_sum: Double,
                       base_reward_shares: Double, boosted_reward_shares: Double,
                       base_poc_reward: Long, boosted_poc_reward: Long,
                       seniority_timestamp: Timestamp, coverage_object: String,
                       location_trust_score_multiplier: Double, speedtest_multiplier: Double,
                       sp_boosted_hex_status: String, oracle_boosted_hex_status: String,
                       speedtest_avg_upload: Long, speedtest_avg_download: Long,
                       speedtest_avg_latency_ms: Int, speedtest_avg_timestamp: Timestamp,
                       location_trust_scores: Seq[TrustScoreFlat],
                       speedtests: Seq[RadioSpeedtestFlat],
                       covered_hexes: Seq[CoveredHexFlat])

  /** Decode-once wide row for the 6-way oneof demux (D1): exactly one arm
    * column is non-None; `arm` is the routing tag. Cached, then each target
    * table is a filtered projection — the Spark analog of the reference's
    * per-arm buffering (mobile_rewards.rs:64-105). */
  case class MobileShareFlat(start_period: Timestamp, end_period: Timestamp,
                             arm: String, file_source: String,
                             gateway: Option[GatewayFlat],
                             subscriber: Option[SubscriberFlat],
                             service_provider: Option[ServiceProviderFlat],
                             unallocated: Option[UnallocatedFlat],
                             promotion: Option[PromotionFlat],
                             radio: Option[RadioFlat])

  // iot rewards family (iot_rewards.rs) ---------------------------------
  case class IotGatewayFlat(hotspot_key: String, beacon_amount: Long,
                            witness_amount: Long, dc_transfer_amount: Long)
  case class IotOperationalFlat(amount: Long)
  case class IotUnallocatedFlat(reward_type: String, amount: Long)

  /** 3-way oneof demux row (D2). */
  case class IotShareFlat(start_period: Timestamp, end_period: Timestamp,
                          arm: String, file_source: String,
                          gateway: Option[IotGatewayFlat],
                          operational: Option[IotOperationalFlat],
                          unallocated: Option[IotUnallocatedFlat])

  // coverage family (coverage.rs) ---------------------------------------
  case class CoverageLocationFlat(location: String, signal_level: String,
                                  signal_power: Int)
  case class CoverageObjectFlat(radio_key: String, radio_type: String, uuid: String,
                                coverage_claim_time: Timestamp, indoor: Boolean,
                                file_source: String,
                                locations: Seq[CoverageLocationFlat])
}
