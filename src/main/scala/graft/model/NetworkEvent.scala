package graft.model

/** Network-flow event, mirroring the reference's JSON wire schema
  * (reference: flink-app/.../process/model/Event.java:33-62 and
  * normal-events-producer/normal_events_producer.py:78-91).
  * Timestamps are epoch millis, as on the reference wire.
  */
case class NetworkEvent(
    event_type: String,
    ip_src: String,
    ip_dst: String,
    port_src: String,
    port_dst: String,
    ip_proto: String,
    timestamp_start: Long,
    timestamp_end: Long,
    packets: Int,
    bytes: Int,
    writer_id: String,
    text: String)

/** Detection output, mirroring the reference's AttackResult
  * (reference: flink-app/.../process/model/AttackResult.java:13-30).
  */
case class AttackResult(
    attack_start_time: Long,
    attack_end_time: Long,
    attacker_id: String,
    target_ip: String,
    fragment_count: Long,
    avg_packets: Double,
    avg_fragment_size: Double,
    size_reduction_percent: Double)
