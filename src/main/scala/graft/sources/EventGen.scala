package graft.sources

import scala.util.Random

import graft.model.NetworkEvent

/** Deterministic synthetic network-event generator with the reference
  * producers' event shape: background traffic (packets in [100,500]) plus
  * fragmentation-attack bursts (packets=1, bytes in [8,64], one attacker ->
  * one target, followed by resumed normal traffic).
  * Reference: normal-events-producer/normal_events_producer.py:75-94,
  * code/lambdas/fragmentation_attack/lambda_handler.py:88-113.
  */
object EventGen {

  val protocols = Seq("UDP", "TCP", "ICMP")
  val ports = Seq("53", "80", "443", "8080", "1433")
  val eventTypes = Seq("GET", "POST", "DELETE", "PATCH", "PUT")

  val sqliPayloads = Seq(
    "AND (SELECT 4242 FROM(SELECT COUNT(*),CONCAT(0x7171787671,(SELECT (ELT(4242=4242,1))),0x71707a7871,FLOOR(RAND(0)*2))x FROM INFORMATION_SCHEMA.CHARACTER_SETS GROUP BY x)a)",
    "(SELECT CONCAT(0x7171787671, (SELECT (ELT(1399=1399,1))),0x71707a7871))",
    "UNION ALL SELECT CONCAT(0x7171787671,0x537653544175467a724f,0x71707a7871),NULL,NULL--")

  def normalEvent(rng: Random, tMs: Long): NetworkEvent = {
    val src = s"10.${rng.nextInt(256)}.${rng.nextInt(256)}.${rng.nextInt(254) + 1}"
    val dst = s"10.34.${rng.nextInt(256)}.${rng.nextInt(254) + 1}"
    NetworkEvent(
      event_type = eventTypes(rng.nextInt(eventTypes.size)),
      ip_src = src, ip_dst = dst,
      port_src = ports(rng.nextInt(ports.size)),
      port_dst = ports(rng.nextInt(ports.size)),
      ip_proto = protocols(rng.nextInt(protocols.size)),
      timestamp_start = tMs - 10, timestamp_end = tMs,
      packets = 100 + rng.nextInt(401),
      bytes = 64 + rng.nextInt(1437),
      writer_id = f"ENI-${rng.nextInt(1 << 24)}%06x-x${rng.nextInt(5) + 1}",
      text = s"Normal traffic from $src to $dst")
  }

  def fragmentEvent(rng: Random, tMs: Long, attacker: String, target: String,
      fragId: Int, fragNum: Int): NetworkEvent = {
    val flags = if (fragNum < 29) "MF" else "DF"
    val payload = sqliPayloads(rng.nextInt(sqliPayloads.size))
    NetworkEvent(
      event_type = eventTypes(rng.nextInt(3)),
      ip_src = attacker, ip_dst = target,
      port_src = ports(rng.nextInt(3)),
      port_dst = Seq("8080", "1433")(rng.nextInt(2)),
      ip_proto = "UDP",
      timestamp_start = tMs - 10, timestamp_end = tMs,
      packets = 1,
      bytes = 8 + rng.nextInt(57),
      writer_id = f"ENI${rng.nextInt(1 << 24)}%06x-x${rng.nextInt(5) + 1}",
      text = s"IP $attacker > $target: frag $fragId:${fragNum * 8}@ $flags proto UDP: $payload")
  }

  /** `n` background events at ~10/s from `startMs`, with an attack burst of
    * `burstLen` fragments (then one normal event to the same target, which
    * is what closes the CEP pattern) injected every `attackEvery` events.
    */
  def stream(seed: Long, n: Int, startMs: Long = 1700000000000L,
      burstLen: Int = 15, attackEvery: Int = 200): Seq[NetworkEvent] = {
    val rng = new Random(seed)
    val out = Seq.newBuilder[NetworkEvent]
    var t = startMs
    var i = 0
    var attackNo = 0
    while (i < n) {
      out += normalEvent(rng, t)
      t += 100
      i += 1
      if (attackEvery > 0 && i % attackEvery == 0) {
        attackNo += 1
        val attacker = s"192.168.1.${rng.nextInt(254) + 1}"
        val target = s"10.34.0.${rng.nextInt(254) + 1}"
        val fragId = 1000 + rng.nextInt(9000)
        for (f <- 0 until burstLen) {
          out += fragmentEvent(rng, t, attacker, target, fragId, f)
          t += 50
        }
        // resumed normal traffic to the same target closes the pattern
        out += normalEvent(rng, t).copy(ip_dst = target)
        t += 100
      }
    }
    out.result()
  }

  /** Pure function id -> event for unbounded sources (rate source, soak
    * tests): each block of 200 ids carries one fragmentation burst
    * (ids 180-194 of the block) closed by resumed traffic (id 195).
    */
  def fromId(id: Long, baseMs: Long = 1700000000000L): NetworkEvent = {
    val block = id / 200
    val pos = id % 200
    val t = baseMs + id * 10
    val target = s"10.34.${(block % 200).toInt}.${(block % 250 + 1).toInt}"
    val h = (id * 2654435761L) % 4294967296L
    if (pos >= 180 && pos < 195) {
      val attacker = s"192.168.1.${(block % 254 + 1).toInt}"
      NetworkEvent("GET", attacker, target, "53", "8080", "UDP",
        t - 10, t, 1, (8 + h % 57).toInt, f"ENI-$block%06x", 
        s"IP $attacker > $target: frag $block:${(pos - 180) * 8}@ MF proto UDP")
    } else {
      val dst = if (pos == 195) target
        else s"10.${(h % 256).toInt}.${(h / 256 % 256).toInt}.${(h / 65536 % 254 + 1).toInt}"
      NetworkEvent(eventTypes((h % 5).toInt), s"10.0.0.${(h % 254 + 1).toInt}", dst,
        ports((h % 5).toInt), ports((h / 5 % 5).toInt), protocols((h % 3).toInt),
        t - 10, t, (100 + h % 401).toInt, (64 + h % 1437).toInt,
        f"ENI-$id%08x", "normal traffic")
    }
  }
}
