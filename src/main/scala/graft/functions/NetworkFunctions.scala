package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** IPv4 / CIDR functions, re-expressed from Drill's network UDF pack
  * (reference contrib/udfs/src/main/java/org/apache/drill/exec/udfs/
  * NetworkFunctions.java — inet_aton/ntoa, in_network, is_private_ip,
  * netmask/broadcast/low/high address, address_count, url codec).
  *
  * Drill evaluates these row-at-a-time over commons-net SubnetUtils;
  * here every function is a pure Column expression over Spark built-ins
  * (split/cast/bitwise/concat), so the whole pack stays inside
  * whole-stage codegen and any SQL oracle can reproduce it exactly.
  *
  * CIDR semantics mirror commons-net SubnetUtils' default (hosts
  * exclude the network and broadcast addresses), which is what Drill
  * ships: low = network+1, high = broadcast-1, count = 2^(32-p) - 2,
  * meaningful for prefixes <= 30.
  */
object NetworkFunctions {

  /** Dotted-quad string -> numeric IPv4; null on anything that is not a
    * structurally valid address. (Pure cast semantics let "256.0.0.1"
    * produce 2^32+1 and "1.2.3.4.5" silently parse its first four
    * octets — inNetwork would then wrap the overflow into someone
    * else's subnet.) */
  def inetAton(ip: Column): Column = {
    val o = split(ip, "\\.")
    when(isValidIpv4(ip),
      o.getItem(0).cast("long") * 16777216L + o.getItem(1).cast("long") * 65536L +
        o.getItem(2).cast("long") * 256L + o.getItem(3).cast("long"))
  }

  /** Numeric IPv4 -> dotted-quad string. */
  def inetNtoa(n: Column): Column =
    concat_ws(".",
      shiftright(n, 24).bitwiseAND(255).cast("string"),
      shiftright(n, 16).bitwiseAND(255).cast("string"),
      shiftright(n, 8).bitwiseAND(255).cast("string"),
      n.bitwiseAND(255).cast("string"))

  /** Structural IPv4 validity: four octets, each 0-255, no leading junk. */
  def isValidIpv4(ip: Column): Column = {
    val octet = "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
    ip.rlike(s"^$octet\\.$octet\\.$octet\\.$octet$$")
  }

  /** Structural IPv6 validity (Drill's is_valid_ipv6, ref contrib/udfs
    * NetworkFunctions.java via commons-validator): full 8-group form, or
    * one `::` compression with at most 7 explicit groups ("::" alone is
    * the unspecified address and valid). Zone ids / embedded IPv4 tails
    * are not accepted (matching the strict hex-groups grammar). */
  def isValidIpv6(ip: Column): Column = {
    val h = "[0-9a-fA-F]{1,4}"
    val full = s"^($h:){7}$h$$"
    val compressed = s"^(($h:)*$h)?::(($h:)*$h)?$$"
    val groupCount = size(filter(split(ip, ":"), x => x =!= ""))
    ip.rlike(full) || (ip.rlike(compressed) && groupCount <= 7)
  }

  /** Drill's is_valid_ip: IPv4 or IPv6. */
  def isValidIp(ip: Column): Column = isValidIpv4(ip) || isValidIpv6(ip)

  /** RFC 1918 private-range test (10/8, 172.16/12, 192.168/16), false for
    * anything that is not a valid IPv4 string — Drill's is_private_ip. */
  def isPrivateIp(ip: Column): Column = {
    val a = split(ip, "\\.").getItem(0).cast("int")
    val b = split(ip, "\\.").getItem(1).cast("int")
    when(!isValidIpv4(ip), lit(false))
      .otherwise(a === 10 || (a === 172 && b >= 16 && b <= 31) || (a === 192 && b === 168))
  }

  private def cidrBase(cidr: Column): Column = inetAton(split(cidr, "/").getItem(0))

  /** Prefix length after "/": guarded — an unguarded cast('int') under
    * Spark's ANSI default throws on one malformed CIDR row and kills
    * the whole query; Drill's posture is null-per-row. */
  private def cidrPrefix(cidr: Column): Column = {
    // get(): a CIDR with no "/" has one array element, and ANSI getItem
    // throws INVALID_ARRAY_INDEX instead of yielding null
    val p = get(split(cidr, "/"), lit(1))
    when(p.rlike("^\\d{1,2}$") && p.cast("int") <= 32, p.cast("int"))
      .otherwise(lit(null).cast("int"))
  }

  /** Numeric netmask of a CIDR block: high `prefix` bits set. */
  def netmaskNum(cidr: Column): Column = {
    val p = cidrPrefix(cidr)
    // 0xFFFFFFFF << (32-p), kept in 32-bit range; p=0 => mask 0
    // (call_function: the shiftleft Column helper only takes literal
    // shift amounts, the SQL expression takes a column)
    when(p === 0, lit(0L))
      .otherwise(call_function("shiftleft", lit(0xFFFFFFFFL), lit(32) - p)
        .bitwiseAND(lit(0xFFFFFFFFL)))
  }

  /** Membership of an IPv4 address in a CIDR block — HOST range only,
    * matching the reference: Drill's in_network calls commons-net
    * SubnetUtils.getInfo().isInRange() with the default
    * inclusiveHostCount=false, which EXCLUDES the network and broadcast
    * addresses (and admits nothing for /31 and /32). The old
    * mask-equality test included the boundaries and diverged on them. */
  def inNetwork(ip: Column, cidr: Column): Column = {
    val n = inetAton(ip)
    n >= networkAddressNum(cidr) + 1 && n <= broadcastAddressNum(cidr) - 1
  }

  def netmask(cidr: Column): Column = inetNtoa(netmaskNum(cidr))

  /** Network (all-zero host bits) and broadcast (all-one host bits). */
  def networkAddressNum(cidr: Column): Column =
    cidrBase(cidr).bitwiseAND(netmaskNum(cidr))

  def broadcastAddressNum(cidr: Column): Column =
    networkAddressNum(cidr)
      .bitwiseOR(netmaskNum(cidr).bitwiseXOR(lit(0xFFFFFFFFL)))

  def broadcastAddress(cidr: Column): Column = inetNtoa(broadcastAddressNum(cidr))

  /** First / last usable host address (network+1 / broadcast-1). */
  // /31 and /32 have NO usable hosts: SubnetUtils (Drill's engine,
  // host-exclusive default) returns "0.0.0.0" for both ends — the
  // unguarded network+1 / broadcast-1 emitted two plausible-looking
  // addresses OUTSIDE the block with high below low
  def lowAddress(cidr: Column): Column =
    when(cidrPrefix(cidr) >= 31, lit("0.0.0.0"))
      .otherwise(inetNtoa(networkAddressNum(cidr) + 1))
  def highAddress(cidr: Column): Column =
    when(cidrPrefix(cidr) >= 31, lit("0.0.0.0"))
      .otherwise(inetNtoa(broadcastAddressNum(cidr) - 1))

  /** Usable host count, 2^(32-prefix) - 2 (0 for /31 and /32, like
    * SubnetUtils' host-exclusive default). */
  def addressCount(cidr: Column): Column = {
    val p = cidrPrefix(cidr)
    // when(isNotNull): greatest() SKIPS null args, so a malformed/NULL
    // cidr used to report 0 usable hosts instead of the file-wide
    // null-per-row contract every sibling honors
    when(p.isNotNull,
      greatest(call_function("shiftleft", lit(1L), lit(32) - p) - 2, lit(0L)))
  }

  /** URL percent-codec — Spark built-ins (Drill wraps java.net.URLEncoder;
    * Spark's url_encode/url_decode are the same codec). */
  def urlEncode(s: Column): Column = call_function("url_encode", s)
  def urlDecode(s: Column): Column = call_function("url_decode", s)
}
