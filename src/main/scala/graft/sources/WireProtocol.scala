package graft.sources

/** DOCUMENTED REFUSAL — the native drillbit RPC wire protocol.
  *
  * The reference serves its own binary client protocol (reference
  * protocol/src/main/protobuf/User.proto + GeneralRPC.proto — the
  * DrillClient handshake, RunQuery, and record-batch framing — carried
  * by the custom netty RPC layer in exec/rpc/.../BasicServer.java,
  * AbstractHandshakeHandler.java): ~115 kLoC of generated protobuf plus
  * hand-built framing that native DrillClient/ODBC drivers speak.
  *
  * graft REFUSES to serve a wire-compatible drillbit endpoint, for the
  * same reason it refuses Kerberos ([[JdbcEndpoint.start]]'s auth
  * refusal): byte-level protocol compatibility can only be validated
  * against a live native client, and none exists zero-egress — an
  * implementation of the handshake, the protobuf framing, and the
  * value-vector record-batch encoding that was never seen
  * interoperating would fail at every real client's first connect,
  * while LOOKING complete in a self-talking test (a client and server
  * that share one codebase prove nothing about wire compatibility).
  *
  * The CLIENT role the wire protocol serves is already covered by the
  * two standard doors every BI tool speaks: the JDBC endpoint (stock
  * hive-jdbc over thrift — [[JdbcEndpoint]], gated end-to-end by
  * q_jdbc_door) and the REST door ([[QueryServer]], streamed results,
  * gated by q_rest_query/q_graft_peer). A deployment that needs the
  * native drill wire format keeps a thin drillbit in front as a proxy,
  * exactly like the Kerberos posture keeps a fronting terminator.
  *
  * An explicit request refuses LOUDLY — never a silent no-op listener.
  */
object WireProtocol {

  /** Always refuses; the message names the constraint and both shipped
    * alternatives. */
  def serve(port: Int = 31010): Nothing =
    throw new UnsupportedOperationException(
      s"drillbit wire protocol (port $port) refuses: byte-level " +
        "compatibility with native DrillClient/ODBC framing " +
        "(protocol/User.proto + exec/rpc netty framing) cannot be " +
        "validated zero-egress — no live native client exists to " +
        "interoperate with, and a self-talking implementation proves " +
        "nothing about the wire. Use the JDBC door " +
        "(JdbcEndpoint.start — stock hive-jdbc) or the REST door " +
        "(QueryServer.start — streamed JSON results), or front a thin " +
        "drillbit proxy for native-client deployments.")
}
