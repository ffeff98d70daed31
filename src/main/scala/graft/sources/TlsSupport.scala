package graft.sources

import java.io.FileOutputStream
import java.security.{KeyPairGenerator, KeyStore, SecureRandom, Signature}
import java.security.cert.{CertificateFactory, X509Certificate}

import javax.net.ssl.{KeyManagerFactory, SSLContext, TrustManagerFactory}

/** Transport security for graft's front doors — the re-expression of
  * Drill's SSL surface (reference exec/java-exec/.../ssl/
  * SSLConfigServer.java and server/rest/ssl/
  * SslContextFactoryConfigurator.java, which build the server's
  * SslContext from keystore options and can SELF-GENERATE a cert when
  * none is configured — `drill.exec.ssl.useHadoopConfig` aside, Drill's
  * web server auto-generates a self-signed certificate exactly like
  * [[generateKeyStore]] here).
  *
  * Everything is plain JDK crypto: an RSA-2048 keypair, a hand-rolled
  * DER-encoded self-signed X.509 v3 certificate (the JDK has no public
  * cert-BUILDING api — sun.security.x509 is encapsulated, and forking
  * `keytool` is the one thing this sandbox punishes), a PKCS12 keystore
  * holding the key entry for servers, and a PKCS12 truststore holding
  * just the certificate for clients. The certificate carries
  * SubjectAlternativeName entries (DNS + IP), so stock clients verify
  * the HOSTNAME against it — tests run with real verification on, never
  * a trust-all override.
  *
  * The DER writer below emits the minimal strict subset the certificate
  * needs (SEQUENCE/SET/INTEGER/OID/UTCTime/BIT STRING/OCTET STRING/
  * IA5String/UTF8String + context tags); the JDK's CertificateFactory
  * re-parses the result, so a malformed encoding fails at generation
  * time, not at first handshake.
  */
object TlsSupport {

  // ---- minimal DER writer ----------------------------------------------

  private def lenBytes(n: Int): Array[Byte] =
    if (n < 0x80) Array(n.toByte)
    else {
      val b = BigInt(n).toByteArray.dropWhile(_ == 0)
      (0x80 | b.length).toByte +: b
    }

  private def tlv(tag: Int, content: Array[Byte]): Array[Byte] =
    tag.toByte +: (lenBytes(content.length) ++ content)

  private def seq(parts: Array[Byte]*): Array[Byte] =
    tlv(0x30, parts.flatten.toArray)
  private def set(parts: Array[Byte]*): Array[Byte] =
    tlv(0x31, parts.flatten.toArray)
  private def derInt(v: BigInt): Array[Byte] = tlv(0x02, v.toByteArray)
  private def derNull: Array[Byte] = Array(0x05.toByte, 0x00.toByte)
  private def octetString(b: Array[Byte]): Array[Byte] = tlv(0x04, b)
  private def utf8(s: String): Array[Byte] = tlv(0x0c, s.getBytes("UTF-8"))
  private def utcTime(s: String): Array[Byte] = tlv(0x17, s.getBytes("US-ASCII"))
  private def bitString(b: Array[Byte]): Array[Byte] =
    tlv(0x03, 0x00.toByte +: b) // zero unused bits

  /** OID dotted string -> DER. */
  private def oid(dotted: String): Array[Byte] = {
    val arcs = dotted.split('.').map(_.toLong)
    val out = scala.collection.mutable.ArrayBuffer[Byte]()
    out += (arcs(0) * 40 + arcs(1)).toByte
    arcs.drop(2).foreach { a =>
      val chunks = scala.collection.mutable.ArrayBuffer[Byte]()
      var v = a
      chunks.prepend((v & 0x7f).toByte)
      v >>= 7
      while (v > 0) { chunks.prepend(((v & 0x7f) | 0x80).toByte); v >>= 7 }
      out ++= chunks
    }
    tlv(0x06, out.toArray)
  }

  private val Sha256Rsa = "1.2.840.113549.1.1.11"
  private val CommonName = "2.5.4.3"
  private val SanOid = "2.5.29.17"

  private def algId: Array[Byte] = seq(oid(Sha256Rsa), derNull)

  /** Name ::= SEQUENCE OF SET OF (OID, value) — one CN RDN. */
  private def dnCn(cn: String): Array[Byte] =
    seq(set(seq(oid(CommonName), utf8(cn))))

  // ---- certificate generation -------------------------------------------

  /** Generate an RSA-2048 keypair + self-signed X.509 v3 certificate
    * (CN=`cn`, SubjectAlternativeName = `dnsNames` + `ipAddrs`,
    * validity [now-1d, now+5y] — UTCTime keeps DER strict below 2050)
    * and write TWO PKCS12 files: `keyStorePath` with the private-key
    * entry (what a server loads) and `trustStorePath` with only the
    * certificate (what a client trusts). Same password for both. */
  def generateKeyStore(keyStorePath: String, trustStorePath: String,
                       password: String, cn: String = "graft",
                       dnsNames: Seq[String] = Seq("localhost"),
                       ipAddrs: Seq[String] = Seq("127.0.0.1"),
                       storeType: String = "PKCS12"): Unit = {
    val kpg = KeyPairGenerator.getInstance("RSA")
    kpg.initialize(2048, new SecureRandom())
    val kp = kpg.generateKeyPair()

    val fmt = new java.text.SimpleDateFormat("yyMMddHHmmss'Z'")
    fmt.setTimeZone(java.util.TimeZone.getTimeZone("UTC"))
    val now = System.currentTimeMillis()
    val notBefore = fmt.format(new java.util.Date(now - 24L * 3600 * 1000))
    val notAfter = fmt.format(new java.util.Date(now + 5L * 365 * 24 * 3600 * 1000))

    // GeneralNames: dNSName [2] IA5String, iPAddress [7] OCTET STRING
    val san = seq(
      (dnsNames.map(d => tlv(0x82, d.getBytes("US-ASCII"))) ++
        ipAddrs.map { ip =>
          val parts = ip.split('.').map(p => p.toInt.toByte)
          require(parts.length == 4, s"IPv4 only in SAN: $ip")
          tlv(0x87, parts)
        }).flatten.toArray)
    val extensions = tlv(0xa3, // [3] EXPLICIT
      seq(seq(oid(SanOid), octetString(san))))

    val serial = BigInt(63, new SecureRandom()).abs + 1
    val tbs = seq(
      tlv(0xa0, derInt(BigInt(2))), // [0] version v3
      derInt(serial),
      algId,
      dnCn(cn),
      seq(utcTime(notBefore), utcTime(notAfter)),
      dnCn(cn),
      kp.getPublic.getEncoded, // X.509 SubjectPublicKeyInfo, already DER
      extensions)

    val signer = Signature.getInstance("SHA256withRSA")
    signer.initSign(kp.getPrivate)
    signer.update(tbs)
    val certDer = seq(tbs, algId, bitString(signer.sign()))

    // self-check: the JDK parser must accept our encoding
    val cert = CertificateFactory.getInstance("X.509")
      .generateCertificate(new java.io.ByteArrayInputStream(certDer))
      .asInstanceOf[X509Certificate]
    cert.verify(kp.getPublic) // and the signature must verify

    // storeType: PKCS12 for graft's own doors; "JKS" for consumers whose
    // TLS plumbing hardcodes the old default (thrift's
    // TSSLTransportParameters, hence hive-jdbc's sslTrustStore)
    val ks = KeyStore.getInstance(storeType)
    ks.load(null, null)
    ks.setKeyEntry("graft", kp.getPrivate, password.toCharArray, Array(cert))
    val kos = new FileOutputStream(keyStorePath)
    try ks.store(kos, password.toCharArray) finally kos.close()

    val ts = KeyStore.getInstance(storeType)
    ts.load(null, null)
    ts.setCertificateEntry("graft", cert)
    val tos = new FileOutputStream(trustStorePath)
    try ts.store(tos, password.toCharArray) finally tos.close()
  }

  private def loadStore(path: String, password: String): KeyStore = {
    // KeyStore.getInstance(file, password) sniffs the TYPE from the
    // file (PKCS12 vs JKS both load)
    KeyStore.getInstance(new java.io.File(path), password.toCharArray)
  }

  /** Server-side SSLContext from a keystore holding a key entry. */
  def serverContext(keyStorePath: String, password: String): SSLContext = {
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(loadStore(keyStorePath, password), password.toCharArray)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, new SecureRandom())
    ctx
  }

  /** Client-side SSLContext trusting exactly the certs in `trustStorePath`
    * — hostname verification stays the platform DEFAULT (the cert's SAN
    * must really match the host; no trust-all shortcuts). */
  def clientContext(trustStorePath: String, password: String): SSLContext = {
    val tmf = TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(loadStore(trustStorePath, password))
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(null, tmf.getTrustManagers, new SecureRandom())
    ctx
  }
}
