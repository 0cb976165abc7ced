package graft.kafka

import java.io.FileInputStream
import java.net.Socket
import java.security.KeyStore

import javax.net.ssl.{KeyManagerFactory, SSLContext, SSLSocket, TrustManagerFactory}

/** TLS material + context plumbing for the Kafka wire stack
  * (`security.protocol=SSL` / `SASL_SSL`, the configuration every
  * production secured cluster actually requires — SASL/PLAIN sends the
  * password in clear, so no real listener offers it over plaintext
  * TCP).
  *
  * Key material is a self-signed PKCS12 pair generated ONCE per build
  * dir by the JDK's own `keytool` (zero-egress: no CA, no network) with
  * `SAN=IP:127.0.0.1,DNS:localhost` so HTTPS-style endpoint
  * identification — the stock client's default
  * `ssl.endpoint.identification.algorithm=https` — verifies the dial
  * address against the certificate. A real deployment replaces
  * [[ensureKeyMaterial]] with its provisioned keystore/truststore
  * files; everything downstream ([[serverContext]], the client wrap in
  * [[KafkaWireClient]]) consumes plain paths + passwords exactly like
  * the stock `ssl.keystore.location` / `ssl.truststore.location`
  * options, and the truststore path in [[ClientTls]] serializes into
  * task binaries the same way the SASL credentials do (a deployment
  * secret distributed to executors, not a wire secret).
  */
object Tls {

  /** Client-side TLS parameters, carried in connector conf and task
    * binaries: the truststore proves the broker, `verifyHostname`
    * mirrors `ssl.endpoint.identification.algorithm` (https ⇒ on, the
    * stock default; empty ⇒ off).
    */
  final case class ClientTls(truststore: String, password: String,
      verifyHostname: Boolean = true)

  private val lock = new Object
  private val DName = "CN=graft-kafka-stub"
  private val Pass = "graft-tls" // test material, not a secret

  /** Generate (once, idempotent, process-safe via create-if-absent
    * marker ordering: the files are only visible complete because
    * keytool writes them atomically enough for a same-box test run and
    * generation is serialized under [[lock]]) a self-signed server
    * keystore and the matching single-cert truststore under `dir`.
    * Returns (keystorePath, truststorePath, password).
    */
  def ensureKeyMaterial(dir: String = "target/tls",
      san: String = "SAN=IP:127.0.0.1,DNS:localhost"): (String, String, String) =
    lock.synchronized {
      val d = new java.io.File(dir)
      d.mkdirs()
      val ks = new java.io.File(d, "server.p12").getAbsolutePath
      val ts = new java.io.File(d, "truststore.p12").getAbsolutePath
      if (!new java.io.File(ks).exists() || !new java.io.File(ts).exists()) {
        val keytool = new java.io.File(
          new java.io.File(System.getProperty("java.home"), "bin"),
          "keytool").getAbsolutePath
        val cert = new java.io.File(d, "cert.der").getAbsolutePath
        def run(args: String*): Unit = {
          val p = new ProcessBuilder((keytool +: args): _*)
            .redirectErrorStream(true).start()
          val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
          require(p.waitFor() == 0, s"keytool ${args.head} failed: $out")
        }
        run("-genkeypair", "-alias", "graft", "-keyalg", "RSA",
          "-keysize", "2048", "-validity", "3650",
          "-storetype", "PKCS12", "-keystore", ks, "-storepass", Pass,
          "-dname", DName, "-ext", san)
        run("-exportcert", "-alias", "graft", "-keystore", ks,
          "-storepass", Pass, "-file", cert)
        run("-importcert", "-alias", "graft", "-file", cert,
          "-keystore", ts, "-storetype", "PKCS12", "-storepass", Pass,
          "-noprompt")
      }
      (ks, ts, Pass)
    }

  private def loadStore(path: String, password: String): KeyStore = {
    val store = KeyStore.getInstance("PKCS12")
    val in = new FileInputStream(path)
    try store.load(in, password.toCharArray) finally in.close()
    store
  }

  /** Server context over a PKCS12 keystore holding the listener's key
    * + certificate.
    */
  def serverContext(keystore: String, password: String): SSLContext = {
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(loadStore(keystore, password), password.toCharArray)
    val ctx = SSLContext.getInstance("TLSv1.3")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx
  }

  /** Client context trusting exactly the truststore's certificates. */
  def clientContext(cfg: ClientTls): SSLContext = {
    val tmf = TrustManagerFactory.getInstance(
      TrustManagerFactory.getDefaultAlgorithm)
    tmf.init(loadStore(cfg.truststore, cfg.password))
    val ctx = SSLContext.getInstance("TLSv1.3")
    ctx.init(null, tmf.getTrustManagers, null)
    ctx
  }

  /** Layer TLS over an already-connected plain socket and run the
    * handshake eagerly — a bad certificate (or a plaintext listener)
    * fails HERE, in the constructor path, not on the first request.
    * Endpoint identification, when on, is the JSSE HTTPS rule: the dial
    * host must match the certificate's SAN (IP entry for an address
    * dial, DNS entry for a name dial).
    */
  def wrap(plain: Socket, host: String, port: Int, cfg: ClientTls): SSLSocket = {
    val s = clientContext(cfg).getSocketFactory
      .createSocket(plain, host, port, true).asInstanceOf[SSLSocket]
    if (cfg.verifyHostname) {
      val p = s.getSSLParameters
      p.setEndpointIdentificationAlgorithm("HTTPS")
      s.setSSLParameters(p)
    }
    s.startHandshake()
    s
  }
}
