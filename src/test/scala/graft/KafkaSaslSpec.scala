package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.kafka.{KafkaClusterClient, KafkaStubBroker, KafkaStubCluster, KafkaWireClient}
import graft.kafka.KafkaWireClient.SaslPlain

/** SASL/PLAIN on the wire pair: the SaslHandshake v1 → SaslAuthenticate
  * v0 session setup (RFC 4616 token), the broker-side listener state
  * machine (ApiVersions allowed pre-auth, everything else disconnected;
  * bad credentials answered with SASL_AUTHENTICATION_FAILED then
  * closed), the stock connector's `kafka.sasl.jaas.config` parsing, and
  * the DSv2 connector authenticating every socket it opens — driver
  * metadata polls and executor readers/writers alike.
  */
class KafkaSaslSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val users = Map("alice" -> "wonder", "bob" -> "builder")

  private def b(s: String): Array[Byte] = s.getBytes(StandardCharsets.UTF_8)
  private def str(a: Array[Byte]): String = new String(a, StandardCharsets.UTF_8)

  private def withBroker[A](f: KafkaStubBroker => A): A = {
    val broker = new KafkaStubBroker(3, saslUsers = users)
    broker.start()
    try f(broker) finally broker.stop()
  }

  test("authenticated session: full produce/fetch round trip") {
    withBroker { broker =>
      val c = new KafkaWireClient("127.0.0.1", broker.port,
        sasl = Some(SaslPlain("alice", "wonder")))
      try {
        c.metadata(Seq("sasl-t"))
        c.produce("sasl-t", 0, Seq((1L, b("k"), b("v1")), (2L, b("k"), b("v2"))))
        val got = c.fetchAll("sasl-t", 0)
        assert(got.map(r => str(r.value)) == Seq("v1", "v2"))
      } finally c.close()
    }
  }

  test("wrong password: SASL_AUTHENTICATION_FAILED, connection closed") {
    withBroker { broker =>
      val e = intercept[SecurityException] {
        new KafkaWireClient("127.0.0.1", broker.port,
          sasl = Some(SaslPlain("alice", "nope")))
      }
      assert(e.getMessage.contains("error 58"))
      assert(e.getMessage.contains("alice"))
    }
  }

  test("unknown user: rejected like a wrong password (no user oracle)") {
    withBroker { broker =>
      val e = intercept[SecurityException] {
        new KafkaWireClient("127.0.0.1", broker.port,
          sasl = Some(SaslPlain("mallory", "wonder")))
      }
      assert(e.getMessage.contains("error 58"))
    }
  }

  test("unauthenticated data request on a SASL listener: disconnected") {
    withBroker { broker =>
      val c = new KafkaWireClient("127.0.0.1", broker.port) // no creds
      try {
        // ApiVersions is the one API a real broker answers pre-auth
        val versions = c.apiVersions()
        assert(versions.contains(graft.kafka.KafkaCodec.Api.SaslHandshake))
        intercept[java.io.IOException](c.metadata(Seq("t")))
      } finally c.close()
    }
  }

  test("SASL handshake against a non-SASL listener: UNSUPPORTED_SASL_MECHANISM") {
    val plain = new KafkaStubBroker(3) // no saslUsers
    plain.start()
    try {
      val e = intercept[IllegalArgumentException] {
        new KafkaWireClient("127.0.0.1", plain.port,
          sasl = Some(SaslPlain("alice", "wonder")))
      }
      assert(e.getMessage.contains("SaslHandshake error 33"))
    } finally plain.stop()
  }

  test("jaas config parsing round-trips arbitrary credentials (seeded property)") {
    val rnd = new scala.util.Random(20260814L)
    def render(v: String): String =
      "\"" + v.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c => c.toString
      } + "\""
    val alphabet = """abcXYZ019 _-./\"'!@#$%^&*()[]{}=+;:,<>?|"""
    (1 to 200).foreach { _ =>
      val user = (0 until 1 + rnd.nextInt(12))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val pass = (0 until 1 + rnd.nextInt(20))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val jaas = "org.apache.kafka.common.security.plain.PlainLoginModule " +
        s"required username=${render(user)} password=${render(pass)};"
      assert(SaslPlain.fromJaas(jaas) == SaslPlain(user, pass),
        s"round-trip failed for user=$user pass=$pass jaas=$jaas")
    }
  }

  test("jaas config parsing: stock PlainLoginModule string, with escapes") {
    val jaas = """org.apache.kafka.common.security.plain.PlainLoginModule """ +
      """required username="alice" password="w\"on\\der";"""
    assert(SaslPlain.fromJaas(jaas) == SaslPlain("alice", """w"on\der"""))
    intercept[IllegalArgumentException](SaslPlain.fromJaas("required;"))
  }

  test("DSv2 round trip: every connector socket authenticates") {
    withBroker { broker =>
      val jaas = "org.apache.kafka.common.security.plain.PlainLoginModule " +
        "required username=\"bob\" password=\"builder\";"
      import spark.implicits._
      val df = Seq(("k1", "a"), ("k2", "b"), ("k3", "c"))
        .toDF("key", "value")
      df.write.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .option("topic", "sasl-dsv2")
        .option("kafka.sasl.mechanism", "PLAIN")
        .option("kafka.sasl.jaas.config", jaas)
        .mode("append").save()
      val got = spark.read.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .option("topic", "sasl-dsv2")
        .option("kafka.sasl.mechanism", "PLAIN")
        .option("kafka.sasl.jaas.config", jaas)
        .load()
        .select(col("value").cast("string"))
        .as[String].collect().sorted
      assert(got.toSeq == Seq("a", "b", "c"))
    }
  }

  test("DSv2 without credentials against a SASL listener fails loudly") {
    withBroker { broker =>
      import spark.implicits._
      val e = intercept[Exception] {
        Seq(("k", "v")).toDF("key", "value")
          .write.format("kafka-wire")
          .option("host", "127.0.0.1").option("port", broker.port.toString)
          .option("topic", "sasl-noauth")
          .mode("append").save()
      }
      // the first driver-side metadata call dies on the closed socket
      assert(Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
        .exists(_.isInstanceOf[java.io.IOException]))
    }
  }

  test("mechanism/jaas option validation in the provider") {
    import spark.implicits._
    val df = Seq(("k", "v")).toDF("key", "value")
    val e1 = intercept[IllegalArgumentException] {
      df.write.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", "1")
        .option("topic", "t").option("kafka.sasl.mechanism", "GSSAPI")
        .option("kafka.sasl.jaas.config", "x username=\"u\" password=\"p\";")
        .mode("append").save()
    }
    assert(e1.getMessage.contains("unsupported sasl.mechanism"))
    val e2 = intercept[IllegalArgumentException] {
      df.write.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", "1")
        .option("topic", "t").option("kafka.sasl.mechanism", "PLAIN")
        .mode("append").save()
    }
    assert(e2.getMessage.contains("requires sasl.jaas.config"))
  }

  // ---- SCRAM-SHA-256 (RFC 5802 / RFC 7677) ----

  test("SCRAM-SHA-256 reproduces the RFC 7677 §3 test vector exactly") {
    import graft.kafka.Scram
    val salt = java.util.Base64.getDecoder.decode("W22ZaJ0SNY7soEsUEjb6gQ==")
    val cred = Scram.serverCredential("pencil", salt, 4096)
    val client = new Scram.Client("user", "pencil",
      cnonce = "rOprNGfwEbeRWgbNEkqO")
    val server = new Scram.Server(
      u => if (u == "user") Some(cred) else None,
      snonce = "%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0")
    assert(client.firstMessage == "n,,n=user,r=rOprNGfwEbeRWgbNEkqO")
    val Scram.Continue(serverFirst) = server.handle(client.firstMessage): @unchecked
    assert(serverFirst ==
      "r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0," +
        "s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096")
    val (clientFinal, expectedSig) = client.finalMessage(serverFirst)
    assert(clientFinal ==
      "c=biws,r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0," +
        "p=dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ=")
    val Scram.Done(serverFinal, who) = server.handle(clientFinal): @unchecked
    assert(who == "user")
    assert(serverFinal == "v=6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4=")
    assert(client.verifyServerFinal(serverFinal, expectedSig))
  }

  test("SCRAM-SHA-256 wire session: challenge-response rounds, produce/fetch round trip") {
    withBroker { broker =>
      val c = new KafkaWireClient("127.0.0.1", broker.port,
        sasl = Some(SaslPlain("alice", "wonder", mechanism = "SCRAM-SHA-256")))
      try {
        c.metadata(Seq("scram-t"))
        c.produce("scram-t", 0, Seq((1L, b("k"), b("s1"))))
        assert(c.fetchAll("scram-t", 0).map(r => str(r.value)) == Seq("s1"))
      } finally c.close()
    }
  }

  test("SCRAM-SHA-256 wrong password: the proof fails at client-final, connection closed") {
    withBroker { broker =>
      val e = intercept[SecurityException] {
        new KafkaWireClient("127.0.0.1", broker.port,
          sasl = Some(SaslPlain("alice", "nope", mechanism = "SCRAM-SHA-256")))
      }
      assert(e.getMessage.contains("error 58"))
      assert(e.getMessage.contains("alice"))
    }
  }

  test("SCRAM-SHA-256 unknown user fails like a wrong password (no user oracle)") {
    withBroker { broker =>
      val e = intercept[SecurityException] {
        new KafkaWireClient("127.0.0.1", broker.port,
          sasl = Some(SaslPlain("mallory", "wonder", mechanism = "SCRAM-SHA-256")))
      }
      assert(e.getMessage.contains("error 58"))
    }
  }

  test("DSv2 SCRAM-SHA-256 over SASL_SSL: the full secured-config round trip") {
    val broker = new KafkaStubBroker(3, saslUsers = users,
      tlsKeystore = Some((tlsKs, tlsPw)))
    broker.start()
    try {
      val jaas = "org.apache.kafka.common.security.scram.ScramLoginModule " +
        "required username=\"bob\" password=\"builder\";"
      import spark.implicits._
      Seq(("k1", "sc1"), ("k2", "sc2")).toDF("key", "value")
        .write.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .option("topic", "scram-ssl")
        .option("kafka.security.protocol", "SASL_SSL")
        .option("kafka.ssl.truststore.location", tlsTrust)
        .option("kafka.ssl.truststore.password", tlsPw)
        .option("kafka.sasl.mechanism", "SCRAM-SHA-256")
        .option("kafka.sasl.jaas.config", jaas)
        .mode("append").save()
      val got = spark.read.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .option("topic", "scram-ssl")
        .option("kafka.security.protocol", "SASL_SSL")
        .option("kafka.ssl.truststore.location", tlsTrust)
        .option("kafka.ssl.truststore.password", tlsPw)
        .option("kafka.sasl.mechanism", "SCRAM-SHA-256")
        .option("kafka.sasl.jaas.config", jaas)
        .load()
        .select(col("value").cast("string"))
        .as[String].collect().sorted
      assert(got.toSeq == Seq("sc1", "sc2"))
    } finally broker.stop()
  }

  // ---- TLS (security.protocol=SSL / SASL_SSL) ----

  private lazy val (tlsKs, tlsTrust, tlsPw) = graft.kafka.Tls.ensureKeyMaterial()
  private def clientTls = graft.kafka.Tls.ClientTls(tlsTrust, tlsPw)

  private def withTlsBroker[A](f: KafkaStubBroker => A): A = {
    val broker = new KafkaStubBroker(3, saslUsers = users,
      tlsKeystore = Some((tlsKs, tlsPw)))
    broker.start()
    try f(broker) finally broker.stop()
  }

  test("SASL_SSL: TLS handshake with endpoint identification, auth inside the tunnel, round trip") {
    withTlsBroker { broker =>
      val c = new KafkaWireClient("127.0.0.1", broker.port,
        sasl = Some(SaslPlain("alice", "wonder")), tls = Some(clientTls))
      try {
        c.metadata(Seq("tls-t"))
        c.produce("tls-t", 0, Seq((1L, b("k"), b("enc1")), (2L, b("k"), b("enc2"))))
        assert(c.fetchAll("tls-t", 0).map(r => str(r.value)) == Seq("enc1", "enc2"))
      } finally c.close()
    }
  }

  test("plaintext dial to a TLS listener fails loudly") {
    withTlsBroker { broker =>
      // the plain dial connects (TCP is TCP) but the first Kafka frame
      // hits the listener's TLS handshake, which kills the connection —
      // the request must die with an IOException, never hang or
      // silently return garbage
      val c = new KafkaWireClient("127.0.0.1", broker.port)
      try intercept[java.io.IOException](c.metadata(Seq("t")))
      finally c.close()
    }
  }

  test("TLS dial with an untrusting truststore fails the handshake in the constructor") {
    withTlsBroker { broker =>
      // a truststore holding a DIFFERENT self-signed cert: the server's
      // chain can't be validated, and the eager handshake fails before
      // any Kafka bytes (the credentials are never offered)
      val (_, otherTrust, otherPw) = graft.kafka.Tls.ensureKeyMaterial(
        "target/tls-other", san = "SAN=IP:127.0.0.1")
      intercept[javax.net.ssl.SSLException] {
        new KafkaWireClient("127.0.0.1", broker.port,
          sasl = Some(SaslPlain("alice", "wonder")),
          tls = Some(graft.kafka.Tls.ClientTls(otherTrust, otherPw)))
      }
    }
  }

  test("endpoint identification rejects a certificate without the dial address in its SAN") {
    // serve with a cert whose SAN names some other host: hostname
    // verification (the stock https default) must refuse it even
    // though the chain IS trusted; turning verification off (the
    // algorithm-empty escape hatch) accepts it
    val (ks2, trust2, pw2) = graft.kafka.Tls.ensureKeyMaterial(
      "target/tls-wronghost", san = "SAN=DNS:graft-elsewhere")
    val broker = new KafkaStubBroker(3, tlsKeystore = Some((ks2, pw2)))
    broker.start()
    try {
      intercept[javax.net.ssl.SSLException] {
        new KafkaWireClient("127.0.0.1", broker.port,
          tls = Some(graft.kafka.Tls.ClientTls(trust2, pw2)))
      }
      val c = new KafkaWireClient("127.0.0.1", broker.port,
        tls = Some(graft.kafka.Tls.ClientTls(trust2, pw2,
          verifyHostname = false)))
      try c.metadata(Seq("tls-nohost")) finally c.close()
    } finally broker.stop()
  }

  test("DSv2 SASL_SSL round trip: every connector socket TLS-wraps and authenticates") {
    withTlsBroker { broker =>
      val jaas = "org.apache.kafka.common.security.plain.PlainLoginModule " +
        "required username=\"bob\" password=\"builder\";"
      import spark.implicits._
      Seq(("k1", "x"), ("k2", "y")).toDF("key", "value")
        .write.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .option("topic", "tls-dsv2")
        .option("kafka.security.protocol", "SASL_SSL")
        .option("kafka.ssl.truststore.location", tlsTrust)
        .option("kafka.ssl.truststore.password", tlsPw)
        .option("kafka.sasl.mechanism", "PLAIN")
        .option("kafka.sasl.jaas.config", jaas)
        .mode("append").save()
      val got = spark.read.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", broker.port.toString)
        .option("topic", "tls-dsv2")
        .option("kafka.security.protocol", "SASL_SSL")
        .option("kafka.ssl.truststore.location", tlsTrust)
        .option("kafka.ssl.truststore.password", tlsPw)
        .option("kafka.sasl.mechanism", "PLAIN")
        .option("kafka.sasl.jaas.config", jaas)
        .load()
        .select(col("value").cast("string"))
        .as[String].collect().sorted
      assert(got.toSeq == Seq("x", "y"))
    }
  }

  test("security.protocol option validation") {
    import spark.implicits._
    val df = Seq(("k", "v")).toDF("key", "value")
    val e1 = intercept[IllegalArgumentException] {
      df.write.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", "1")
        .option("topic", "t")
        .option("kafka.security.protocol", "SASL_SSL")
        .option("kafka.sasl.mechanism", "PLAIN")
        .option("kafka.sasl.jaas.config", "x username=\"u\" password=\"p\";")
        .mode("append").save()
    }
    assert(e1.getMessage.contains("requires kafka.ssl.truststore.location"))
    val e2 = intercept[IllegalArgumentException] {
      df.write.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", "1")
        .option("topic", "t")
        .option("kafka.security.protocol", "SSL")
        .option("kafka.sasl.mechanism", "PLAIN")
        .option("kafka.sasl.jaas.config", "x username=\"u\" password=\"p\";")
        .option("kafka.ssl.truststore.location", tlsTrust)
        .option("kafka.ssl.truststore.password", tlsPw)
        .mode("append").save()
    }
    assert(e2.getMessage.contains("SASL options set but security.protocol=SSL"))
    val e3 = intercept[IllegalArgumentException] {
      df.write.format("kafka-wire")
        .option("host", "127.0.0.1").option("port", "1")
        .option("topic", "t")
        .option("kafka.security.protocol", "PLAINTEXT")
        .option("kafka.ssl.truststore.location", tlsTrust)
        .mode("append").save()
    }
    assert(e3.getMessage.contains("ssl.truststore.location set but"))
  }

  test("SASL_SSL multi-broker cluster: TLS + auth on every leader socket") {
    val cluster = new KafkaStubCluster(3, 3, saslUsers = users,
      tlsKeystore = Some((tlsKs, tlsPw)))
    cluster.start()
    try {
      val c = new KafkaClusterClient("127.0.0.1", cluster.bootstrapPort,
        sasl = Some(SaslPlain("alice", "wonder")), tls = Some(clientTls))
      try {
        c.metadata(Seq("tls-cluster"))
        (0 until 3).foreach { p =>
          c.produce("tls-cluster", p, Seq((1L, null, b(s"v$p"))))
        }
        (0 until 3).foreach { p =>
          assert(c.fetchAll("tls-cluster", p).map(r => str(r.value)) == Seq(s"v$p"))
        }
      } finally c.close()
    } finally cluster.stop()
  }

  test("multi-broker cluster: one credential set authenticates every socket") {
    val cluster = new KafkaStubCluster(3, 3, saslUsers = users)
    cluster.start()
    try {
      val c = new KafkaClusterClient("127.0.0.1", cluster.bootstrapPort,
        sasl = Some(SaslPlain("alice", "wonder")))
      try {
        c.metadata(Seq("sasl-cluster"))
        // three partitions led by three different brokers: produce to
        // each forces a fresh authenticated socket per leader
        (0 until 3).foreach { p =>
          c.produce("sasl-cluster", p, Seq((1L, null, b(s"v$p"))))
        }
        (0 until 3).foreach { p =>
          assert(c.fetchAll("sasl-cluster", p).map(r => str(r.value)) == Seq(s"v$p"))
        }
      } finally c.close()
    } finally cluster.stop()
  }
}
