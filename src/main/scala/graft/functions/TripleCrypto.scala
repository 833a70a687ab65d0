package graft.functions

import java.math.BigInteger
import java.security.interfaces.{ECPrivateKey, ECPublicKey}
import java.security.spec.{ECGenParameterSpec, PKCS8EncodedKeySpec, X509EncodedKeySpec}
import java.security.{KeyFactory, KeyPairGenerator, Signature}

/** ECDSA-P256 triple signing, re-expressed over `java.security`
  * (reference: crypto/crypto.go — key gen :20-40, sign :62-80, author id
  * :83-91; fingerprint crypto/fingerprint.go:10-17).
  *
  * Signature format matches the reference: raw `r ‖ s`, each 32 bytes
  * big-endian (crypto/crypto.go:73-79), hex-encoded in the `sig` column.
  * JVM `Signature("SHA1withECDSA")` produces DER, so we sign the SHA-1
  * fingerprint with `NONEwithECDSA` and convert DER → raw r‖s.
  *
  * Signatures are nondeterministic (random ECDSA nonce) — tests must
  * strip `sig`/`author`/`created` before comparing, exactly as the
  * reference does (core/query_test.go:65-72).
  */
object TripleCrypto {

  final case class KeyPair(priv: Array[Byte], pub: Array[Byte]) extends Serializable {
    def privateKey: ECPrivateKey =
      KeyFactory.getInstance("EC")
        .generatePrivate(new PKCS8EncodedKeySpec(priv)).asInstanceOf[ECPrivateKey]
    def publicKey: ECPublicKey =
      KeyFactory.getInstance("EC")
        .generatePublic(new X509EncodedKeySpec(pub)).asInstanceOf[ECPublicKey]

    /** `degdb:author_<murmur3_64(encoded pubkey)>` (reference:
      * crypto/crypto.go:83-91; unsigned decimal rendering).
      */
    def authorId: String =
      "degdb:author_" + java.lang.Long.toUnsignedString(Murmur3x64.hash64(pub))
  }

  def generateKeyPair(): KeyPair = {
    val gen = KeyPairGenerator.getInstance("EC")
    gen.initialize(new ECGenParameterSpec("secp256r1"))
    val kp = gen.generateKeyPair()
    KeyPair(kp.getPrivate.getEncoded, kp.getPublic.getEncoded)
  }

  /** Sign a SHA-1 fingerprint; returns raw r‖s (64 bytes). */
  def sign(fingerprint: Array[Byte], key: KeyPair): Array[Byte] = {
    val s = Signature.getInstance("NONEwithECDSA")
    s.initSign(key.privateKey)
    s.update(fingerprint)
    derToRaw(s.sign())
  }

  /** Verify raw r‖s over a SHA-1 fingerprint. */
  def verify(fingerprint: Array[Byte], rawSig: Array[Byte], key: KeyPair): Boolean = {
    val s = Signature.getInstance("NONEwithECDSA")
    s.initVerify(key.publicKey)
    s.update(fingerprint)
    s.verify(rawToDer(rawSig))
  }

  def signHex(subj: String, pred: String, obj: String, lang: String, key: KeyPair): String =
    toHex(sign(GraftFunctions.fingerprintScala(subj, pred, obj, lang), key))

  def toHex(b: Array[Byte]): String = b.map("%02x".format(_)).mkString

  // --- DER <-> raw r‖s (32+32 bytes) ---
  private def derToRaw(der: Array[Byte]): Array[Byte] = {
    // SEQUENCE { INTEGER r, INTEGER s }
    var i = 2 // skip SEQUENCE tag+len (len < 128 always for P-256)
    if ((der(1) & 0x80) != 0) i += (der(1) & 0x7f)
    require(der(i) == 0x02, "bad DER signature")
    val rLen = der(i + 1) & 0xff
    val r = der.slice(i + 2, i + 2 + rLen)
    i = i + 2 + rLen
    require(der(i) == 0x02, "bad DER signature")
    val sLen = der(i + 1) & 0xff
    val s = der.slice(i + 2, i + 2 + sLen)
    pad32(r) ++ pad32(s)
  }

  private def rawToDer(raw: Array[Byte]): Array[Byte] = {
    require(raw.length == 64, "raw sig must be 64 bytes")
    def int(b: Array[Byte]): Array[Byte] = {
      val v = new BigInteger(1, b).toByteArray
      Array[Byte](0x02, v.length.toByte) ++ v
    }
    val body = int(raw.slice(0, 32)) ++ int(raw.slice(32, 64))
    if (body.length < 128) Array[Byte](0x30, body.length.toByte) ++ body
    else Array[Byte](0x30, 0x81.toByte, body.length.toByte) ++ body
  }

  private def pad32(b: Array[Byte]): Array[Byte] = {
    val t = b.dropWhile(_ == 0)
    require(t.length <= 32, "integer too large")
    Array.fill[Byte](32 - t.length)(0) ++ t
  }
}
