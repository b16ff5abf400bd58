package graft.engine

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.nio.{ByteBuffer, ByteOrder}
import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}
import javax.crypto.{Cipher, Mac, SecretKeyFactory}

/** WinZip AES-256 (AE-2) encrypted zip writer/reader on JDK crypto only —
  * no external library (the reference uses pyzipper's WZ_AES,
  * dbccore.py:797-801; the format is WinZip's published AE-2 spec).
  *
  * Per entry: PBKDF2-HmacSHA1(password, 16-byte salt, 1000 iters) derives
  * 66 bytes = AES-256 key ‖ HMAC-SHA1 key ‖ 2-byte password verifier; data
  * is AES-CTR with a LITTLE-endian counter starting at 1 (the JDK's
  * AES/CTR increments big-endian, so the keystream is produced manually
  * via AES/ECB over counter blocks); the auth code is the first 10 bytes
  * of HMAC-SHA1 over the CIPHERtext. AE-2 zeroes the CRC field. Entries
  * are STORED (the CSVs are transient export artifacts; compression is
  * orthogonal to the encryption contract being mirrored).
  *
  * The container (local headers, method 99, 0x9901 extra field, central
  * directory) is written by hand because java.util.zip cannot emit
  * non-DEFLATE methods. Archives list correctly in standard tools and
  * decrypt under pyzipper/7z; `read` verifies both the password verifier
  * and the auth code before returning plaintext.
  */
object AesZip {

  private val Iterations = 1000
  private val SaltLen = 16 // AES-256
  private val AuthLen = 10

  private def deriveKeys(password: String, salt: Array[Byte])
      : (Array[Byte], Array[Byte], Array[Byte]) = {
    val skf = SecretKeyFactory.getInstance("PBKDF2WithHmacSHA1")
    val dk = skf.generateSecret(
      new PBEKeySpec(password.toCharArray, salt, Iterations, 66 * 8)).getEncoded
    (dk.slice(0, 32), dk.slice(32, 64), dk.slice(64, 66))
  }

  /** AES-CTR with little-endian counter starting at 1 (WinZip spec). */
  private def ctrCrypt(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val aes = Cipher.getInstance("AES/ECB/NoPadding")
    aes.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"))
    val out = new Array[Byte](data.length)
    val counter = new Array[Byte](16)
    var i = 0
    while (i < data.length) {
      var j = 0
      var carry = true
      while (carry && j < 16) {
        counter(j) = (counter(j) + 1).toByte
        carry = counter(j) == 0
        j += 1
      }
      val ks = aes.doFinal(counter)
      var k = 0
      while (k < 16 && i < data.length) {
        out(i) = (data(i) ^ ks(k)).toByte
        i += 1; k += 1
      }
    }
    out
  }

  private def hmac10(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA1")
    mac.init(new SecretKeySpec(key, "HmacSHA1"))
    mac.doFinal(data).take(AuthLen)
  }

  private def le(n: Int, bytes: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(n)
    b.array().take(bytes)
  }

  /** 0x9901 AES extra field: AE-2, vendor "AE", strength 3 (256-bit),
    * actual method 0 (stored). */
  private val AesExtra: Array[Byte] =
    le(0x9901, 2) ++ le(7, 2) ++ le(2, 2) ++ "AE".getBytes ++
      Array(3.toByte) ++ le(0, 2)

  def write(path: String, entries: Seq[(String, Array[Byte])],
      password: String,
      rng: java.util.Random = new java.security.SecureRandom()): Unit = {
    val out = new ByteArrayOutputStream()
    val central = new ByteArrayOutputStream()
    var nDone = 0
    entries.foreach { case (name, data) =>
      val offset = out.size()
      val nameB = name.getBytes(StandardCharsets.UTF_8)
      val salt = new Array[Byte](SaltLen)
      rng.nextBytes(salt)
      val (key, authKey, verifier) = deriveKeys(password, salt)
      val cipherText = ctrCrypt(key, data)
      val auth = hmac10(authKey, cipherText)
      val csize = SaltLen + 2 + cipherText.length + AuthLen
      // shared middle of local + central headers:
      // flags(enc) method(99) time date crc(0,AE-2) csize usize
      val common = le(0x0001, 2) ++ le(99, 2) ++ le(0, 2) ++ le(0x0021, 2) ++
        le(0, 4) ++ le(csize, 4) ++ le(data.length, 4) ++
        le(nameB.length, 2) ++ le(AesExtra.length, 2)
      out.write(le(0x04034B50, 4) ++ le(51, 2) ++ common ++ nameB ++ AesExtra)
      out.write(salt); out.write(verifier); out.write(cipherText); out.write(auth)
      central.write(le(0x02014B50, 4) ++ le(51, 2) ++ le(51, 2) ++ common ++
        le(0, 2) ++ le(0, 2) ++ le(0, 2) ++ le(0, 4) ++ le(offset, 4) ++
        nameB ++ AesExtra)
      nDone += 1
    }
    val cdOffset = out.size()
    out.write(central.toByteArray)
    out.write(le(0x06054B50, 4) ++ le(0, 2) ++ le(0, 2) ++ le(nDone, 2) ++
      le(nDone, 2) ++ le(central.size(), 4) ++ le(cdOffset, 4) ++ le(0, 2))
    Files.write(Paths.get(path), out.toByteArray)
  }

  /** Decrypt every entry, verifying password verifier and auth code. */
  def read(path: String, password: String): Map[String, Array[Byte]] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = Map.newBuilder[String, Array[Byte]]
    while (buf.remaining() >= 4 && buf.getInt(buf.position()) == 0x04034B50) {
      buf.getInt // local header sig
      buf.getShort // version
      buf.getShort; buf.getShort // flags, method
      buf.getShort; buf.getShort // time, date
      buf.getInt // crc
      val csize = buf.getInt
      buf.getInt // usize
      val nameLen = buf.getShort & 0xFFFF
      val extraLen = buf.getShort & 0xFFFF
      val nameB = new Array[Byte](nameLen); buf.get(nameB)
      buf.position(buf.position() + extraLen)
      val salt = new Array[Byte](SaltLen); buf.get(salt)
      val verifier = new Array[Byte](2); buf.get(verifier)
      val cipherText = new Array[Byte](csize - SaltLen - 2 - AuthLen)
      buf.get(cipherText)
      val auth = new Array[Byte](AuthLen); buf.get(auth)
      val (key, authKey, wantVerifier) = deriveKeys(password, salt)
      if (!java.util.Arrays.equals(verifier, wantVerifier))
        throw new IllegalArgumentException("wrong password")
      if (!java.util.Arrays.equals(auth, hmac10(authKey, cipherText)))
        throw new IllegalStateException("auth code mismatch: archive corrupted")
      out += new String(nameB, StandardCharsets.UTF_8) -> ctrCrypt(key, cipherText)
    }
    out.result()
  }
}
