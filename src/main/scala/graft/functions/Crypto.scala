package graft.functions

import java.util.Base64
import javax.crypto.spec.{GCMParameterSpec, PBEKeySpec, SecretKeySpec}
import javax.crypto.{Cipher, SecretKeyFactory}

/** AES-GCM message wrapping for the watermark payload.
  *
  * Mirrors the reference semantics (reference: database/pgvector/
  * pg_func.py:585-734): a 16-char plaintext is AES-GCM-encrypted with a
  * PBKDF2-SHA256-derived key (100k iterations, fixed salt), producing
  * 16 ct bytes + 8 tag bytes = 24 bytes, base64 → exactly 32 chars,
  * which are then partitioned into 16 blocks × 16 payload bits.
  *
  * One deliberate difference: the reference draws a random nonce and
  * returns it to the caller; a distributed, re-runnable pipeline needs
  * determinism, so the nonce is itself derived from the password via
  * PBKDF2 with a distinct salt. Same security model as a fixed-key
  * deterministic wrap; uniqueness per (password, message) is not a goal
  * of the reference either (it reuses one message per DB).
  */
object Crypto {
  private val Salt = "graft_wm_salt_v1".getBytes("UTF-8")
  private val NonceSalt = "graft_wm_nonce_v1".getBytes("UTF-8")
  private val Iterations = 100000
  /** 8-byte truncated tag, as in the reference (mac_len=8). JCE GCM
    * refuses TLen < 96, so we run GCM with the full 128-bit tag and
    * truncate — same construction PyCryptodome uses internally. */
  private val TagBytes = 8

  def pbkdf2(password: String, salt: Array[Byte], bits: Int): Array[Byte] = {
    val spec = new PBEKeySpec(password.toCharArray, salt, Iterations, bits)
    SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      .generateSecret(spec).getEncoded
  }

  private def key(password: String) =
    new SecretKeySpec(pbkdf2(password, Salt, 256), "AES")
  private def nonce(password: String) = pbkdf2(password, NonceSalt, 96)

  /** Full GCM output for pt: 16 ct bytes ++ 16 tag bytes. */
  private def gcmFull(password: String, pt: Array[Byte]): Array[Byte] = {
    val c = Cipher.getInstance("AES/GCM/NoPadding")
    c.init(Cipher.ENCRYPT_MODE, key(password),
      new GCMParameterSpec(128, nonce(password)))
    c.doFinal(pt)
  }

  /** 16-char plaintext → 32-char base64 ciphertext (16 ct + 8 tag bytes). */
  def encryptToBase64(plaintext: String, password: String): String = {
    val pt = plaintext.getBytes("UTF-8")
    require(pt.length == 16, s"plaintext must be 16 bytes, got ${pt.length}")
    val full = gcmFull(password, pt)
    val b64 = Base64.getEncoder.encodeToString(full.take(16 + TagBytes))
    assert(b64.length == 32, s"expected 32 b64 chars, got ${b64.length}")
    b64
  }

  /** Inverse of [[encryptToBase64]]. GCM's keystream is CTR with the
    * counter starting at 2 for the first ct block (NIST SP 800-38D §7.1,
    * J0 = IV || 0x00000001 for 96-bit IVs, data uses inc32(J0)); the
    * truncated tag is verified by recomputing the full GCM output.
    * Throws AEADBadTagException on a wrong password or corrupted bits. */
  def decryptFromBase64(b64: String, password: String): String = {
    require(b64.length == 32, "ciphertext must be 32 b64 chars")
    val raw = Base64.getDecoder.decode(b64)
    val (ct, tag8) = raw.splitAt(16)
    val iv16 = nonce(password) ++ Array[Byte](0, 0, 0, 2)
    val ctr = Cipher.getInstance("AES/CTR/NoPadding")
    ctr.init(Cipher.DECRYPT_MODE, key(password),
      new javax.crypto.spec.IvParameterSpec(iv16))
    val pt = ctr.doFinal(ct)
    val expect = gcmFull(password, pt)
    if (!java.util.Arrays.equals(expect.take(16), ct) ||
        !java.util.Arrays.equals(expect.slice(16, 16 + TagBytes), tag8))
      throw new javax.crypto.AEADBadTagException("tag mismatch")
    new String(pt, "UTF-8")
  }
}

/** CRC-4 (poly 0x3) over 4 message-index bits — the per-vector header
  * integrity check (reference: database/pgvector/pg_func.py:40-50).
  * Only 16 inputs exist, so both engines consume it as an inlined
  * 16-entry lookup table (see Queries.crc4Table).
  */
object Crc4 {
  def apply(idx: Int): Int = {
    require(idx >= 0 && idx < 16)
    val bits = (3 to 0 by -1).map(i => (idx >> i) & 1)
    var reg = 0
    for (bit <- bits) {
      reg ^= bit << 3
      for (_ <- 0 until 4)
        reg = if ((reg & 0x8) != 0) ((reg << 1) & 0xF) ^ 0x3 else (reg << 1) & 0xF
    }
    reg
  }
  /** crc4 of 0..15, for inlining as a SQL array literal. */
  def tableValues: Seq[Int] = (0 until 16).map(apply)
}
