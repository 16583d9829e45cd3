package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{Crc4, Crypto}

class CryptoSpec extends AnyFunSuite {

  test("encrypt produces exactly 32 base64 chars") {
    val ct = Crypto.encryptToBase64("GRAFT WATERMARK!", "pw")
    assert(ct.length == 32)
  }

  test("round-trip recovers the plaintext") {
    val msgs = Seq("GRAFT WATERMARK!", "0123456789abcdef", "  spaces  ok!!  ")
    for (m <- msgs; pw <- Seq("a", "graft-key-2026")) {
      assert(Crypto.decryptFromBase64(Crypto.encryptToBase64(m, pw), pw) == m)
    }
  }

  test("encryption is deterministic per (message, password)") {
    assert(Crypto.encryptToBase64("GRAFT WATERMARK!", "pw") ==
      Crypto.encryptToBase64("GRAFT WATERMARK!", "pw"))
    assert(Crypto.encryptToBase64("GRAFT WATERMARK!", "pw") !=
      Crypto.encryptToBase64("GRAFT WATERMARK!", "pw2"))
  }

  test("wrong password fails the truncated-tag check") {
    val ct = Crypto.encryptToBase64("GRAFT WATERMARK!", "pw")
    intercept[javax.crypto.AEADBadTagException] {
      Crypto.decryptFromBase64(ct, "wrong")
    }
  }

  test("corrupted ciphertext fails the tag check") {
    val ct = Crypto.encryptToBase64("GRAFT WATERMARK!", "pw")
    val bad = (if (ct(0) == 'A') "B" else "A") + ct.substring(1)
    intercept[javax.crypto.AEADBadTagException] {
      Crypto.decryptFromBase64(bad, "pw")
    }
  }

  test("distinct messages under one password use distinct IVs (SIV)") {
    // the 8 tag bytes double as the CTR IV; equal tags across distinct
    // messages would mean keystream reuse — the GCM-fixed-nonce hazard
    // this construction exists to avoid
    val tags = Seq("GRAFT WATERMARK!", "0123456789abcdef", "AAAAAAAAAAAAAAAA")
      .map(m => Crypto.encryptToBase64(m, "pw").substring(21)) // b64 tail ⊇ tag
    assert(tags.distinct.length == tags.length)
  }

  test("non-16-byte plaintext is rejected") {
    intercept[IllegalArgumentException] {
      Crypto.encryptToBase64("short", "pw")
    }
  }

  test("nonce overload round-trips and binds the nonce into the tag") {
    val m = "GRAFT WATERMARK!"
    val ct = Crypto.encryptToBase64(m, "pw", "00112233aabbccdd")
    assert(ct.length == 32)
    assert(Crypto.decryptFromBase64(ct, "pw", "00112233aabbccdd") == m)
    // distinct nonces → distinct ciphertexts for the same message
    assert(ct != Crypto.encryptToBase64(m, "pw", "00112233aabbccde"))
    // ...and distinct from the deterministic SIV form
    assert(ct != Crypto.encryptToBase64(m, "pw"))
    // wrong nonce or wrong key fails authentication
    intercept[javax.crypto.AEADBadTagException] {
      Crypto.decryptFromBase64(ct, "pw", "ffffffffffffffff")
    }
    intercept[javax.crypto.AEADBadTagException] {
      Crypto.decryptFromBase64(ct, "other", "00112233aabbccdd")
    }
    // malformed nonce rejected up front
    intercept[IllegalArgumentException] {
      Crypto.encryptToBase64(m, "pw", "XYZ")
    }
  }

  test("CRC-4 table is stable and a permutation of 0..15") {
    // snapshot: the SQL plans inline these values, so any change here
    // silently breaks extraction of previously-embedded watermarks
    assert(Crc4.tableValues ==
      Seq(0, 11, 14, 5, 1, 10, 15, 4, 3, 8, 13, 6, 2, 9, 12, 7))
    assert(Crc4.tableValues.sorted == (0 until 16)) // every header detectable
  }
}
