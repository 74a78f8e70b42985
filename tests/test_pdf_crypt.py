"""pdf_crypt: pinned public test vectors + PDF security-handler roundtrips."""

import numpy as np
import pytest

from docvision_spark.kernel import pdf_crypt as pc


def test_rc4_vectors():
    # canonical RC4 vectors (Wikipedia / original Usenet posting)
    assert pc.rc4(b"Key", b"Plaintext").hex().upper() == "BBF316E8D940AF0AD3"
    assert pc.rc4(b"Wiki", b"pedia").hex().upper() == "1021BF0420"
    assert pc.rc4(b"Secret", b"Attack at dawn").hex().upper() == \
        "45A01F645FC35B383552544B9BF5"
    # symmetric
    assert pc.rc4(b"Key", pc.rc4(b"Key", b"roundtrip")) == b"roundtrip"


def test_aes128_fips197_vector():
    # FIPS-197 Appendix C.1
    key = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    ct = bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a")
    assert pc.aes_encrypt_block(key, pt) == ct
    assert pc.aes_decrypt_block(key, ct) == pt


def test_aes128_appendix_b_vector():
    # FIPS-197 Appendix B
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    pt = bytes.fromhex("3243f6a8885a308d313198a2e0370734")
    ct = bytes.fromhex("3925841d02dc09fbdc118597196a0b32")
    assert pc.aes_encrypt_block(key, pt) == ct


def test_cbc_roundtrip_all_lengths():
    key = b"0123456789abcdef"
    iv = bytes(range(16))
    for n in (0, 1, 15, 16, 17, 100, 1000):
        data = bytes((i * 7 + 3) & 0xFF for i in range(n))
        enc = pc.aes_cbc_encrypt(key, iv, data)
        assert len(enc) % 16 == 0 and enc[:16] == iv
        assert pc.aes_cbc_decrypt(key, enc) == data


def test_cbc_decrypt_vectorized_matches_scalar_chain():
    # NIST SP 800-38A F.2.1 CBC-AES128 vectors
    key = bytes.fromhex("2b7e151628aed2a6abf7158809cf4f3c")
    iv = bytes.fromhex("000102030405060708090a0b0c0d0e0f")
    pt = bytes.fromhex(
        "6bc1bee22e409f96e93d7e117393172a"
        "ae2d8a571e03ac9c9eb76fac45af8e51")
    ct = bytes.fromhex(
        "7649abac8119b246cee98e9b12e9197d"
        "5086cb9b507219ee95db113a917678b2")
    # our encrypt (no padding check here: encrypt pads, so compare prefix)
    enc = pc.aes_cbc_encrypt(key, iv, pt)
    assert enc[16:16 + len(ct)] == ct


def test_user_password_check_roundtrip():
    id0 = b"\x01" * 16
    for r, n in ((2, 5), (3, 16), (4, 16)):
        p = -44
        o = pc.compute_o(b"owner-secret", b"", r, n)
        key = pc.file_key(b"", o, p, id0, n, r)
        u = pc.compute_u(key, id0, r)
        got = pc.check_user_password(b"", o, u, p, id0, n, r)
        assert got == key
        # wrong password rejected
        assert pc.check_user_password(b"wrong", o, u, p, id0, n, r) is None


def test_nonempty_user_password_rejects_empty():
    id0 = b"\x02" * 16
    o = pc.compute_o(b"owner", b"hunter2", 3, 16)
    key = pc.file_key(b"hunter2", o, -44, id0, 16, 3)
    u = pc.compute_u(key, id0, 3)
    assert pc.check_user_password(b"", o, u, -44, id0, 16, 3) is None
    assert pc.check_user_password(b"hunter2", o, u, -44, id0, 16, 3) == key


def test_object_crypt_roundtrip():
    fkey = bytes(range(16))
    data = b"BT /F1 11 Tf (hello encrypted world) Tj ET" * 20
    for aes in (False, True):
        enc = pc.encrypt_object(fkey, 7, 0, data, aes)
        assert enc != data
        assert pc.decrypt_object(fkey, 7, 0, enc, aes) == data
        # a different object id yields a different key
        assert pc.decrypt_object(fkey, 8, 0, enc, aes) != data


def test_aes_192_256_fips_vectors():
    # FIPS-197 Appendix C.2 / C.3
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    k192 = bytes.fromhex("000102030405060708090a0b0c0d0e0f1011121314151617")
    k256 = bytes.fromhex("000102030405060708090a0b0c0d0e0f"
                         "101112131415161718191a1b1c1d1e1f")
    assert pc.aes_encrypt_block(k192, pt).hex() == \
        "dda97ca4864cdfe06eaf70a0ec0d7191"
    assert pc.aes_encrypt_block(k256, pt).hex() == \
        "8ea2b7ca516745bfeafc49904b496089"
    assert pc.aes_decrypt_block(
        k256, bytes.fromhex("8ea2b7ca516745bfeafc49904b496089")) == pt
    # the T-table scalar fast path (used by the R6 KDF) matches
    assert pc._cbc_nopad(k256, b"\x00" * 16, pt, decrypt=False).hex() == \
        "8ea2b7ca516745bfeafc49904b496089"


def test_v5_user_entries_roundtrip_r5_and_r6():
    fkey = bytes(range(32))
    for r in (5, 6):
        u, ue = pc.make_v5_user_entries(b"", fkey, r, b"VSALT678", b"KSALT678")
        assert len(u) == 48 and len(ue) == 32
        assert pc.check_user_password_v5(b"", u, ue, r) == fkey
        assert pc.check_user_password_v5(b"nope", u, ue, r) is None
    # nonempty user password rejects the empty attempt
    u, ue = pc.make_v5_user_entries(b"secret", fkey, 6, b"V" * 8, b"K" * 8)
    assert pc.check_user_password_v5(b"", u, ue, 6) is None
    assert pc.check_user_password_v5(b"secret", u, ue, 6) == fkey


def test_v5_object_crypt_uses_file_key_directly():
    fkey = bytes(range(32))
    data = b"BT (aesv3 stream content) Tj ET" * 11
    enc = pc.encrypt_object_v5(fkey, data, iv=b"\x07" * 16)
    assert pc.decrypt_object_v5(fkey, enc) == data
    assert pc.decrypt_object_v5(bytes(32), enc) != data


def test_cbc_decrypt_garbage_is_safe():
    assert pc.aes_cbc_decrypt(b"0123456789abcdef", b"short") == b""
    assert pc.aes_cbc_decrypt(b"0123456789abcdef", b"x" * 33) == b""
