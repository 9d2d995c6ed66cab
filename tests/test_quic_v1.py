"""QUIC v1 Initial crypto + parse (operators/quic_crypto, quic_parser).

The primitives are pinned to published vectors so the whole chain is
spec-anchored, not merely self-consistent: FIPS-197 Appendix C.1
(AES-128 block), NIST SP 800-38D GCM test case 3 (ties down GHASH bit
order), RFC 9001 Appendix A.1 (Initial key derivation = HKDF +
Expand-Label + the v1 salt).
"""

from __future__ import annotations

import pytest

from moloch_spark.operators import quic_crypto as QC
from moloch_spark.operators.quic_parser import parse_quic_v1


def test_aes128_fips197_vector():
    rk = QC.aes128_key_schedule(bytes.fromhex("000102030405060708090a0b0c0d0e0f"))
    ct = QC.aes128_encrypt_block(rk, bytes.fromhex("00112233445566778899aabbccddeeff"))
    assert ct.hex() == "69c4e0d86a7b0430d8cdb78070b4c55a"


def test_gcm_nist_case3():
    key = bytes.fromhex("feffe9928665731c6d6a8f9467308308")
    iv = bytes.fromhex("cafebabefacedbaddecaf888")
    pt = bytes.fromhex(
        "d9313225f88406e5a55909c5aff5269a86a7a9531534f7da2e4c303d8a318a72"
        "1c3c0c95956809532fcf0e2449a6b525b16aedf5aa0de657ba637b391aafd255"
    )
    ct, tag = QC.aes_gcm_encrypt(key, iv, b"", pt)
    assert ct.hex() == (
        "42831ec2217774244b7221b784d0d49ce3aa212f2c02a4e035c17e2329aca12e"
        "21d514b25466931c7d8f6a5aac84aa051ba30b396a0aac973d58e091473f5985"
    )
    assert tag.hex() == "4d5c2af327cd64a62cf35abd2ba6fab4"
    assert QC.aes_gcm_decrypt(key, iv, b"", ct, tag) == pt
    with pytest.raises(ValueError):
        QC.aes_gcm_decrypt(key, iv, b"x", ct, tag)


def test_rfc9001_a1_initial_keys():
    key, iv, hp = QC.initial_keys(bytes.fromhex("8394c8f03e515708"))
    assert key.hex() == "1f369613dd76d5467730efcbe3b1a22d"
    assert iv.hex() == "fa044b2f42a3fd3b46fb255c"
    assert hp.hex() == "9f50449e04a0e810283a1e9933adedd2"


def test_varint_roundtrip():
    for v in (0, 63, 64, 16383, 16384, (1 << 30) - 1, 1 << 30, 1 << 61):
        enc = QC.varint_encode(v)
        got, off = QC.varint_decode(enc, 0)
        assert (got, off) == (v, len(enc))
    with pytest.raises(ValueError):
        QC.varint_decode(b"\xc0\x00", 0)  # 8-byte varint, truncated


def _client_initial(doc_id: int = 7, sni: str = "doc7.example.org") -> bytes:
    from moloch_spark.operators.tls_parser import encode_client_hello

    hello = encode_client_hello(sni=sni, alpn=("h3",))[5:]
    frame = b"\x06" + QC.varint_encode(0) + QC.varint_encode(len(hello)) + hello
    return QC.seal_initial(
        dcid=doc_id.to_bytes(8, "big"), pn=doc_id, payload=frame
    )


def test_initial_roundtrip_padded_to_1200():
    pkt = _client_initial()
    assert len(pkt) == 1200  # RFC 9000 §14.1 client Initial padding
    out = parse_quic_v1(pkt)
    assert out["parse_error"] is None
    assert out["version"] == "v1"
    assert out["dcid"] == "0000000000000007"
    assert out["pn"] == 7
    assert out["sni"] == "doc7.example.org"
    assert out["alpn"] == "h3"
    assert out["ja3"] is not None


def test_initial_crypto_frame_split_and_reordered():
    """CRYPTO data may arrive as multiple frames in any order within
    the packet — reassembly is by offset."""
    from moloch_spark.operators.tls_parser import encode_client_hello

    hello = encode_client_hello(sni="split.example", alpn=("h3",))[5:]
    cut = len(hello) // 2
    f2 = (b"\x06" + QC.varint_encode(cut)
          + QC.varint_encode(len(hello) - cut) + hello[cut:])
    f1 = b"\x06" + QC.varint_encode(0) + QC.varint_encode(cut) + hello[:cut]
    pkt = QC.seal_initial(dcid=b"\x11" * 8, pn=1, payload=f2 + b"\x01" + f1)
    out = parse_quic_v1(pkt)
    assert out["sni"] == "split.example" and out["parse_error"] is None


def test_hostile_inputs_never_throw():
    pkt = bytearray(_client_initial())
    cases = [
        b"",
        b"\x00" * 30,                      # short header
        bytes(pkt[:40]),                   # truncated mid-body
        bytes([pkt[0]]) + b"\x00\x00\x00\x02" + bytes(pkt[5:]),  # v2
    ]
    flipped = bytearray(pkt)
    flipped[-1] ^= 0xFF                    # corrupt the GCM tag region
    cases.append(bytes(flipped))
    for buf in cases:
        out = parse_quic_v1(bytes(buf))
        assert out["parse_error"] is not None, buf[:8]
    # flipping ciphertext must be caught by the tag, not produce fields
    mid = bytearray(pkt)
    mid[600] ^= 0x01
    assert parse_quic_v1(bytes(mid))["parse_error"] is not None


def test_unpadded_initial_still_opens():
    """Our decoder is lenient about the 1200-byte client padding rule
    (a middlebox sees what it sees)."""
    hello = b"\x01\x00\x00\x04\x03\x03\x00\x00"  # nonsense handshake body
    frame = b"\x06" + QC.varint_encode(0) + QC.varint_encode(len(hello)) + hello
    pkt = QC.seal_initial(dcid=b"\x22" * 4, pn=0, payload=frame, pad_to=0)
    out = parse_quic_v1(pkt)
    assert out["parse_error"] is None and out["dcid"] == "22222222"


def test_coalesced_initials_clienthello_spans_packets():
    """A big ClientHello split across TWO coalesced Initials in one
    datagram (RFC 9000 §12.2) reassembles across packet payloads."""
    from moloch_spark.operators.tls_parser import encode_client_hello

    hello = encode_client_hello(sni="coalesced.example", alpn=("h3",))[5:]
    cut = len(hello) // 2
    f1 = b"\x06" + QC.varint_encode(0) + QC.varint_encode(cut) + hello[:cut]
    f2 = (b"\x06" + QC.varint_encode(cut)
          + QC.varint_encode(len(hello) - cut) + hello[cut:])
    dcid = b"\x33" * 8
    p1 = QC.seal_initial(dcid=dcid, pn=0, payload=f1, pad_to=0)
    p2 = QC.seal_initial(dcid=dcid, pn=1, payload=f2, pad_to=0)
    out = parse_quic_v1(p1 + p2)
    assert out["sni"] == "coalesced.example" and out["parse_error"] is None
    assert out["pn"] == 0  # fields come from the first packet


def test_coalesced_trailing_garbage_ignored():
    pkt = _client_initial()
    out = parse_quic_v1(pkt + b"\xe0\x00\x00\x00\x01junk")  # 0-RTT-ish type
    assert out["sni"] == "doc7.example.org" and out["parse_error"] is None
