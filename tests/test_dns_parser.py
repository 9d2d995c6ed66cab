"""DNS parser golden tests — hand-built wire-format messages with known
expected fields (the reference's tests/pcap/dns-*.test pattern: fixed
input, exact expected dns.* field values), plus the full edge-ETL
pipeline read_pcap -> decode_frames -> parse_dns."""

from __future__ import annotations

import struct

from moloch_spark.operators.dns_parser import (
    encode_dns_query,
    parse_dns,
    parse_dns_message,
)


def name_bytes(name: str) -> bytes:
    return b"".join(
        bytes([len(l)]) + l.encode() for l in name.split(".") if l
    ) + b"\x00"


def test_query_roundtrip():
    msg = encode_dns_query("www.example.com", dns_id=0x1234, qtype=1)
    out = parse_dns_message(msg)
    assert out["parse_error"] is None
    assert out["dns_id"] == 0x1234
    assert out["qr"] is False
    assert out["opcode"] == "QUERY"
    assert (out["qname"], out["qtype"], out["qclass"]) == ("www.example.com", "A", "IN")
    assert out["answers"] == []


def test_mx_response_with_compression():
    # golden: example.com MX -> "10 mail.example.com", answer name and the
    # exchange host both compression-pointers back into the question
    hdr = struct.pack(">HHHHHH", 0xBEEF, 0x8180, 1, 1, 0, 0)
    q = name_bytes("example.com") + struct.pack(">HH", 15, 1)
    mx_rdata = struct.pack(">H", 10) + b"\x04mail\xc0\x0c"
    ans = b"\xc0\x0c" + struct.pack(">HHIH", 15, 1, 300, len(mx_rdata)) + mx_rdata
    out = parse_dns_message(hdr + q + ans)
    assert out["parse_error"] is None
    assert out["qr"] is True and out["rcode"] == "NOERROR"
    assert out["qname"] == "example.com" and out["qtype"] == "MX"
    (a,) = out["answers"]
    assert a["name"] == "example.com"
    assert a["rtype"] == "MX" and a["ttl"] == 300
    assert a["rdata"] == "10 mail.example.com"


def test_a_and_aaaa_answers():
    hdr = struct.pack(">HHHHHH", 1, 0x8180, 1, 2, 0, 0)
    q = name_bytes("host.test") + struct.pack(">HH", 1, 1)
    a1 = b"\xc0\x0c" + struct.pack(">HHIH", 1, 1, 60, 4) + bytes([192, 0, 2, 7])
    a2 = b"\xc0\x0c" + struct.pack(">HHIH", 28, 1, 60, 16) + bytes.fromhex(
        "20010db8000000000000000000000042"
    )
    out = parse_dns_message(hdr + q + a1 + a2)
    assert [a["rdata"] for a in out["answers"]] == ["192.0.2.7", "2001:db8::42"]
    assert [a["rtype"] for a in out["answers"]] == ["A", "AAAA"]


def test_nxdomain_and_cname():
    hdr = struct.pack(">HHHHHH", 2, 0x8183, 1, 1, 0, 0)  # rcode=3
    q = name_bytes("gone.test") + struct.pack(">HH", 1, 1)
    cname_rdata = b"\x05alias\xc0\x0c"
    ans = b"\xc0\x0c" + struct.pack(">HHIH", 5, 1, 30, len(cname_rdata)) + cname_rdata
    out = parse_dns_message(hdr + q + ans)
    assert out["rcode"] == "NXDOMAIN"
    assert out["answers"][0]["rtype"] == "CNAME"
    assert out["answers"][0]["rdata"] == "alias.gone.test"


def test_hostile_inputs_never_throw():
    # truncated header
    assert parse_dns_message(b"\x00\x01")["parse_error"] is not None
    # self-referencing compression pointer (loop)
    hdr = struct.pack(">HHHHHH", 3, 0x0100, 1, 0, 0, 0)
    loop = hdr + b"\xc0\x0c" + struct.pack(">HH", 1, 1)
    assert parse_dns_message(loop)["parse_error"] is not None
    # truncated rdata
    hdr = struct.pack(">HHHHHH", 4, 0x8180, 1, 1, 0, 0)
    q = name_bytes("x.y") + struct.pack(">HH", 1, 1)
    bad = hdr + q + b"\xc0\x0c" + struct.pack(">HHIH", 1, 1, 60, 4) + b"\x01"
    assert parse_dns_message(bad)["parse_error"] is not None
    # garbage
    assert parse_dns_message(b"\xff" * 64)["parse_error"] is not None


def test_pipeline_pcap_to_dns_fields(spark, tmp_path):
    """The edge-ETL story end-to-end: write a pcap with a udp/53 frame,
    read_pcap -> decode_frames -> filter dns -> parse_dns(hex)."""
    from moloch_spark.operators.frame_decode import decode_frames
    from moloch_spark.sources.pcap_reader import read_pcap
    from tests.test_frame_decode import eth, ip4, udp

    dns_payload = encode_dns_query("spark.apache.org", dns_id=7, qtype=28)
    frames = [
        eth(0x0800, ip4(17, "10.0.0.5", "1.1.1.1", udp(5353, 53, dns_payload))),
        eth(0x0800, ip4(6, "10.0.0.5", "1.2.3.4", b"\x00" * 24)),  # non-DNS
    ]
    blob = struct.pack("<IHHiIII", 0xA1B2C3D4, 2, 4, 0, 0, 65535, 1)
    for i, fr in enumerate(frames):
        blob += struct.pack("<IIII", 1_700_000_000 + i, 0, len(fr), len(fr)) + fr
    path = str(tmp_path / "dns.pcap")
    with open(path, "wb") as fh:
        fh.write(blob)

    decoded = decode_frames(read_pcap(spark, path), data_col="data")
    dns = parse_dns(
        decoded.filter("dst_port = 53 OR src_port = 53"),
        payload_col="payload_hex",
        hex_input=True,
    )
    row = dns.first()
    assert row.dns_qname == "spark.apache.org"
    assert row.dns_qtype == "AAAA"
    assert row.dns_id == 7
    assert row.dns_error is None


def test_rdata_overrun_is_flagged():
    # CNAME declaring rdlen=0 followed by another record: parsing must
    # NOT read the next record's bytes as rdata
    hdr = struct.pack(">HHHHHH", 9, 0x8180, 1, 2, 0, 0)
    q = name_bytes("x.y") + struct.pack(">HH", 1, 1)
    bad_cname = b"\xc0\x0c" + struct.pack(">HHIH", 5, 1, 60, 0)
    a_rec = b"\xc0\x0c" + struct.pack(">HHIH", 1, 1, 60, 4) + bytes([1, 2, 3, 4])
    out = parse_dns_message(hdr + q + bad_cname + a_rec)
    assert out["parse_error"] is not None
