"""SMB1/SMB2 parser unit gates (ref capture/parsers/smb.c)."""

from __future__ import annotations

from moloch_spark.operators.smb_parser import (
    encode_ntlmssp_setup,
    encode_smb1_session_setup,
    encode_smb1_tree_connect,
    encode_smb2_create,
    encode_smb2_tree_connect,
    parse_smb,
)


def test_smb1_session_setup_unicode():
    out = parse_smb(
        encode_smb1_session_setup(
            user="alice", domain="CORP", os_name="Windows 10", ver="Native SMB"
        )
    )
    assert out["parse_error"] is None
    assert out["user"] == "alice"
    assert out["domain"] == "CORP"
    assert out["os"] == "Windows 10"
    assert out["ver"] == "Native SMB"
    assert out["versions"] == ["1"]


def test_smb1_session_setup_ascii():
    out = parse_smb(
        encode_smb1_session_setup(user="eve", domain="WG", unicode_=False)
    )
    assert out["user"] == "eve"
    assert out["domain"] == "WG"


def test_ntlmssp_blob_fields():
    # smb.c:84-148 — SPNEGO negTokenResp -> NTLMSSP AUTHENTICATE type 3
    out = parse_smb(encode_ntlmssp_setup(user="bob", domain="ACME", host="WS01"))
    assert out["parse_error"] is None
    assert (out["user"], out["domain"], out["host"]) == ("bob", "ACME", "WS01")


def test_smb1_tree_connect_share():
    out = parse_smb(encode_smb1_tree_connect(share="\\\\fileserver\\public"))
    assert out["shares"] == ["\\\\fileserver\\public"]


def test_smb2_tree_connect_and_create():
    s = encode_smb2_tree_connect(share="\\\\srv\\docs") + encode_smb2_create(
        filename="q\\report.xlsx"
    )
    out = parse_smb(s)
    assert out["versions"] == ["2"]
    assert out["shares"] == ["\\\\srv\\docs"]
    assert out["filenames"] == ["q\\report.xlsx"]


def test_mixed_dialect_stream_dedups():
    s = (
        encode_smb1_session_setup(user="u", domain="d")
        + encode_smb2_tree_connect(share="\\\\a\\b")
        + encode_smb2_tree_connect(share="\\\\a\\b")  # set semantics
        + encode_smb2_create(filename="x.txt")
    )
    out = parse_smb(s)
    assert out["versions"] == ["1", "2"]
    assert out["shares"] == ["\\\\a\\b"]
    assert out["filenames"] == ["x.txt"]


def test_replies_are_skipped():
    # flip the SMB1 reply flag (header byte 9) -> fields must NOT be taken
    msg = bytearray(encode_smb1_session_setup(user="ignored", domain="nope"))
    msg[4 + 9] |= 0x80  # netbios(4) + flags offset 9
    out = parse_smb(bytes(msg))
    assert out["user"] is None and out["domain"] is None


def test_hostile_inputs_never_throw():
    cases = [
        b"",
        b"\x00",
        b"\x00\x00\x00\x04GARB",
        b"\x01\x00\x00\x00",  # wrong netbios type
        encode_smb2_create(filename="f")[:-5],  # truncated tail
        b"\x00\x00\x00\x08\xfeSMB\x00\x00\x00\x00",  # short SMB2 header
        b"\x00\xff\xff\xff" + b"\xffSMB" + b"\x00" * 100,  # huge declared len
    ]
    for buf in cases:
        out = parse_smb(buf)
        assert isinstance(out, dict)
        assert out["user"] is None


def test_bad_smb2_offsets_flagged():
    # corrupt the create name offset so it points past the body
    msg = bytearray(encode_smb2_create(filename="abc.txt"))
    off = 4 + 64 + 44  # netbios + header + fixed-part offset field
    msg[off : off + 2] = (0xFFFF).to_bytes(2, "little")
    out = parse_smb(bytes(msg))
    assert out["filenames"] == []
    assert out["parse_error"] is not None


def test_smb2_compound_create_chain():
    """SMB2 compounding: CREATE PDUs chained via NextCommand in one
    NetBIOS message must all be parsed ([MS-SMB2] 3.2.4.1.4)."""
    from moloch_spark.operators.smb_parser import (
        encode_smb2_compound,
        encode_smb2_create,
        encode_smb2_tree_connect,
    )

    msg = encode_smb2_compound(
        encode_smb2_tree_connect(share="\\\\srv\\c$"),
        encode_smb2_create(filename="a.txt"),
        encode_smb2_create(filename="b.txt"),
    )
    out = parse_smb(msg)
    assert out["parse_error"] is None
    assert out["shares"] == ["\\\\srv\\c$"]
    assert out["filenames"] == ["a.txt", "b.txt"]


def test_truncated_tail_keeps_earlier_fields():
    """A capture-cut final message must not erase already-parsed fields."""
    s = (
        encode_smb1_session_setup(user="kept", domain="KEPT")
        + encode_smb2_tree_connect(share="\\\\srv\\ok")[:10]  # cut mid-message
    )
    out = parse_smb(s)
    assert out["user"] == "kept" and out["domain"] == "KEPT"
    assert out["parse_error"] is not None


def test_message_cap_flagged():
    from moloch_spark.operators.smb_parser import MAX_SMB_MESSAGES

    s = encode_smb2_tree_connect(share="\\\\srv\\x") * (MAX_SMB_MESSAGES + 2)
    out = parse_smb(s)
    assert out["shares"] == ["\\\\srv\\x"]
    assert "cap" in (out["parse_error"] or "")


def test_tree_connect_real_wire_flags():
    """Regression for the reference's accidental big-endian passlength
    read: Flags=0x0008 with a 1-byte password must still yield the
    share (the broken base read 256 and overran the body)."""
    out = parse_smb(encode_smb1_tree_connect(share="\\\\fs\\data"))
    assert out["shares"] == ["\\\\fs\\data"]
    out2 = parse_smb(encode_smb1_tree_connect(share="\\\\fs\\data", unicode_=False))
    assert out2["shares"] == ["\\\\fs\\data"]


def test_compound_overrun_name_flagged_not_leaked():
    """A chained CREATE whose NameLength overruns its own PDU must be
    rejected by the per-PDU bound, not decode the next PDU's bytes."""
    from moloch_spark.operators.smb_parser import (
        encode_smb2_compound,
        encode_smb2_create,
    )

    msg = bytearray(
        encode_smb2_compound(
            encode_smb2_create(filename="a.txt"),
            encode_smb2_create(filename="b.txt"),
        )
    )
    # first chained PDU: header at +4; NameLength field at hdr+64+46
    nlen_off = 4 + 64 + 46
    msg[nlen_off : nlen_off + 2] = (500).to_bytes(2, "little")
    out = parse_smb(bytes(msg))
    assert out["parse_error"] is not None
    assert all("�" not in f and "SMB" not in f for f in out["filenames"])


def test_compound_chain_cap_flagged():
    from moloch_spark.operators.smb_parser import (
        MAX_SMB2_CHAIN,
        encode_smb2_compound,
        encode_smb2_create,
    )

    msg = encode_smb2_compound(
        *[encode_smb2_create(filename=f"f{i}.txt") for i in range(MAX_SMB2_CHAIN + 4)]
    )
    out = parse_smb(msg)
    assert "cap" in (out["parse_error"] or "")
    assert len(out["filenames"]) == MAX_SMB2_CHAIN  # parsed up to the cap
