"""Merlin/STROBE transcript conformance (bit-exactness with gtank/merlin).

The reference's Fiat-Shamir challenges come from gtank/merlin
(core/transcript.go); our transcript must agree byte-for-byte.
"""

from lumenos_tpu.core.transcript import Transcript


def test_merlin_conformance_vector():
    # merlin's published conformance test (transcript.rs test_transcript)
    t = Transcript(b"test protocol")
    t.append_message(b"some label", b"some data")
    cb = t.challenge_bytes(b"challenge", 32)
    assert cb.hex() == "d5a21972d0d5fe320c0d263fac7fffb8145aa640af6e9bca177c03c7efcf0615"


def test_merlin_multiple_operations():
    # deterministic across instances
    a = Transcript("test")
    b = Transcript("test")
    a.append_field("point", 12345)
    b.append_field("point", 12345)
    assert a.sample_uint64("query") == b.sample_uint64("query")
    x1 = a.sample_uints("r", 4)
    x2 = b.sample_uints("r", 4)
    assert x1 == x2


def test_sample_uints_sequence_matches_individual():
    a = Transcript("seq")
    b = Transcript("seq")
    assert a.sample_uints("r", 3) == [b.sample_uint64("r") for _ in range(3)]
