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


def test_native_strobe_matches_pure_python(monkeypatch):
    """The native strobe_* block ops must be bit-identical to the pure
    Python Strobe128 on a mixed op sequence (absorb/overwrite/squeeze
    across many rate boundaries)."""
    import lumenos_tpu.core.transcript as tr
    if tr._NATIVE is None:
        import pytest
        pytest.skip("native library unavailable")

    def run(native: bool):
        monkeypatch.setattr(tr, "_NATIVE", tr._NATIVE if native else None)
        s = tr.Strobe128(b"proto")
        outs = []
        for i in range(5):
            s.meta_ad(bytes([i]) * (37 * i + 1), False)
            s.ad(bytes(range(256)) * 2, False)
            outs.append(s.prf(311, False))
            s.key(b"k" * (i + 170), False)
        outs.append(bytes(s.state))
        return outs

    native_out = run(True)
    py_out = run(False)
    assert native_out == py_out


def test_large_challenge_fast():
    """8192-sample challenge vector (the prove-span `r`) must be cheap
    now that the permutation is native (round-1 VERDICT weak #7)."""
    import time
    import pytest
    import lumenos_tpu.core.transcript as tr
    if tr._NATIVE is None:
        pytest.skip("native library unavailable (pure-python path is slow "
                    "by design; nothing to assert)")
    t = Transcript("perf")
    t0 = time.perf_counter()
    t.sample_uints("r", 8192)
    elapsed = time.perf_counter() - t0
    assert elapsed < 5.0, f"sample_uints(8192) took {elapsed:.1f}s"
