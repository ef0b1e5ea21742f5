"""Homomorphic Ligero PCS over encrypted witness columns (configs 3-4).

The PPD server protocol (reference fhe/ligero.go): commit to an encrypted
matrix via homomorphic RS-encode + Merkle, then prove an evaluation with
homomorphic challenge inner products and column openings; the client
decrypts into a plaintext `core.ligero_plain.Proof` checked by the public
verifier.

TPU-first deviations (DESIGN.md sections 3-4), value-compatible with the
reference protocol:
- the encode transform is scale-deferred (per-position public sigmas);
- MatR/MatZ inner products use the sum-slots identity instead of InnerSum
  rotation trees: MatR_j = N * c_0(ct_j x pt_r); the client decodes the
  constant coefficient - no Galois keys, no keyswitching on the hot path;
- one batched tensor op replaces each of the reference's goroutine pools.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from .. import jaxcfg  # noqa: F401
import jax
import jax.numpy as jnp

from ..core.field import PrimeField
from ..ops.devsync import sync
from ..core.ligero_plain import (
    LigeroCommitter, LigeroMetadata, Proof, QueriedColumn, sample_query_indices,
    _powers,
)
from ..core.merkle import MerkleTree
from ..core.merkle_fast import FastMerkleTree, hash_ct_leaves_striped
from ..core.tracer import Span, start_span
from ..core.transcript import Transcript
from .backend import BgvBackend, CtBatch, PublicKey, SecretKey
from .hntt import ligero_ntt_scales
from .pipeline import (build_encode_pipeline, build_products_pipeline,
                       products_apply)
from .ring import barrett_mul


from ..ops.sha256_jax import ct_leaf_digest_host as fhe_leaf_hasher  # noqa: E402


def ct_leaf_bytes(data_np: np.ndarray, i: int) -> bytes:
    """Merkle leaf bytes of ciphertext i: LE-u64 dump of [2, L+1, N] data."""
    return np.ascontiguousarray(data_np[i].astype("<u8")).tobytes()


@dataclass
class EncryptedProof:
    """Server output (reference fhe/ligero.go:185-192)."""

    meta: LigeroMetadata
    root: bytes
    mat_r: CtBatch            # [cols] product cts (value = N*c0 per ct)
    mat_z: CtBatch
    queried_cols: CtBatch     # [queries] level-1 encoded-column cts
    queried_scales: np.ndarray  # [queries] public sigmas (u64 mod t)
    query_indices: list[int]
    merkle_paths: list[list[bytes]]

    # -- serialization (framework wire format) -----------------------------

    def sizes(self) -> dict:
        """Per-component marshaled byte sizes (reference fhe/ligero.go:672-692
        logs humanized sizes while marshalling)."""
        def batch_bytes(batch):
            n = 1
            for d in batch.data.shape:
                n *= int(d)
            return n * 8
        s = {
            "mat_r": batch_bytes(self.mat_r),
            "mat_z": batch_bytes(self.mat_z),
            "queried_cols": batch_bytes(self.queried_cols),
            "merkle_paths": sum(32 * len(p) for p in self.merkle_paths),
            "root": 32,
        }
        s["total"] = sum(s.values())
        return s

    def to_bytes(self) -> bytes:
        out = [self.meta.to_bytes()]
        for batch in (self.mat_r, self.mat_z, self.queried_cols):
            arr = np.asarray(batch.data).astype("<u8")
            out.append(struct.pack("<BIII", batch.level, *arr.shape[:1],
                                   arr.shape[2], arr.shape[3]))
            out.append(arr.tobytes())
        out.append(np.asarray(self.queried_scales, dtype="<u8").tobytes())
        out.append(struct.pack("<H", len(self.query_indices)))
        for qi in self.query_indices:
            out.append(struct.pack("<I", qi))
        for path in self.merkle_paths:
            out.append(struct.pack("<B", len(path)))
            for h in path:
                out.append(h)
        out.append(self.root)
        return b"".join(out)

    @classmethod
    def from_bytes(cls, data: bytes) -> "EncryptedProof":
        off = 0
        meta = LigeroMetadata.from_bytes(data[off:off + 11]); off += 11
        batches = []
        for _ in range(3):
            level, n, l1, nn = struct.unpack_from("<BIII", data, off); off += 13
            count = n * 2 * l1 * nn
            arr = np.frombuffer(data, dtype="<u8", count=count, offset=off)
            off += count * 8
            batches.append(CtBatch(
                data=jnp.asarray(arr.reshape(n, 2, l1, nn).astype(np.uint64)),
                level=level))
        nq = batches[2].data.shape[0]
        scales = np.frombuffer(data, dtype="<u8", count=nq, offset=off).astype(np.uint64)
        off += nq * 8
        (n_idx,) = struct.unpack_from("<H", data, off); off += 2
        idxs = []
        for _ in range(n_idx):
            (v,) = struct.unpack_from("<I", data, off); off += 4
            idxs.append(v)
        paths = []
        for _ in range(n_idx):
            (plen,) = struct.unpack_from("<B", data, off); off += 1
            path = []
            for _ in range(plen):
                path.append(data[off:off + 32]); off += 32
            paths.append(path)
        root = data[off:off + 32]
        return cls(meta=meta, root=root, mat_r=batches[0], mat_z=batches[1],
                   queried_cols=batches[2], queried_scales=scales,
                   query_indices=idxs, merkle_paths=paths)


class HomomorphicLigeroProver:
    """Server-side committed state (reference LigeroProver)."""

    def __init__(self, committer: LigeroCommitter, backend: BgvBackend,
                 matrix_ct: CtBatch, encoded_lvl1: CtBatch,
                 encoded_scales: np.ndarray, tree: MerkleTree,
                 leaf_data: np.ndarray, field: PrimeField):
        self.committer = committer
        self.backend = backend
        self.matrix_ct = matrix_ct
        self.encoded_lvl1 = encoded_lvl1
        self.encoded_scales = encoded_scales
        self.tree = tree
        self.leaf_data = leaf_data
        self.field = field

    @property
    def root(self) -> bytes:
        return self.tree.root


def commit(
    committer: LigeroCommitter,
    backend: BgvBackend,
    matrix_ct: CtBatch,
    pk: PublicKey,
    rng: np.random.Generator,
    field: PrimeField,
    ctx: Span | None = None,
) -> HomomorphicLigeroProver:
    """Homomorphic commit: RS-encode + rescale to level 1 + Merkle
    (reference fhe/ligero.go:95-183)."""
    meta = committer.meta
    with start_span("Encode", ctx):
        pad = meta.cols * (meta.rho_inv - 1)
        zeros_ct = backend.encrypt_values(
            np.zeros((pad, meta.rows), dtype=np.uint64), pk, rng)
        fn = build_encode_pipeline(backend, field, meta.cols, meta.rho_inv)
        enc_data = fn(matrix_ct.data, zeros_ct.data)
        encoded = CtBatch(data=enc_data, level=1)
        scales = ligero_ntt_scales(field.modulus, field.n,
                                   meta.cols * meta.rho_inv)
        sync(encoded.data)
        # the fused encode program performs one ct x scalar cofactor mul
        # per position per schedule layer (reference counts these via
        # evaluator Mul, fhe/bfv.go:34-46)
        from .hsched import unit_schedule
        size = meta.cols * meta.rho_inv
        backend.mul_count += unit_schedule(field, size, size).n_layers * size
    with start_span("Merkle tree built", ctx):
        leaf_data = np.asarray(encoded.data)
        tree = FastMerkleTree(hash_ct_leaves_striped(leaf_data))
    return HomomorphicLigeroProver(
        committer=committer, backend=backend, matrix_ct=matrix_ct,
        encoded_lvl1=encoded, encoded_scales=scales, tree=tree,
        leaf_data=leaf_data, field=field)


_PRODX_CACHE: dict = {}


def _products_extract_fns(backend: BgvBackend, n1h: int, chunk_a: int,
                          start_level: int, prod_level: int):
    """Jitted (extract, accumulate) pair for derive_products_matrix.
    extract: [n1h, ca, 2, L, N] chunk top -> rescaled [n1h, ca, 2, Lp, N];
    accumulate: donated dynamic_update_slice into the [n1h, n2, ...] buffer."""
    key = ("prodx", id(backend), n1h, chunk_a, start_level, prod_level)
    if key not in _PRODX_CACHE:
        def _extract(top):
            flat = top.reshape((n1h * chunk_a,) + top.shape[2:])
            out = backend.rescale_to(
                CtBatch(data=flat, level=start_level), prod_level)
            return out.data.reshape((n1h, chunk_a) + out.data.shape[1:])

        _PRODX_CACHE[key] = (
            jax.jit(_extract),
            jax.jit(lambda b, c, j0: jax.lax.dynamic_update_slice(
                b, c, (0, j0, 0, 0, 0)), donate_argnums=(0,)))
    return _PRODX_CACHE[key]


def precompile_products_extract(backend: BgvBackend, staged, cols: int,
                                prod_level: int = 2,
                                chunk_a: int | None = None) -> None:
    """AOT-compile the derive_products_matrix programs before big device
    buffers exist (trace/compile under memory pressure OOMs on TPU)."""
    ca = staged.chunk_a if chunk_a is None else chunk_a
    n1h = cols // staged.n2
    ex, upd = _products_extract_fns(backend, n1h, ca,
                                    staged.level, prod_level)
    n = backend.n
    sds = jax.ShapeDtypeStruct
    u64 = jnp.uint64
    ex.lower(sds((n1h, ca, 2, staged.level + 1, n), u64)).compile()
    upd.lower(sds((n1h, staged.n2, 2, prod_level + 1, n), u64),
              sds((n1h, ca, 2, prod_level + 1, n), u64),
              0).compile()


def derive_products_matrix(backend: BgvBackend, staged, make_chunk,
                           cols: int, prod_level: int = 2,
                           chunk_a: int | None = None,
                           fence_group: int = 1):
    """Products-level matrix batch from the CLIENT's encode-level
    ciphertexts: a second pass over the stage-A chunk stream, slicing the
    matrix positions (p = i*n2 + j < cols  <=>  i < cols/n2) and rescaling
    start_level -> prod_level on device. MSB form: rescale divides the
    phase AND Delta by the dropped prime, so the plaintext is unchanged
    (backend.rescale docstring) - the derived batch encrypts exactly the
    matrix columns, with post-rescale noise far under the one-pt-mul
    headroom that prod_level provides.

    Never encrypts: this replaces the server-side re-encryption the
    round-2 review flagged (the reference's demo also encrypts
    server-side, cmd/server/main.go:200-207, but a real PPD server only
    ever sees ciphertexts, cmd/server/main.go:66-179).

    chunk_a: stage-A rows per chunk for THIS pass — it may be much larger
    than staged.chunk_a because the mid buffer is freed by the time the
    derivation runs (the caller's make_chunk must slice by the same
    width). fence_group: chunks per timed fence, same contract as
    run_streaming_cells (each group's chunks are produced untimed first,
    then one timed dispatch+drain segment — ~78 ms per fence saved).

    Returns (CtBatch [cols] at prod_level, device_seconds) where
    device_seconds excludes chunk production (re-reading received bytes
    in production; the demo replays its encryption stream)."""
    import time as _time
    n2 = staged.n2
    ca = staged.chunk_a if chunk_a is None else chunk_a
    assert cols % n2 == 0, "matrix must cover whole i-rows of the grid"
    n1h = cols // n2
    extract, upd = _products_extract_fns(backend, n1h, ca, staged.level,
                                         prod_level)
    buf = jnp.zeros((n1h, n2, 2, prod_level + 1, backend.n), jnp.uint64)
    t_dev = 0.0
    n_chunks = n2 // ca
    group = max(1, int(fence_group))
    jc = 0
    while jc < n_chunks:
        g = min(group, n_chunks - jc)
        chunks = []
        for j in range(jc, jc + g):
            c = make_chunk(j)
            sync(c)
            chunks.append(c)
        t0 = _time.perf_counter()
        for j, c in zip(range(jc, jc + g), chunks):
            buf = upd(buf, extract(c[:n1h]), j * ca)
        del chunks, c
        sync(buf)
        t_dev += _time.perf_counter() - t0
        jc += g
    # grid position p = i*n2 + j == matrix column index, so a row-major
    # reshape is already column order
    ct = CtBatch(data=buf.reshape(cols, 2, prod_level + 1, backend.n),
                 level=prod_level)
    return ct, t_dev


class ProductsSink:
    """Single-pass products-level matrix derivation: plugs into
    StagedEncode.run_streaming_cells(prod_sink=...) so the rescale of the
    received encode-level cts happens on the FIRST read of the chunk
    stream — no second pass, no re-upload. Same programs and bit-identical
    output as derive_products_matrix (which remains for memory-tight
    configs where the [cols, 2, Lp+1, N] buffer cannot sit next to the
    whole mid buffer, e.g. 16384x4096/LogN14)."""

    def __init__(self, backend: BgvBackend, staged, cols: int,
                 prod_level: int = 2):
        assert cols % staged.n2 == 0
        self.backend = backend
        self.n1h = cols // staged.n2
        self.cols = cols
        self.prod_level = prod_level
        self.ca = staged.chunk_a
        self.n2 = staged.n2
        self._extract, self._upd = _products_extract_fns(
            backend, self.n1h, staged.chunk_a, staged.level, prod_level)
        self.buf = jnp.zeros(
            (self.n1h, staged.n2, 2, prod_level + 1, backend.n), jnp.uint64)
        self.t_dev = 0.0

    def __call__(self, jc: int, chunk) -> None:
        import time as _time
        t0 = _time.perf_counter()
        self.buf = self._upd(self.buf, self._extract(chunk[:self.n1h]),
                             jc * self.ca)
        sync(self.buf)
        self.t_dev += _time.perf_counter() - t0

    def finish(self) -> CtBatch:
        return CtBatch(
            data=self.buf.reshape(self.cols, 2, self.prod_level + 1,
                                  self.backend.n),
            level=self.prod_level)


def commit_streaming_cts(
    committer: LigeroCommitter,
    backend: BgvBackend,
    chunk_source,
    field: PrimeField,
    ctx: Span | None = None,
    start_level: int | None = None,
    prod_level: int = 2,
    fused: bool = True,
) -> HomomorphicLigeroProver:
    """Ciphertext-only production commit: the server consumes ONLY
    client-encrypted ciphertexts (reference trust model:
    cmd/server/main.go:66-179 receives keys + data over the wire).

    ``chunk_source(staged) -> make_chunk`` where ``make_chunk(jc)`` yields
    the stage-A input chunk [n1, chunk_a, 2, L, N] at ``staged.level``
    (j-chunk jc of the [n1, n2] position grid: matrix columns at positions
    p = i*n2 + j < cols, zero encryptions above). ``cols`` must cover
    whole grid rows (cols % staged.n2 == 0 — true for every power-of-two
    matrix at rho_inv=2; asserted below): both derivation modes slice the
    matrix as whole i-rows. The ciphertext stream is read ONCE on the
    default path: the fused stage-A program emits both the transform
    output and the products-level rescale of the matrix rows (staged.py
    _stage_a_prod_fn). Set fused=False to re-read the stream in a second
    derivation pass instead (derive_products_matrix; production re-reads
    the received bytes) when the fused buffer does not fit HBM.

    The products-level matrix is derived by RESCALING those encode-level
    ciphertexts - this function never calls an encryptor
    (tests/test_hligero.py asserts it)."""
    from .hntt import min_start_level
    from .staged import StagedEncode
    from ..ops.sha256_jax import digests_to_bytes

    meta = committer.meta
    size = meta.cols * meta.rho_inv
    lvl = (min_start_level(backend.params, size)
           if start_level is None else start_level)
    prod_level = min(prod_level, lvl)
    staged = StagedEncode(backend, field, size, lvl)
    assert meta.cols % staged.n2 == 0, (
        f"cols={meta.cols} must cover whole grid rows (n2={staged.n2}): "
        f"both products-derivation modes slice whole i-rows")
    with start_span("Encode (+products-level rescale)" if fused
                    else "Encode", ctx):
        if fused:
            enc_ct, digests, scales, _, prod_data = staged.run_streaming(
                chunk_source(staged), staged.n2 // staged.chunk_a,
                prod_cfg=(meta.cols // staged.n2, prod_level))
            prod_ct = CtBatch(data=prod_data, level=prod_level)
        else:
            enc_ct, digests, scales, _ = staged.run_streaming(
                chunk_source(staged), staged.n2 // staged.chunk_a)
        sync(enc_ct.data)
        from .hsched import unit_schedule
        backend.mul_count += unit_schedule(field, size, size).n_layers * size
    with start_span("Merkle tree built", ctx):
        tree = FastMerkleTree(digests_to_bytes(np.asarray(digests)))
    if not fused:
        with start_span("Products-level matrix (rescale received cts)", ctx):
            prod_ct, _ = derive_products_matrix(
                backend, staged, chunk_source(staged), meta.cols,
                prod_level)
            sync(prod_ct.data)
    return HomomorphicLigeroProver(
        committer=committer, backend=backend, matrix_ct=prod_ct,
        encoded_lvl1=enc_ct,
        encoded_scales=np.array([int(x) for x in scales], dtype=object),
        tree=tree, leaf_data=np.asarray(enc_ct.data), field=field)


def commit_streaming(
    committer: LigeroCommitter,
    backend: BgvBackend,
    values: np.ndarray,
    pk: PublicKey,
    rng: np.random.Generator,
    field: PrimeField,
    ctx: Span | None = None,
    start_level: int | None = None,
) -> HomomorphicLigeroProver:
    """Demo/bench convenience around commit_streaming_cts: plays the
    CLIENT role - encrypts each stage-A input chunk just-in-time from
    ``values`` [cols, rows] at the minimum viable level - then restores
    the rng state so the second pass replays the bit-identical ciphertext
    stream (what a production server does by re-reading received bytes).
    The server-side path (commit_streaming_cts) never encrypts. Output is
    bit-identical to commit() on the same encryption randomness stream."""
    meta = committer.meta
    state0 = rng.bit_generator.state

    def chunk_source(staged):
        rng.bit_generator.state = state0    # replay the identical stream
        full_vals = np.zeros((staged.size, meta.rows), dtype=np.uint64)
        full_vals[: meta.cols] = values
        grid = full_vals.reshape(staged.n1, staged.n2, meta.rows)

        def make_chunk(jc):
            j0 = jc * staged.chunk_a
            vals = np.ascontiguousarray(
                grid[:, j0:j0 + staged.chunk_a].reshape(-1, meta.rows))
            ct = backend.encrypt_values(vals, pk, rng, level=staged.level)
            return ct.data.reshape(
                (staged.n1, staged.chunk_a) + ct.data.shape[1:])
        return make_chunk

    return commit_streaming_cts(committer, backend, chunk_source, field,
                                ctx=ctx, start_level=start_level)


def prove(
    prover: HomomorphicLigeroProver,
    point: int,
    transcript: Transcript,
    ctx: Span | None = None,
    ring_switch: tuple | None = None,
) -> EncryptedProof:
    """Homomorphic prove (reference fhe/ligero.go:194-291).

    ring_switch: optional (evk, k) from the client (wire.py): MatR/MatZ
    are switched to the N/k-degree ring before shipping (reference
    fhe/ligero.go:336-342) — 8-32x smaller inner-product cts. Unlike the
    reference (which must skip verification in this mode,
    README.md:100-104), our c0-decode survives the switch and the proof
    still verifies (fhe/ring_switch.py docstring)."""
    backend = prover.backend
    meta = prover.committer.meta
    field = prover.field
    rows, cols = meta.rows, meta.cols
    t = field.modulus

    r = np.array([x % t for x in transcript.sample_uints("r", rows)],
                 dtype=np.uint64)
    z_pow = pow(point, cols, t)
    b = _powers(field, z_pow, rows)

    lvl = prover.matrix_ct.level
    with start_span("InnerProduct(Matrix, r|b)", ctx):
        enc = backend.encoder
        pt_r = backend._ntt(enc.lift_to_rns(enc.encode(r), lvl), lvl)
        pt_b = backend._ntt(enc.lift_to_rns(enc.encode(b), lvl), lvl)
        mr1, mz1 = products_apply(backend, prover.matrix_ct.data,
                                  pt_r, pt_b, level=lvl)
        mat_r = CtBatch(data=mr1, level=1)
        mat_z = CtBatch(data=mz1, level=1)
        sync(mat_r.data)
        backend.mul_count += 2 * cols   # one ct x pt per column per challenge

    if ring_switch is not None:
        evk, k = ring_switch
        with start_span("Ring switch MatR/MatZ", ctx):
            from .ring_switch import ring_switch_batch
            mat_r = ring_switch_batch(backend, mat_r, evk, k)
            mat_z = ring_switch_batch(backend, mat_z, evk, k)
            sync(mat_r.data)

    transcript.append_field("point", point)

    with start_span("Query columns", ctx):
        ext_cols = cols * meta.rho_inv
        query_indices = sample_query_indices(transcript, meta.queries, ext_cols)
        sel = np.array(query_indices)
        queried = CtBatch(data=prover.encoded_lvl1.data[sel], level=1)
        q_scales = np.array(
            [int(prover.encoded_scales[i]) for i in query_indices], dtype=np.uint64)
        paths = [prover.tree.get_path(i) for i in query_indices]

    return EncryptedProof(
        meta=meta, root=prover.root, mat_r=mat_r, mat_z=mat_z,
        queried_cols=queried, queried_scales=q_scales,
        query_indices=query_indices, merkle_paths=paths)


def decrypt_proof(
    eproof: EncryptedProof,
    backend: BgvBackend,
    sk: SecretKey,
    ctx: Span | None = None,
    small: tuple | None = None,
) -> Proof:
    """Client decrypt (reference fhe/ligero.go:381-502) -> plaintext Proof
    consumable by core.ligero_plain.verify.

    small: optional (small_backend, sk_small) when the server ring-
    switched MatR/MatZ; the c0 decode is unchanged (value = N_big * c0:
    the sum-slots factor is the BIG ring degree, preserved by the
    switch)."""
    meta = eproof.meta
    t = backend.t
    n = backend.n
    n_inv = pow(n, t - 2, t)

    with start_span("Decrypt queried columns", ctx):
        vals = np.asarray(backend.decrypt_values(eproof.queried_cols, sk, meta.rows))
        leaf_np = np.asarray(eproof.queried_cols.data)
        queried = []
        for i in range(vals.shape[0]):
            sigma_inv = pow(int(eproof.queried_scales[i]), t - 2, t)
            unscaled = (vals[i].astype(object) * sigma_inv) % t
            queried.append(QueriedColumn(
                values=np.array(unscaled.tolist(), dtype=np.uint64),
                leaf_bytes=ct_leaf_bytes(leaf_np, i)))

    with start_span("Decrypt row inner products", ctx):
        mat_backend, mat_sk = (backend, sk) if small is None else small
        # O(N) ternary-dot c0 decode: the client's 47.5 s worst case in
        # the reference (README.md:86) is a masked sum here
        c0_r = np.asarray(mat_backend.decrypt_c0_fast(eproof.mat_r, mat_sk))
        c0_z = np.asarray(mat_backend.decrypt_c0_fast(eproof.mat_z, mat_sk))
        mat_r = np.array([int(x) * n % t for x in c0_r], dtype=np.uint64)
        mat_z = np.array([int(x) * n % t for x in c0_z], dtype=np.uint64)
        # value = N * c0; decode folds N back in (sum-slots identity). The
        # reference's slot-0 InnerSum decode is replaced by this c0 decode.
        del n_inv  # (kept name for clarity; N multiplies, nothing divides)

    return Proof(meta=meta, root=eproof.root, mat_r=mat_r, mat_z=mat_z,
                 queried_cols=queried, merkle_paths=eproof.merkle_paths)


# ---------------------------------------------------------------------------
# Reference-compatible InnerSum mode (rotation-tree inner products)
# ---------------------------------------------------------------------------

def prove_innersum_mode(
    prover: HomomorphicLigeroProver,
    point: int,
    transcript: Transcript,
    keyswitcher,
    galois_keys: dict,
    ctx: Span | None = None,
) -> EncryptedProof:
    """The reference's matrixInnerSumEval path (fhe/ligero.go:299-370):
    per-column ct x pt followed by an InnerSum rotation tree; the client
    then decodes SLOT 0 (decrypt_proof_innersum) instead of the constant
    coefficient. Needs the client's Galois keys
    (keyswitcher.galois_elements_for_inner_sum(rows)).

    The default rotation-free mode (prove()) is faster (DESIGN.md section
    4); this mode exists for API/semantics parity with the reference.
    """
    backend = prover.backend
    meta = prover.committer.meta
    field = prover.field
    rows, cols = meta.rows, meta.cols
    t = field.modulus

    r = np.array([x % t for x in transcript.sample_uints("r", rows)],
                 dtype=np.uint64)
    z_pow = pow(point, cols, t)
    b = _powers(field, z_pow, rows)

    lvl = prover.matrix_ct.level
    with start_span("InnerProduct(Matrix, r|b) [InnerSum]", ctx):
        enc = backend.encoder
        out = []
        for w in (r, b):
            pt = backend._ntt(enc.lift_to_rns(enc.encode(w), lvl), lvl)
            prod = backend.mul_plain_ntt(prover.matrix_ct, pt)
            summed = keyswitcher.inner_sum(prod, rows, galois_keys)
            out.append(backend.rescale_to(summed, 1))
        mat_r, mat_z = out

    transcript.append_field("point", point)

    with start_span("Query columns", ctx):
        ext_cols = cols * meta.rho_inv
        query_indices = sample_query_indices(transcript, meta.queries, ext_cols)
        sel = np.array(query_indices)
        queried = CtBatch(data=prover.encoded_lvl1.data[sel], level=1)
        q_scales = np.array(
            [int(prover.encoded_scales[i]) for i in query_indices],
            dtype=np.uint64)
        paths = [prover.tree.get_path(i) for i in query_indices]

    return EncryptedProof(
        meta=meta, root=prover.root, mat_r=mat_r, mat_z=mat_z,
        queried_cols=queried, queried_scales=q_scales,
        query_indices=query_indices, merkle_paths=paths)


def decrypt_proof_innersum(
    eproof: EncryptedProof,
    backend: BgvBackend,
    sk: SecretKey,
    ctx: Span | None = None,
) -> Proof:
    """Client decrypt for the InnerSum mode: MatR/MatZ from SLOT 0 (the
    reference's decode, fhe/ligero.go:436-487)."""
    meta = eproof.meta
    t = backend.t

    with start_span("Decrypt queried columns", ctx):
        vals = np.asarray(backend.decrypt_values(eproof.queried_cols, sk,
                                                 meta.rows))
        leaf_np = np.asarray(eproof.queried_cols.data)
        queried = []
        for i in range(vals.shape[0]):
            sigma_inv = pow(int(eproof.queried_scales[i]), t - 2, t)
            unscaled = (vals[i].astype(object) * sigma_inv) % t
            queried.append(QueriedColumn(
                values=np.array(unscaled.tolist(), dtype=np.uint64),
                leaf_bytes=ct_leaf_bytes(leaf_np, i)))

    with start_span("Decrypt row inner products", ctx):
        mat_r = np.asarray(backend.decrypt_values(eproof.mat_r, sk, 1))[:, 0]
        mat_z = np.asarray(backend.decrypt_values(eproof.mat_z, sk, 1))[:, 0]

    return Proof(meta=meta, root=eproof.root, mat_r=mat_r, mat_z=mat_z,
                 queried_cols=queried, merkle_paths=eproof.merkle_paths)
