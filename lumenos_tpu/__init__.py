"""lumenos-tpu: a TPU-native FHE-SNARK framework for Private Proof Delegation.

A from-scratch reimplementation of the capabilities of ChainSafe/lumenos
(homomorphic Ligero polynomial commitments over BGV/BFV, verifiable
decryption, ring switching) designed TPU-first:

- Ciphertexts are dense integer tensors ``[n_cts, 2, n_limbs, N]`` over RNS
  limbs; all homomorphic ops are batched JAX/XLA programs (Pallas kernels on
  the hot paths).
- 57-62 bit modular arithmetic is emulated in 32-bit lanes (hi/lo u32 pairs).
- Multi-chip scaling shards the ciphertext axis over a ``jax.sharding.Mesh``;
  the homomorphic NTT's six-step transposes become all-to-alls over ICI.
- Host-side (Python/C++): SHA-256 Merkle commitments, the merlin/STROBE-128
  Fiat-Shamir transcript, serialization, the HTTP demo pair, and the lattice
  proof-of-decryption prover.

Layer map mirrors the reference (see SURVEY.md section 1):
  core/  - plaintext crypto: prime field, NTT, RS-code, Merkle, transcript
  fhe/   - BGV/BFV RNS engine + homomorphic Ligero protocol
  vdec/  - verifiable decryption (RLC batching + LNP proof-of-decryption)
  parallel/ - device-mesh sharding of the ciphertext axis
  ops/   - Pallas TPU kernels for modular arithmetic and NTT stages
"""

__version__ = "0.1.0"
