"""Verifiable decryption (PoD): RLC batching + LNP proof-of-decryption.

Counterpart of the reference's vdec/ package (SURVEY.md G16-G17, C1-C8):
compress the ~309 queried-column ciphertexts into ONE via random linear
combination, then prove correct decryption of that single ciphertext with
a lattice zero-knowledge proof (ABDLOP/LNP, host-side native prover).
"""

from .batching import batch_columns, batch_ciphertexts

__all__ = ["batch_columns", "batch_ciphertexts"]
