"""BGV/BFV RNS engine + homomorphic Ligero protocol (TPU-native).

Counterpart of the reference's fhe/ package and the slice of lattigo v6 it
consumes (SURVEY.md section 2.3). Ciphertexts are dense uint64 tensors
``[n_cts, 2, n_limbs, N]``; every evaluator operation is a batched JAX
program over the whole ciphertext vector at once (the reference loops over
Go ciphertext objects with worker pools - here the batch axis IS the
parallel axis, shardable over a device mesh).
"""

from .params import BgvParams, generate_bgv_params_for_ntt

__all__ = ["BgvParams", "generate_bgv_params_for_ntt"]
