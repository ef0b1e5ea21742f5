"""Build + load the native shared library (ctypes).

g++ -O3 -march=native -fopenmp; artifacts cached next to the sources.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB = os.path.join(_HERE, "liblumenos_native.so")
_LOCK = threading.Lock()
_handle = None


def _build() -> None:
    srcs = [os.path.join(_HERE, "merkle.cpp"), os.path.join(_HERE, "lnp_ring.cpp"), os.path.join(_HERE, "abdlop.cpp")]
    cmd = ["g++", "-O3", "-march=native", "-fopenmp", "-fPIC", "-shared",
           "-o", _LIB, *srcs]
    subprocess.run(cmd, check=True, capture_output=True)


def load_native() -> ctypes.CDLL | None:
    """Returns the loaded library, building if needed; None on failure."""
    global _handle
    with _LOCK:
        if _handle is not None:
            return _handle
        try:
            need = not os.path.exists(_LIB)
            if not need:
                src_m = max(os.path.getmtime(os.path.join(_HERE, f))
                            for f in os.listdir(_HERE) if f.endswith(".cpp"))
                need = src_m > os.path.getmtime(_LIB)
            if need:
                _build()
            lib = ctypes.CDLL(_LIB)
            lib.merkle_leaf_hashes.argtypes = [
                ctypes.c_void_p, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_void_p]
            lib.merkle_fold_level.argtypes = [
                ctypes.c_void_p, ctypes.c_uint64, ctypes.c_void_p]
            lib.lnp_ring_new.argtypes = [ctypes.c_void_p, ctypes.c_int]
            lib.lnp_ring_new.restype = ctypes.c_void_p
            lib.lnp_ring_free.argtypes = [ctypes.c_void_p]
            lib.lnp_ring_degree.restype = ctypes.c_int
            lib.lnp_polyvec_mul.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p]*3 + [ctypes.c_uint64]
            lib.lnp_polymat_mul_vec.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p]*3 + [ctypes.c_uint64]*2
            lib.lnp_expand_uniform.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_uint64, ctypes.c_void_p, ctypes.c_uint64]
            lib.lnp_sample_ternary.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_uint64, ctypes.c_void_p, ctypes.c_uint64]
            lib.lnp_sample_gauss.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_uint64, ctypes.c_double, ctypes.c_void_p, ctypes.c_uint64]
            lib.lnp_rej_bimodal.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64, ctypes.c_double, ctypes.c_double]
            lib.lnp_rej_bimodal.restype = ctypes.c_int
            lib.lnp_shake128.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int]
            _strobe3 = [ctypes.c_void_p,
                        ctypes.POINTER(ctypes.c_int64),
                        ctypes.POINTER(ctypes.c_int64)]
            lib.strobe_run_f.argtypes = _strobe3
            lib.strobe_absorb.argtypes = _strobe3 + [ctypes.c_void_p, ctypes.c_int64]
            lib.strobe_overwrite.argtypes = _strobe3 + [ctypes.c_void_p, ctypes.c_int64]
            lib.strobe_squeeze.argtypes = _strobe3 + [ctypes.c_void_p, ctypes.c_int64]
            lib.abdlop_lift.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64]
            lib.abdlop_challenge.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_void_p]
            lib.abdlop_add.argtypes = [ctypes.c_void_p, ctypes.c_int] + [ctypes.c_void_p]*3 + [ctypes.c_uint64]
            lib.abdlop_sub.argtypes = [ctypes.c_void_p, ctypes.c_int] + [ctypes.c_void_p]*3 + [ctypes.c_uint64]
            lib.abdlop_mask_add.argtypes = [ctypes.c_void_p]*4 + [ctypes.c_uint64]
            lib.abdlop_norm2.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
            lib.abdlop_norm2.restype = ctypes.c_double
            lib.abdlop_norm_inf.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
            lib.abdlop_norm_inf.restype = ctypes.c_int64
            lib.lnp_auto.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                     ctypes.c_void_p, ctypes.c_void_p,
                                     ctypes.c_uint64]
            lib.lnp_auto_signed.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                            ctypes.c_uint64]
            lib.lnp_quad_challenge.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                               ctypes.c_int, ctypes.c_void_p]
            lib.lnp_expand_R_row.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                             ctypes.c_uint64, ctypes.c_void_p,
                                             ctypes.c_uint64]
            lib.lnp_project.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                        ctypes.c_void_p, ctypes.c_uint64,
                                        ctypes.c_void_p]
            lib.lnp_vR.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                   ctypes.c_void_p, ctypes.c_int,
                                   ctypes.c_void_p, ctypes.c_uint64,
                                   ctypes.c_void_p]
            lib.pod_big_conv.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                         ctypes.c_uint32] + \
                [ctypes.c_void_p] * 3
            lib.pod_statement_noise.argtypes = [
                ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint32] + \
                [ctypes.c_void_p] * 10
            lib.gbfv_statement_noise.argtypes = [
                ctypes.c_uint64, ctypes.c_uint64] + [ctypes.c_void_p] * 10
            _handle = lib
            return lib
        except Exception:
            return None
