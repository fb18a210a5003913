"""ctypes bindings for the native host-side resampling kernels.

Compiles csrc/resampling.cpp on first use (cached under build/) and exposes
NumPy-facing resamplers with the same distributional contracts as the
device kernels in ops/resampling.py. The native layer mirrors the role of
the reference's Rcpp module (/root/reference/src/resampling.cpp) for
host-side tooling; the RNG stays in NumPy so the kernels are deterministic
transforms of caller-supplied uniforms.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess
import threading

import numpy as np

__all__ = [
    "host_resample_multinomial",
    "host_resample_stratified",
    "host_resample_systematic",
    "native_available",
]

_REPO = pathlib.Path(__file__).resolve().parents[2]
_SRC = _REPO / "csrc" / "resampling.cpp"
_SO = _REPO / "build" / "libbssm_host.so"
_lock = threading.Lock()
_lib = None
_load_error = None


def _load():
    global _lib, _load_error
    with _lock:
        if _lib is not None or _load_error is not None:
            return _lib
        try:
            if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
                _SO.parent.mkdir(parents=True, exist_ok=True)
                subprocess.run(
                    [
                        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                        str(_SRC), "-o", str(_SO),
                    ],
                    check=True, capture_output=True,
                )
            lib = ctypes.CDLL(str(_SO))
            dp = ctypes.POINTER(ctypes.c_double)
            ip = ctypes.POINTER(ctypes.c_int32)
            lib.bssm_resample_systematic.argtypes = [
                ctypes.c_int64, dp, ctypes.c_double, ip,
            ]
            lib.bssm_resample_stratified.argtypes = [
                ctypes.c_int64, dp, dp, ip,
            ]
            lib.bssm_resample_multinomial.argtypes = [
                ctypes.c_int64, dp, dp, ip,
            ]
            for f in (
                lib.bssm_resample_systematic,
                lib.bssm_resample_stratified,
                lib.bssm_resample_multinomial,
            ):
                f.restype = ctypes.c_int
            _lib = lib
        except Exception as exc:  # pragma: no cover
            _load_error = exc
        return _lib


def native_available() -> bool:
    return _load() is not None


_ERRORS = {
    1: "weights must be non-negative",
    2: "weights must have a positive sum",
}


def _check(rc: int) -> None:
    if rc != 0:
        raise ValueError(_ERRORS.get(rc, f"native resampling error {rc}"))


def _as_weights(weights) -> np.ndarray:
    w = np.ascontiguousarray(np.asarray(weights, dtype=np.float64))
    if w.ndim != 1:
        raise ValueError("weights must be 1-D")
    return w


def host_resample_systematic(weights, rng: np.random.Generator) -> np.ndarray:
    """Systematic ancestor indices (0-based int32)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_load_error}")
    w = _as_weights(weights)
    n = w.shape[0]
    out = np.empty(n, dtype=np.int32)
    rc = lib.bssm_resample_systematic(
        n,
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        float(rng.uniform()),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    _check(rc)
    return out


def _uniform_variant(fn_name):
    def impl(weights, rng: np.random.Generator) -> np.ndarray:
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native library unavailable: {_load_error}")
        w = _as_weights(weights)
        n = w.shape[0]
        u = np.ascontiguousarray(rng.uniform(size=n))
        out = np.empty(n, dtype=np.int32)
        rc = getattr(lib, fn_name)(
            n,
            w.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            u.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        _check(rc)
        return out

    impl.__name__ = fn_name
    return impl


host_resample_stratified = _uniform_variant("bssm_resample_stratified")
host_resample_multinomial = _uniform_variant("bssm_resample_multinomial")
