"""Chain checkpoint/resume.

The reference keeps chains in memory and returns them at the end
(/root/reference/R/pmmh.R:501-504) — no persistence. For long multi-host
runs with thousands of chains this framework periodically offloads the
sampler state (PRNG keys, current theta/loglike, collected samples) to a
host-side .npz snapshot so a preempted run resumes exactly where it
stopped (SURVEY.md §5 "checkpoint/resume").
"""

from __future__ import annotations

import pathlib

import numpy as np

import jax

__all__ = ["save_checkpoint", "load_checkpoint"]

_FORMAT_VERSION = 1


def save_checkpoint(path, *, keys, theta, loglike, state_est, samples,
                    state_samples=None, step: int, meta: dict | None = None):
    """Atomically write a sampler snapshot.

    ``keys`` are jax typed PRNG keys ([C]); everything else is array-like.
    ``samples``: [C, step, P] theta samples collected so far.
    """
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    # Per-process tmp name: on a multi-controller (process-spanning) run
    # every process writes the SAME full snapshot (the driver allgathers
    # state to the host first) — distinct tmp files keep concurrent
    # writers off each other's partial files on a shared filesystem, and
    # the atomic renames are idempotent (identical content, last wins);
    # on separate per-host filesystems each host simply keeps its own
    # copy so any surviving host can resume.
    tmp = path.with_suffix(
        path.suffix + f".tmp{jax.process_index()}"
    )
    payload = {
        "format_version": np.asarray(_FORMAT_VERSION),
        "key_data": np.asarray(jax.random.key_data(keys)),
        "theta": np.asarray(theta),
        "loglike": np.asarray(loglike),
        "state_est": np.asarray(state_est),
        "samples": np.asarray(samples),
        "step": np.asarray(step),
    }
    if state_samples is not None:
        payload["state_samples"] = np.asarray(state_samples)
    for k, v in (meta or {}).items():
        payload[f"meta_{k}"] = np.asarray(v)
    with open(tmp, "wb") as f:
        np.savez(f, **payload)
    tmp.replace(path)


def load_checkpoint(path):
    """Load a snapshot; returns a dict with typed keys restored."""
    data = dict(np.load(pathlib.Path(path), allow_pickle=False))
    version = int(data.pop("format_version"))
    if version != _FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version {version}")
    out = {
        "keys": jax.random.wrap_key_data(data.pop("key_data")),
        "step": int(data.pop("step")),
    }
    meta = {}
    for k in list(data):
        if k.startswith("meta_"):
            meta[k[len("meta_"):]] = data.pop(k)
    out["meta"] = meta
    out.update(data)
    return out
