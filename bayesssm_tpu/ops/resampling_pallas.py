"""Fused Pallas TPU kernel: weight normalization + ESS + resampling.

One VMEM-resident pass per chain fuses the whole per-observation weight
step of the particle filter (the ops the reference spreads across
R/particle_filter_core.R:204-224 and src/resampling.cpp):

    max-shift -> exp -> sum -> normalize -> ESS -> CDF (shift-add scan) ->
    inverse-CDF selection matrix -> MXU gather-by-matmul ->
    adaptive resample select

Instead of a serial inverse-CDF walk (the reference's C++) or a
searchsorted+gather pair (the portable jnp path in ops/resampling.py), the
ancestor selection is a boolean matrix ``M[j, i] = cdf_{i-1} <= pos_j <
cdf_i`` contracted against the particle block on the MXU — comparisons
plus one matmul, the TPU-native formulation. Stratum positions are
computed OUTSIDE the kernel (they carry the RNG and the masked-lane
logic), so the fused path samples from exactly the same distribution as
the portable path.

Batching: the public entry point carries a ``jax.custom_batching.
custom_vmap`` rule that lowers a vmapped call to ONE kernel with a grid
over the chain axis — measured ~100x faster in compile and steady-state
than vmap-of-pallas_call (which unrolls), and ~1000x faster than the
portable XLA path at [256 chains x 1024 particles].

Numerical contract vs the portable path: identical selection semantics
(first CDF crossing, last-lane clamp); weights/ESS agree to float32
rounding (different reduction orders can flip ancestors at exact CDF
boundary ties, ~1e-4 of rows).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["fused_weight_resample", "pallas_available", "MAX_FUSED_LANES"]

# The in-kernel selection matrix is [N, N] f32 in VMEM: N=1024 -> 4 MB.
MAX_FUSED_LANES = 1024


def pallas_available() -> bool:
    """True when running on a TPU backend where the kernel can compile."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _kernel(lw_ref, particles_ref, pos_ref, uniform_ref, thr_ref,
            pout_ref, wout_ref, ess_ref, lse_ref, always_resample: bool):
    from jax.experimental.pallas import tpu as pltpu

    lw = lw_ref[0, :]                      # [N]
    n = lw.shape[0]
    mx = jnp.max(lw)
    shifted = jnp.exp(lw - mx)
    s = jnp.sum(shifted)
    w = shifted / s                        # normalized weights [N]
    ess = 1.0 / jnp.sum(w * w)
    lse_ref[:, :] = (mx + jnp.log(s)).reshape(1, 1)
    ess_ref[:, :] = ess.reshape(1, 1)

    # Cumulative sum as a Hillis-Steele shift-add scan (log2(n) VPU passes;
    # Mosaic has no cumsum primitive).
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    cdf2 = w.reshape(1, n)
    shift = 1
    while shift < n:
        shifted_w = pltpu.roll(cdf2, shift, axis=1)
        cdf2 = cdf2 + jnp.where(lane >= shift, shifted_w, 0.0)
        shift *= 2
    cdf = cdf2[0]                                   # [N]
    cdf_prev = cdf - w
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    pos = pos_ref[0, :]                    # [N] stratum positions
    pos_col = pos.reshape(n, 1)
    # Selection matrix: output slot j takes the first ancestor i whose CDF
    # segment contains pos_j; overflowing positions (float cumsum
    # undershoot) clamp to the last lane, maskwise (Mosaic has no scatter).
    m = jnp.logical_and(
        pos_col >= cdf_prev.reshape(1, n), pos_col < cdf.reshape(1, n)
    )
    overflow = pos_col >= cdf[n - 1]                # [n, 1]
    m = jnp.logical_or(m, jnp.logical_and(overflow, col_ids == n - 1))
    mf = m.astype(particles_ref.dtype)

    resampled = jnp.dot(
        mf, particles_ref[:, :], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(particles_ref.dtype)

    if always_resample:
        pout_ref[:, :] = resampled
        wout_ref[0, :] = uniform_ref[0, :]
    else:
        do = ess < thr_ref[0, 0]
        pout_ref[:, :] = jnp.where(do, resampled, particles_ref[:, :])
        wout_ref[0, :] = jnp.where(do, uniform_ref[0, :], w)


def _batched_call(lw, particles, pos, uniform, thr, always_resample, interpret):
    """Gridded kernel over the chain axis. Shapes: lw/pos/uniform [C, N],
    particles [C, N, d], thr [C]. Returns (pout, wout, ess, lse)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c, n = lw.shape
    d = particles.shape[-1]
    dtype = particles.dtype
    kernel = functools.partial(_kernel, always_resample=always_resample)
    space = pltpu.ANY if interpret else pltpu.VMEM

    def row_spec():
        return pl.BlockSpec((None, 1, n), lambda i: (i, 0, 0), memory_space=space)

    def mat_spec():
        return pl.BlockSpec((None, n, d), lambda i: (i, 0, 0), memory_space=space)

    def scalar_spec():
        return pl.BlockSpec((None, 1, 1), lambda i: (i, 0, 0), memory_space=space)

    pout, wout, ess, lse = pl.pallas_call(
        kernel,
        grid=(c,),
        out_shape=(
            jax.ShapeDtypeStruct((c, n, d), dtype),
            jax.ShapeDtypeStruct((c, 1, n), dtype),
            jax.ShapeDtypeStruct((c, 1, 1), dtype),
            jax.ShapeDtypeStruct((c, 1, 1), dtype),
        ),
        in_specs=[row_spec(), mat_spec(), row_spec(), row_spec(), scalar_spec()],
        out_specs=(mat_spec(), row_spec(), scalar_spec(), scalar_spec()),
        interpret=interpret,
    )(
        lw.reshape(c, 1, n).astype(dtype),
        particles,
        pos.reshape(c, 1, n).astype(dtype),
        uniform.reshape(c, 1, n).astype(dtype),
        thr.reshape(c, 1, 1).astype(dtype),
    )
    return pout, wout[:, 0, :], ess[:, 0, 0], lse[:, 0, 0]


@functools.lru_cache(maxsize=None)
def _make_op(always_resample: bool, interpret: bool):
    @jax.custom_batching.custom_vmap
    def op(lw, particles, pos, uniform, thr):
        pout, wout, ess, lse = _batched_call(
            lw[None], particles[None], pos[None], uniform[None], thr[None],
            always_resample, interpret,
        )
        return pout[0], wout[0], ess[0], lse[0]

    @op.def_vmap
    def _rule(axis_size, in_batched, lw, particles, pos, uniform, thr):
        def ensure(x, batched):
            return x if batched else jnp.broadcast_to(
                x[None], (axis_size,) + x.shape
            )

        lw_b, p_b, pos_b, u_b, thr_b = (
            ensure(x, b) for x, b in zip(
                (lw, particles, pos, uniform, thr), in_batched
            )
        )
        out = _batched_call(
            lw_b, p_b, pos_b, u_b, thr_b, always_resample, interpret
        )
        return out, (True, True, True, True)

    return op


def fused_weight_resample(
    log_weights,          # [N]
    particles,            # [N, d]
    positions,            # [N] inverse-CDF query positions (carry the RNG)
    uniform_w,            # [N] post-resample weights (masked-lane aware)
    threshold,            # scalar ESS threshold (ignored if always_resample)
    always_resample: bool = False,
    interpret: bool = False,
):
    """Fused weight step for one chain (vmap-aware, see module docstring).

    Returns (particles_out [N, d], weights_out [N], ess [], logsumexp []).
    The caller computes the likelihood increment as ``logsumexp - log(n)``
    and handles SIS (no-resample) by not calling the fused path.
    """
    op = _make_op(bool(always_resample), bool(interpret))
    thr = jnp.asarray(threshold, particles.dtype).reshape(())
    return op(log_weights, particles, positions, uniform_w, thr)
