"""Fused Pallas TPU kernel: weight normalization + ESS + resampling.

One VMEM-resident pass per chain fuses the whole per-observation weight
step of the particle filter (the ops the reference spreads across
R/particle_filter_core.R:204-224 and src/resampling.cpp):

    max-shift -> exp -> sum -> normalize -> ESS -> CDF (shift-add scan) ->
    inverse-CDF selection matrix -> masked-reduce gather ->
    adaptive resample select

Instead of a serial inverse-CDF walk (the reference's C++) or a
searchsorted+gather pair (the portable jnp path in ops/resampling.py), the
ancestor selection is a boolean matrix ``M[j, i] = cdf_{i-1} <= pos_j <
cdf_i`` reduced against the particle block on the VPU (each row selects
exactly one ancestor, so the masked sum is exact in f32) — the
gather-free TPU-native formulation, and it batches chains per grid
program with no per-batch unroll. Stratum positions are
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

__all__ = [
    "fused_weight_resample",
    "fused_weight_resample_seeded",
    "pallas_available",
    "MAX_FUSED_LANES",
]

# The in-kernel selection matrix is [N, N] f32 in VMEM: N=1024 -> 4 MB.
MAX_FUSED_LANES = 1024


def pallas_available() -> bool:
    """True when running on a TPU backend where the kernel can compile."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def _kernel(lw_ref, *rest, always_resample: bool, d: int,
            method: str | None, software_prng: bool,
            selection: str = "quadratic"):
    """Blocked kernel: each grid program handles B chains at once.

    Every ref is 2-D [B, N] (thr/ess/lse are [B, 1]): the d state columns
    arrive as SEPARATE inputs rather than one [B, N, d] array, because a
    trailing dim of 2-3 forces Mosaic's (8, 128) tiling to pad the minor
    axis and XLA to insert relayout copies + pads at the kernel boundary
    (measured ~23 ms/sweep at [4096 x 128 x 2], ~40% of the whole filter).

    Two position modes:
      * ``method is None`` — inverse-CDF query positions are an input
        (``pos_ref``), computed outside with the caller's RNG: the strict
        same-stream parity mode. ``rest`` = pos, uniform, thr, d column
        inputs, then outputs.
      * ``method`` set — positions are drawn IN-KERNEL from the hardware
        PRNG (software lowbias32 stream under the interpreter), removing
        the per-step host threefry + operand traffic: the fast mode.
        ``rest`` = bseed (whole [g, 2], SMEM), sd0, sd1 ([B, 1] int32
        per-chain seed words), alive ([B, 1] f32), uniform, thr, columns.
        Block seeding and the per-chain XOR mix follow
        ops/sir_sweep_pallas.py exactly.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import numpy as np

    if method is None:
        pos_ref, uniform_ref, thr_ref = rest[:3]
        rest = rest[3:]
    else:
        bseed_ref, sd0_ref, sd1_ref, alive_ref, uniform_ref, thr_ref = (
            rest[:6]
        )
        rest = rest[6:]
    col_refs = rest[:d]
    pout_refs = rest[d : 2 * d]
    wout_ref, ess_ref, lse_ref = rest[2 * d :]

    lw = lw_ref[:, :]                      # [B, N]
    b, n = lw.shape
    mx = jnp.max(lw, axis=-1, keepdims=True)          # [B, 1]
    shifted = jnp.exp(lw - mx)
    s = jnp.sum(shifted, axis=-1, keepdims=True)      # [B, 1]
    w = shifted / s                                   # normalized [B, N]
    ess = 1.0 / jnp.sum(w * w, axis=-1, keepdims=True)
    lse_ref[:, :] = mx + jnp.log(s)
    ess_ref[:, :] = ess

    # Cumulative sum along lanes as a Hillis-Steele shift-add scan
    # (log2(n) VPU passes; Mosaic has no cumsum primitive).
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
    cdf = w
    shift = 1
    while shift < n:
        rolled = pltpu.roll(cdf, shift, axis=1)
        cdf = cdf + jnp.where(lane >= shift, rolled, 0.0)
        shift *= 2
    # A parallel-scan f32 CDF is NOT monotone: each lane's prefix sums a
    # different reduction tree, so cdf_i can dip below cdf_{i-1} by a ULP —
    # a position inside such a wiggle matches TWO buckets (doubled masked
    # sum). A running-max scan (same shift pattern, max instead of add;
    # identity 0 since cdf >= 0) restores monotonicity at ULP cost.
    shift = 1
    while shift < n:
        rolled = pltpu.roll(cdf, shift, axis=1)
        cdf = jnp.maximum(cdf, jnp.where(lane >= shift, rolled, 0.0))
        shift *= 2
    # Bucket lower edges from the SCAN ITSELF (roll by one), not cdf - w:
    # an f32 recomputation differs from cdf_{i-1} by ~1 ULP on ~half the
    # lanes, leaving gaps (a position matches NO lane -> zero particle) and
    # overlaps (TWO lanes -> doubled masked-sum). Monotone CDF + shared
    # exact edges guarantee exactly one match per position.
    cdf_prev = jnp.where(lane == 0, 0.0, pltpu.roll(cdf, 1, axis=1))
    if method is None:
        pos = pos_ref[:, :]                           # [B, N]
    else:
        # In-kernel stratum positions (ops/resampling.py::_positions
        # semantics): hardware PRNG seeded from the block's first chain +
        # program id, each chain's OWN seed words XOR-mixed into its
        # lanes' bits (the ops/sir_sweep_pallas.py convention).
        from bayesssm_tpu.ops.gillespie_pallas import _hash32

        inv24 = np.float32(1.0 / (1 << 24))
        seed0 = bseed_ref[pl.program_id(0), 0]
        seed1 = bseed_ref[pl.program_id(0), 1]
        sd0 = sd0_ref[:, :]                           # [B, 1] int32
        sd1 = sd1_ref[:, :]
        rmix = sd0 ^ (sd1 * jnp.int32(-1640531527) + jnp.int32(1))
        rmix = rmix ^ ((rmix >> 16) & jnp.int32(0x0000FFFF))
        rmix = rmix * jnp.int32(0x7FEB352D)
        rmix = rmix ^ ((rmix >> 15) & jnp.int32(0x0001FFFF))
        rmix = rmix * jnp.int32(-2073254261)          # 0x846CA68B
        row_mix = jnp.broadcast_to(rmix, (b, n))
        if software_prng:
            pid = jax.lax.convert_element_type(pl.program_id(0), jnp.uint32)
            s0w = jax.lax.convert_element_type(seed0, jnp.uint32)
            s1w = jax.lax.convert_element_type(seed1, jnp.uint32)
            base = _hash32(s0w ^ _hash32(s1w ^ _hash32(pid)))
            lane_id = jax.lax.convert_element_type(lane, jnp.uint32)
            rm = jax.lax.convert_element_type(row_mix, jnp.uint32)
            bits = _hash32(
                (base + lane_id * jnp.uint32(0x9E3779B9)) ^ rm
            )
            u24 = (bits >> jnp.uint32(8)).astype(jnp.int32)
        else:
            pid = pl.program_id(0)
            s0_mix = seed0 ^ (pid * jnp.int32(-1640531527) + jnp.int32(1))
            pltpu.prng_seed(s0_mix, seed1)
            raw = pltpu.prng_random_bits((b, n))
            u24 = ((raw ^ row_mix) >> 8) & jnp.int32(0x00FFFFFF)
        u = u24.astype(jnp.float32) * inv24
        lane_f = lane.astype(jnp.float32)
        alive_ct = alive_ref[:, :]                    # [B, 1] f32
        if method == "stratified":
            pos = (lane_f + u) / alive_ct
        elif method == "systematic":
            u0 = jnp.max(jnp.where(lane == 0, u, 0.0), axis=-1,
                         keepdims=True)
            pos = (lane_f + u0) / alive_ct
        else:  # multinomial
            pos = u
        pos = jnp.where(lane_f < alive_ct, pos, 1.0)
    # Selection matrix per chain: output slot j takes the first ancestor i
    # whose CDF segment contains pos_j. Extending the last ALIVE lane's
    # segment to [cdf_prev, +inf) subsumes the overshoot clamp for
    # positions past the float-cumsum total, matching resample_indices'
    # clip-to-last-alive (ops/resampling.py): alive lanes are exactly those
    # with positive post-resample uniform weight, masked lanes' buckets are
    # zero-width [cdf, cdf) and never match. Broadcasts are materialized one
    # axis at a time — Mosaic cannot broadcast sublanes and lanes at once.
    alive_lane = uniform_ref[:, :] > 0.0
    last_alive = jnp.max(
        jnp.where(alive_lane, lane, 0), axis=-1, keepdims=True
    )
    if selection == "merge":
        # O(N log N) bitonic-merge selection (ops/merge_select.py): all
        # d state columns route through ONE shared key network. Pinning
        # the finite sentinel from the last alive lane on reproduces the
        # quadratic branch's clamp semantics exactly (masked output
        # slots' pos = 1.0 < 1.5 select the last alive ancestor).
        from bayesssm_tpu.ops.merge_select import (
            merge_select_cols,
            resolve_carries,
        )

        def roll(x, shift, axis=1):
            return pltpu.roll(x, shift, axis=axis)

        cdf_ext = jnp.where(lane >= last_alive, np.float32(1.5), cdf)
        cols_in = [ref[:, :] for ref in col_refs]
        carries = tuple(
            resolve_carries(
                cdf_ext, pltpu.roll(ci, n - 1, axis=1), lane, roll
            )
            for ci in cols_in
        )
        v0s = tuple(
            jnp.sum(jnp.where(lane == 0, ci, 0.0), axis=-1, keepdims=True)
            for ci in cols_in
        )
        merge_cols = merge_select_cols(
            cdf_ext, pos, carries, v0s, lane, roll
        )
        m = None
    else:
        merge_cols = None
        cdf_ext = jnp.where(lane == last_alive, jnp.inf, cdf)
        shape3 = (b, n, n)
        pos_b = jnp.broadcast_to(pos[:, :, None], shape3)        # lanes
        cdf_b = jnp.broadcast_to(cdf_ext[:, None, :], shape3)    # sublanes
        cdf_prev_b = jnp.broadcast_to(cdf_prev[:, None, :], shape3)
        m = jnp.logical_and(pos_b >= cdf_prev_b, pos_b < cdf_b)  # [B, N, N]
    # Gather-by-selection as a VPU masked reduce, one state column at a
    # time: resampled[b, j, k] = sum_i m[b, j, i] * p_k[b, i]. Each row of
    # ``m`` selects exactly one ancestor, so the sum has a single nonzero
    # term and is EXACT in f32 (no MXU precision caveats). Unlike the
    # earlier per-chain HIGHEST-precision dot_general (which Mosaic
    # unrolled per batch element, exploding compile time), this form
    # batches over chains, letting one grid program process B chains —
    # grid count drops from C to C/B, which is where the time went
    # (measured 7.7 ms -> sub-ms at [4096 x 128], see scripts/profile_fused.py).
    if always_resample:
        do_rows = None
        wout_ref[:, :] = uniform_ref[:, :]
    else:
        do = ess < thr_ref[:, :]                      # [B, 1]
        do_rows = jnp.broadcast_to(do, (b, n))        # one axis at a time
        wout_ref[:, :] = jnp.where(do_rows, uniform_ref[:, :], w)
    for k in range(d):
        col = col_refs[k][:, :]                       # [B, N] (ancestor axis)
        if merge_cols is not None:
            resampled_k = merge_cols[k]
        else:
            col_b = jnp.broadcast_to(col[:, None, :], shape3)
            resampled_k = jnp.sum(
                jnp.where(m, col_b, jnp.zeros_like(col_b)), axis=2
            )                                         # [B, N]
        if always_resample:
            pout_refs[k][:, :] = resampled_k
        else:
            pout_refs[k][:, :] = jnp.where(do_rows, resampled_k, col)


# VMEM budget (bytes) for one in-kernel [B, N, N] f32-sized intermediate;
# sets how many chains one grid program processes. The kernel holds a few
# such arrays live (selection mask, broadcast operand, product), so this
# must stay well under the 16 MB VMEM limit divided by that count. The
# masked-reduce gather batches cleanly (no per-batch-element unroll, unlike
# the dot_general it replaced), so B > 1 is the fast path: per-grid-program
# overhead was the dominant cost at [4096 chains x 128 particles].
# (B=64 at N=128 overflowed the 16 MB scoped-vmem limit by 64 KB — the
# mask, broadcast operand, and product each materialize one of these.)
_SELECTION_VMEM_BUDGET = 2 * 1024 * 1024
# Chain-block cap for merge-selection mode: the merge network holds no
# [B, N, N] intermediate, so blocks can exceed the quadratic path's
# budget-derived size. Round-4 per-day-path measurement at the bench
# shape (bench.py --transition gillespie_pallas): cap 32 -> 317.9k
# samples/s, 128 -> 402.2k, 256 -> 401.7k (wash); 128 keeps VMEM
# headroom for models with more state columns.
_MERGE_BLOCK_CAP = 128


def _chains_per_program(c: int, n: int, selection: str = "quadratic") -> int:
    if selection == "merge":
        # No [B, N, N] intermediate: ~log2(2N) recorded swap masks plus
        # working columns (per state column), all [B, 2N].
        stages = (2 * n - 1).bit_length()
        per_chain = 2 * n * 4 * (stages + 6)
        b = max(
            1,
            min(c, _MERGE_BLOCK_CAP,
                _SELECTION_VMEM_BUDGET // per_chain or 1),
        )
    else:
        b = max(1, min(c, _SELECTION_VMEM_BUDGET // (n * n * 4) or 1))
    return 1 << (b.bit_length() - 1)


def _batched_call(lw, particles, pos, uniform, thr, always_resample,
                  interpret, seeds=None, num_alive=None, method=None,
                  selection="quadratic"):
    """Gridded kernel over chain blocks. Shapes: lw/pos/uniform [C, N],
    particles [C, N, d], thr [C]. Returns (pout, wout, ess, lse).

    The [C, N, d] particle array is split into d separate [C, N] columns at
    the kernel boundary: every operand is then 2-D with N minor, matching
    the TPU's (8, 128) tile exactly, so the (g, b, n) block reshape is a
    free contiguous view and XLA inserts no relayout copies (a [C, N, 2]
    operand cost ~23 ms/sweep in copies+pads at the benchmark shape).

    ``method`` set switches to in-kernel position drawing: ``pos`` is
    ignored and ``seeds`` [C, 2] int32 / ``num_alive`` [C] supply the RNG
    and the masked-lane semantics instead.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c, n = lw.shape
    d = particles.shape[-1]
    dtype = particles.dtype
    cols = [particles[:, :, k] for k in range(d)]

    b = _chains_per_program(c, n, selection)
    g = -(-c // b)
    pad = g * b - c
    if pad:
        def padc(x):
            return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))

        lw, uniform, thr = map(padc, (lw, uniform, thr))
        cols = [padc(x) for x in cols]
        if method is None:
            pos = padc(pos)
        else:
            seeds = padc(seeds)
            num_alive = jnp.pad(num_alive, (0, pad), constant_values=1.0)

    kernel = functools.partial(
        _kernel, always_resample=always_resample, d=d, method=method,
        software_prng=bool(interpret), selection=selection,
    )
    space = pl.ANY if interpret else pltpu.VMEM
    smem = pl.ANY if interpret else pltpu.SMEM

    def spec(*dims):
        # Leading None = grid-mapped chain-block dim; the remaining dims
        # cover the whole trailing array shape (satisfies Mosaic's tiling
        # rule for any block size).
        return pl.BlockSpec(
            (None,) + dims, lambda i: (i,) + (0,) * len(dims),
            memory_space=space,
        )

    if method is None:
        mode_specs = [spec(b, n)]
        mode_args = [pos.astype(dtype).reshape(g, b, n)]
    else:
        # Block seeds ride along whole in SMEM (a grid-blocked (None, 2)
        # spec breaks Mosaic's divisibility rule); per-chain seed words
        # and alive counts are regular [B, 1] blocks.
        mode_specs = [
            pl.BlockSpec((g, 2), lambda i: (0, 0), memory_space=smem),
            spec(b, 1), spec(b, 1), spec(b, 1),
        ]
        mode_args = [
            seeds.reshape(g, b, 2)[:, 0, :],
            seeds[:, 0].reshape(g, b, 1),
            seeds[:, 1].reshape(g, b, 1),
            num_alive.astype(dtype).reshape(g, b, 1),
        ]

    out = pl.pallas_call(
        kernel,
        grid=(g,),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((g, b, n), dtype) for _ in range(d)]
        ) + (
            jax.ShapeDtypeStruct((g, b, n), dtype),
            jax.ShapeDtypeStruct((g, b, 1), dtype),
            jax.ShapeDtypeStruct((g, b, 1), dtype),
        ),
        in_specs=[spec(b, n)] + mode_specs + [spec(b, n), spec(b, 1)]
        + [spec(b, n)] * d,
        out_specs=tuple([spec(b, n)] * (d + 1)) + (spec(b, 1), spec(b, 1)),
        interpret=interpret,
    )(
        lw.astype(dtype).reshape(g, b, n),
        *mode_args,
        uniform.astype(dtype).reshape(g, b, n),
        thr.astype(dtype).reshape(g, b, 1),
        *[x.reshape(g, b, n) for x in cols],
    )
    pcols = out[:d]
    wout, ess, lse = out[d], out[d + 1], out[d + 2]
    pout = jnp.stack(
        [x.reshape(g * b, n)[:c] for x in pcols], axis=-1
    )
    wout = wout.reshape(g * b, n)[:c]
    ess = ess.reshape(g * b)[:c]
    lse = lse.reshape(g * b)[:c]
    return pout, wout, ess, lse


@functools.lru_cache(maxsize=None)
def _make_op(always_resample: bool, interpret: bool,
             selection: str = "quadratic"):
    @jax.custom_batching.custom_vmap
    def op(lw, particles, pos, uniform, thr):
        pout, wout, ess, lse = _batched_call(
            lw[None], particles[None], pos[None], uniform[None], thr[None],
            always_resample, interpret, selection=selection,
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
            lw_b, p_b, pos_b, u_b, thr_b, always_resample, interpret,
            selection=selection,
        )
        return out, (True, True, True, True)

    return op


@functools.lru_cache(maxsize=None)
def _make_seeded_op(method: str, always_resample: bool, interpret: bool,
                    selection: str = "quadratic"):
    @jax.custom_batching.custom_vmap
    def op(lw, particles, seeds, num_alive, uniform, thr):
        pout, wout, ess, lse = _batched_call(
            lw[None], particles[None], None, uniform[None], thr[None],
            always_resample, interpret, seeds=seeds[None],
            num_alive=num_alive[None], method=method, selection=selection,
        )
        return pout[0], wout[0], ess[0], lse[0]

    @op.def_vmap
    def _rule(axis_size, in_batched, lw, particles, seeds, num_alive,
              uniform, thr):
        def ensure(x, batched):
            return x if batched else jnp.broadcast_to(
                x[None], (axis_size,) + x.shape
            )

        lw_b, p_b, sd_b, na_b, u_b, thr_b = (
            ensure(x, b) for x, b in zip(
                (lw, particles, seeds, num_alive, uniform, thr), in_batched
            )
        )
        out = _batched_call(
            lw_b, p_b, None, u_b, thr_b, always_resample, interpret,
            seeds=sd_b, num_alive=na_b, method=method, selection=selection,
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
    selection: str = "quadratic",
):
    """Fused weight step for one chain (vmap-aware, see module docstring).

    Returns (particles_out [N, d], weights_out [N], ess [], logsumexp []).
    The caller computes the likelihood increment as ``logsumexp - log(n)``
    and handles SIS (no-resample) by not calling the fused path.
    ``selection="merge"`` switches to the O(N log N) bitonic-merge
    network (ops/merge_select.py) — valid ONLY when ``positions`` are
    sorted (stratified/systematic draws); the caller knows the method,
    the kernel cannot check.
    """
    if selection not in ("quadratic", "merge"):
        raise ValueError("selection must be 'quadratic' or 'merge'")
    n_lanes = log_weights.shape[-1]
    if selection == "merge" and n_lanes & (n_lanes - 1):
        raise ValueError(
            "selection='merge' requires a power-of-two lane count "
            f"(got {n_lanes}); the XOR merge network is undefined for "
            "composite N — use selection='quadratic'"
        )
    op = _make_op(bool(always_resample), bool(interpret), selection)
    thr = jnp.asarray(threshold, particles.dtype).reshape(())
    return op(log_weights, particles, positions, uniform_w, thr)


def fused_weight_resample_seeded(
    log_weights,          # [N]
    particles,            # [N, d]
    key,                  # PRNG key: the kernel draws positions itself
    num_alive,            # scalar count of live lanes (masked semantics)
    uniform_w,            # [N] post-resample weights (masked-lane aware)
    threshold,            # scalar ESS threshold (ignored if always_resample)
    method: str = "stratified",
    always_resample: bool = False,
    interpret: bool = False,
    selection: str = "auto",
):
    """Fused weight step with IN-KERNEL stratum positions (vmap-aware).

    ``selection="auto"`` picks the O(N log N) merge network for sorted
    position methods (stratified/systematic; measured faster at every
    power-of-two lane count, scripts/particle_regime.py) and the
    quadratic masked-reduce for multinomial or composite lane counts
    (the XOR merge network requires N to be a power of two).

    Same contract as ``fused_weight_resample`` but the inverse-CDF query
    positions are drawn inside the kernel from the hardware PRNG
    (counter-based lowbias32 under the interpreter) with
    ``ops/resampling.py::_positions`` semantics — stratified
    ``(j + U_j)/alive``, systematic shared offset, multinomial iid, dead
    lanes pinned to 1.0. Removes the per-step host threefry draw and the
    [C, N] positions operand from the hot loop; the sampled ancestor
    DISTRIBUTION is identical, the bit-stream differs (like every
    RNG-bearing fast path, parity is distributional).
    """
    if method not in ("stratified", "systematic", "multinomial"):
        raise ValueError(f"unknown resampling method {method!r}")
    n_lanes = log_weights.shape[-1]
    if selection == "auto":
        # Merge needs sorted positions AND a power-of-two lane count
        # (ops/merge_select.py contract; composite N like 384 routes
        # wrong XOR partners silently).
        selection = (
            "merge"
            if method in ("stratified", "systematic")
            and n_lanes & (n_lanes - 1) == 0
            else "quadratic"
        )
    if selection == "merge" and method == "multinomial":
        raise ValueError(
            "selection='merge' requires sorted positions"
        )
    if selection == "merge" and n_lanes & (n_lanes - 1):
        raise ValueError(
            "selection='merge' requires a power-of-two lane count "
            f"(got {n_lanes}); use selection='quadratic'"
        )
    op = _make_seeded_op(
        method, bool(always_resample), bool(interpret), selection
    )
    kd = jnp.ravel(jax.random.key_data(key))[:2]
    seeds = jax.lax.bitcast_convert_type(kd.astype(jnp.uint32), jnp.int32)
    thr = jnp.asarray(threshold, particles.dtype).reshape(())
    alive = jnp.asarray(num_alive, particles.dtype).reshape(())
    return op(log_weights, particles, seeds, alive, uniform_w, thr)
