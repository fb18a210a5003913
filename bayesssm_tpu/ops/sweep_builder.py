"""Generic whole-sweep kernel builder: the escape hatch as a public API.

``ops/sir_sweep_pallas.py`` and ``ops/lgss_sweep_pallas.py`` demonstrate
that running the ENTIRE T-observation particle filter in one Pallas
kernel — state resident in VMEM, on-chip PRNG, merge-selection resample
— is the speed ceiling for a model (486.9k vs 402.2k samples/s for SIR
at the benchmark shape). Their day-loop scaffolding is model-independent;
this module factors it out so ANY model whose state is a tuple of
``[B, N]`` float columns and whose functions trace under Mosaic gets a
whole-sweep ``pf_impl`` by writing three small callbacks instead of a
kernel:

    pf_impl = build_sweep_pf_impl(
        num_state_cols=1,
        init_fn=lambda rng, theta: (theta[3] * rng.normal(),),
        transition_fn=lambda rng, cols, theta, t: (
            theta[0] * cols[0] + theta[1] * rng.normal(),),
        log_weight_fn=lambda cols, theta, y_t: gaussian_lw(...),
        param_names=("a", "sigma_x", "sigma_y"),
    )
    pmmh(..., pf_impl=pf_impl)

Callback contract (TRUSTED, like every ``pf_impl``):
  * All state columns and every value ``rng.normal()`` / ``rng.uniform()``
    return are ``[B, N]`` float32 arrays; callbacks must use only
    operations Mosaic can lower (jnp elementwise, reductions,
    ``pltpu.roll``; no gather/scatter/sort) — exactly the model-function
    contract of the bespoke kernels.
  * ``theta`` is a tuple of ``[B, N]`` broadcasts of the per-chain
    parameters, ordered as ``param_names``.
  * ``rng`` is a :class:`SweepRng` drawing from the kernel's on-chip
    generator (counter-based software stream under the interpreter);
    callbacks may draw any number of blocks.
  * ``log_weight_fn`` returns the UNMASKED ``[B, N]`` observation
    log-density; the scaffold applies the alive-lane mask, degeneracy
    flag, normalization, likelihood increment, resampling (merge
    network, stratified/systematic), and state-estimate recording.
  * Optional ``aux_log_weight_fn(cols, theta, y_t)`` enables the APF day
    (forced aux resample + the reference's Q2 second transition);
    optional ``move_fn(rng, cols, theta, y_t)`` enables the RMPF day
    (forced SISR + rejuvenation move), mirroring
    ``ops/sir_sweep_pallas.py``'s algorithm branches.

Semantics match ``filters/core.py`` with the default fresh-weight
``carry_weights=False`` (quirks Q2/Q4/Q5, masked lanes Q9, degenerate
-inf contract), validated distributionally in tests/test_sweep_builder.py
against the portable engine on a model with no bespoke kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from bayesssm_tpu.ops.gillespie_pallas import _hash32

__all__ = ["build_sweep_pf_impl", "build_sweep_op", "SweepRng"]

_SELECTION_VMEM_BUDGET = 8 * 1024 * 1024
# Chain-block cap for the merge-selection sweeps. Without a [B, N, N]
# intermediate the VMEM budget admits large chain blocks; the round-4
# sweep over caps {64, 128, 256, 512} x unroll {8, 16} on the SIR
# whole-sweep measured 399.5k / 451.6k / 474.2k / VMEM-OOM samples/s at
# the bench shape — fewer, larger programs win (per-program launch
# overhead dominates the wider block-max event tail). 256 is the
# measured best that compiles.
_MERGE_BLOCK_CAP = 256


class SweepRng:
    """In-kernel RNG handle passed to callbacks (uniforms + normals).

    Callbacks that run their OWN jax control flow (e.g. an event
    while_loop drawing per iteration, like the SIR Gillespie day) cannot
    use the stateful :meth:`uniform`/:meth:`normal` inside the loop body
    — the Python-attribute counter would leak a tracer out of the loop.
    Thread the counter explicitly instead::

        ctr = rng.counter()
        def body(carry):
            ..., ctr = carry
            u, ctr = rng.raw_uniform_blocks(k, ctr)   # pure function
            ...
        ... = lax.while_loop(cond, body, (..., ctr))
        rng.set_counter(ctr_out)   # BEFORE returning from the callback

    (Under the hardware PRNG the counter is not consumed for bits —
    ``prng_random_bits`` is stateful — but it must still be threaded so
    the interpret-mode software stream, which hashes it, stays exact.)
    """

    def __init__(self, draw):
        self._draw = draw
        self._ctr = jnp.int32(0)

    def uniform(self):
        """One [B, N] uniform f32 block in [0, 1)."""
        u, self._ctr = self._draw(1, self._ctr)
        return u[0]

    def uniforms(self, k):
        """``k`` [B, N] uniform blocks from ONE generator call (cheaper
        than ``k`` separate :meth:`uniform` calls under the hardware
        PRNG). Returns a [k, B, N] stack."""
        u, self._ctr = self._draw(int(k), self._ctr)
        return u

    def normal(self):
        """One [B, N] standard-normal block (Box-Muller)."""
        import numpy as np

        u, self._ctr = self._draw(2, self._ctr)
        r = jnp.sqrt(-2.0 * jnp.log(1.0 - u[0]))
        return r * jnp.cos(np.float32(2.0 * np.pi) * u[1])

    def counter(self):
        """Current draw counter (int32, may be traced)."""
        return self._ctr

    def set_counter(self, ctr):
        """Restore the counter after explicit threading (docstring)."""
        self._ctr = ctr

    def raw_uniform_blocks(self, nblk, ctr):
        """``nblk`` [B, N] uniform blocks as a PURE function of ``ctr``.

        Returns ``(blocks [nblk, B, N], new_ctr)``; does NOT touch the
        handle's own counter — for use inside callback-managed control
        flow with the counter in the loop carry.
        """
        return self._draw(nblk, ctr)


def _chains_per_program(c: int, n: int, d: int) -> int:
    stages = (2 * n - 1).bit_length()
    per_chain = 2 * n * 4 * (stages + 4 + 2 * d)
    b = max(
        1,
        min(c, _MERGE_BLOCK_CAP, _SELECTION_VMEM_BUDGET // per_chain or 1),
    )
    return 1 << (b.bit_length() - 1)


def _make_kernel(n, num_obs, d, p, init_fn, transition_fn, log_weight_fn,
                 aux_log_weight_fn, move_fn, method, always_resample,
                 software_prng, d_y=1, pack_fn=None, unpack_fn=None,
                 gapped=False, never_resample=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import numpy as np

    from bayesssm_tpu.ops.merge_select import (
        merge_select_cols,
        resolve_carries,
    )

    inv24 = np.float32(1.0 / (1 << 24))
    neg = np.float32(-1e30)
    degenerate = np.float32(-1e8)

    def kernel(*refs):
        seed_ref, y_ref = refs[:2]
        base = 2
        if gapped:
            gaps_ref, times_ref = refs[2:4]
            base = 4
        sd0_ref, sd1_ref = refs[base : base + 2]
        theta_refs = refs[base + 2 : base + 2 + p]
        alive_ref, thr_ref = refs[base + 2 + p : base + 4 + p]
        ll_ref = refs[base + 4 + p]
        est_refs = refs[base + 5 + p : base + 5 + p + d]

        alive_ct = alive_ref[:, 0:1]
        thr = thr_ref[:, 0:1]
        theta = tuple(r[:, :] for r in theta_refs)
        b = alive_ct.shape[0]

        lane = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
        lane_f = lane.astype(jnp.float32)
        alive_mask = lane_f < alive_ct

        seed0 = seed_ref[pl.program_id(0), 0]
        seed1 = seed_ref[pl.program_id(0), 1]
        sd0 = sd0_ref[:, :]
        sd1 = sd1_ref[:, :]
        rmix = sd0 ^ (sd1 * jnp.int32(-1640531527) + jnp.int32(1))
        rmix = rmix ^ ((rmix >> 16) & jnp.int32(0x0000FFFF))
        rmix = rmix * jnp.int32(0x7FEB352D)
        rmix = rmix ^ ((rmix >> 15) & jnp.int32(0x0001FFFF))
        rmix = rmix * jnp.int32(-2073254261)
        row_mix = jnp.broadcast_to(rmix, (b, n))
        if software_prng:
            pid = jax.lax.convert_element_type(pl.program_id(0), jnp.uint32)
            s0w = jax.lax.convert_element_type(seed0, jnp.uint32)
            s1w = jax.lax.convert_element_type(seed1, jnp.uint32)
            base = _hash32(s0w ^ _hash32(s1w ^ _hash32(pid)))
            row = jax.lax.broadcasted_iota(jnp.int32, (b, n), 0)
            lane_id = jax.lax.convert_element_type(row * n + lane,
                                                   jnp.uint32)
            lane_mix = _hash32(base + lane_id * jnp.uint32(0x9E3779B9))
        else:
            pid = pl.program_id(0)
            s0_mix = seed0 ^ (pid * jnp.int32(-1640531527) + jnp.int32(1))
            pltpu.prng_seed(s0_mix, seed1)
            lane_mix = None

        def draw(nblk, ctr):
            if software_prng:
                d0 = jax.lax.convert_element_type(ctr, jnp.uint32)
                rm = jax.lax.convert_element_type(row_mix, jnp.uint32)
                bits = jnp.stack([
                    _hash32((lane_mix ^ rm)
                            ^ ((d0 + jnp.uint32(k))
                               * jnp.uint32(0x85EBCA6B)))
                    for k in range(nblk)
                ])
                u24 = (bits >> jnp.uint32(8)).astype(jnp.int32)
            else:
                raw = pltpu.prng_random_bits((nblk, b, n))
                u24 = ((raw ^ row_mix[None]) >> 8) & jnp.int32(0x00FFFFFF)
            return u24.astype(jnp.float32) * inv24, ctr + jnp.int32(nblk)

        def roll(x, shift, axis=1):
            return pltpu.roll(x, shift, axis=axis)

        def draw_positions(rng):
            u = rng.uniform()
            if method == "stratified":
                pos = (lane_f + u) / alive_ct
            else:  # systematic
                u0 = jnp.max(jnp.where(lane == 0, u, 0.0), axis=-1,
                             keepdims=True)
                pos = (lane_f + u0) / alive_ct
            return jnp.where(alive_mask, pos, 1.0)

        def masked_lw(cols, y_t):
            lw = log_weight_fn(cols, theta, y_t)
            return jnp.where(alive_mask, lw, neg)

        def select(w, pos, cols):
            cdf = w
            shift = 1
            while shift < n:
                rolled = roll(cdf, shift)
                cdf = cdf + jnp.where(lane >= shift, rolled, 0.0)
                shift *= 2
            shift = 1
            while shift < n:
                rolled = roll(cdf, shift)
                cdf = jnp.maximum(cdf, jnp.where(lane >= shift, rolled, 0.0))
                shift *= 2
            cdf_ext = jnp.where(
                lane_f >= alive_ct - 1.0, np.float32(1.5), cdf
            )
            carries = tuple(
                resolve_carries(cdf_ext, roll(c, n - 1), lane, roll)
                for c in cols
            )
            v0s = tuple(
                jnp.sum(jnp.where(lane == 0, c, 0.0), axis=-1,
                        keepdims=True)
                for c in cols
            )
            out = merge_select_cols(cdf_ext, pos, carries, v0s, lane, roll)
            return tuple(jnp.where(alive_mask, o, 0.0) for o in out)

        def select_state(w, pos, cols):
            """Selection with optional column packing: route
            ``pack_fn(cols)`` (fewer columns through the merge network,
            e.g. two integer counts packed into one f32 lane), unpack,
            re-mask."""
            route = tuple(pack_fn(cols)) if pack_fn is not None else cols
            sel = select(w, pos, route)
            if unpack_fn is not None:
                sel = tuple(
                    jnp.where(alive_mask, o, 0.0)
                    for o in unpack_fn(sel)
                )
            return sel

        rng = SweepRng(draw)
        cols = tuple(init_fn(rng, theta))
        assert len(cols) == d, "init_fn must return num_state_cols columns"
        loglike = jnp.zeros((b, 1), jnp.float32)
        dead = jnp.zeros((b, 1), jnp.float32)

        t1 = est_refs[0].shape[1]
        est_col = jax.lax.broadcasted_iota(jnp.int32, (b, t1), 1)
        w0 = jnp.where(alive_mask, 1.0 / alive_ct, 0.0)
        accs = tuple(
            jnp.where(
                est_col == 0,
                jnp.sum(w0 * c, axis=-1, keepdims=True), 0.0,
            )
            for c in cols
        )

        def day(t, carry):
            cols, loglike, dead, ctr, accs = carry
            rng = SweepRng(draw)
            rng._ctr = ctr
            est_mask = est_col == t + 1
            # y is a FLAT [T * d_y] SMEM array (1D scalar reads are the
            # Mosaic-safe layout); row t's columns are t*d_y + j.
            y_t = (
                y_ref[t] if d_y == 1
                else tuple(y_ref[t * d_y + j] for j in range(d_y))
            )

            if gapped:
                # Irregular observation grid (gap-propagation loop of
                # /root/reference/R/particle_filter_core.R:122-137):
                # apply the transition gaps[t] times; the callback's time
                # argument is the absolute 0-based transition index
                # times[t] - gaps[t] + s, which reduces to the day index
                # t on a contiguous grid.
                gap = gaps_ref[t]
                t_end = times_ref[t]

                def gap_body(s, gcarry):
                    gcols, gctr = gcarry
                    grng = SweepRng(draw)
                    grng._ctr = gctr
                    gcols = tuple(
                        transition_fn(grng, gcols, theta, t_end - gap + s)
                    )
                    return gcols, grng._ctr

                cols, ctr2 = jax.lax.fori_loop(
                    0, gap, gap_body, (cols, rng._ctr)
                )
                rng._ctr = ctr2
            else:
                cols = tuple(transition_fn(rng, cols, theta, t))

            if aux_log_weight_fn is not None:
                aux_lw = jnp.where(
                    alive_mask, aux_log_weight_fn(cols, theta, y_t), neg
                )
                mxa = jnp.max(aux_lw, axis=-1, keepdims=True)
                dead = jnp.maximum(
                    dead, (mxa < degenerate).astype(jnp.float32)
                )
                sha = jnp.exp(aux_lw - mxa)
                wa = sha / jnp.sum(sha, axis=-1, keepdims=True)
                pos_a = draw_positions(rng)
                cols = select_state(wa, pos_a, cols)
                # Ancestor aux weight RECOMPUTED from the selected state
                # instead of routed as an extra merge column: selection
                # copies (and pack/unpack) are exact, and the aux weight
                # is a deterministic function of (cols, theta, y_t), so
                # the recompute equals the gather bit-for-bit while
                # keeping one fewer column in the merge network
                # (measured +9% APF throughput at the benchmark shape —
                # the same trick as ops/sir_sweep_pallas.py:449-452).
                aux_anc = jnp.maximum(
                    jnp.where(
                        alive_mask,
                        aux_log_weight_fn(cols, theta, y_t), neg,
                    ),
                    neg,
                )
                # Q2: ONE second transition at the observation time
                # (times_ref[t] - 1 == t on a contiguous grid).
                t_q2 = times_ref[t] - 1 if gapped else t
                cols = tuple(transition_fn(rng, cols, theta, t_q2))
                lw = masked_lw(cols, y_t) - aux_anc
                lw = jnp.where(alive_mask, lw, neg)
            else:
                lw = masked_lw(cols, y_t)

            mx = jnp.max(lw, axis=-1, keepdims=True)
            dead = jnp.maximum(dead, (mx < degenerate).astype(jnp.float32))
            shifted = jnp.exp(lw - mx)
            ssum = jnp.sum(shifted, axis=-1, keepdims=True)
            w = shifted / ssum
            ess = 1.0 / jnp.sum(w * w, axis=-1, keepdims=True)
            loglike = loglike + mx + jnp.log(ssum) - jnp.log(alive_ct)

            if never_resample:
                # SIS day: no selection at all (the fresh-weight SIS of
                # the portable core with carry_weights=False — quirk
                # territory, matching particle_filter_core.R's SIS
                # branch under the reference's fresh-weight semantics).
                est_w = w
            else:
                pos = draw_positions(rng)
                res = select_state(w, pos, cols)

                if always_resample:
                    cols = res
                    est_w = jnp.where(alive_mask, 1.0 / alive_ct, 0.0)
                else:
                    do_rows = jnp.broadcast_to(ess < thr, (b, n))
                    cols = tuple(
                        jnp.where(do_rows, r, c)
                        for r, c in zip(res, cols)
                    )
                    est_w = jnp.where(
                        do_rows,
                        jnp.where(alive_mask, 1.0 / alive_ct, 0.0), w,
                    )

            if move_fn is not None:
                moved = tuple(move_fn(rng, cols, theta, y_t))
                # Masked lanes stay inert.
                cols = tuple(
                    jnp.where(alive_mask, m, c)
                    for m, c in zip(moved, cols)
                )

            live_f = 1.0 - dead
            accs = tuple(
                jnp.where(
                    est_mask,
                    jnp.sum(est_w * c, axis=-1, keepdims=True) * live_f,
                    acc,
                )
                for c, acc in zip(cols, accs)
            )
            return cols, loglike, dead, rng._ctr, accs

        cols, loglike, dead, _, accs = jax.lax.fori_loop(
            0, num_obs, day, (cols, loglike, dead, rng._ctr, accs)
        )
        ll_ref[:, :] = jnp.where(dead > 0.0, -jnp.inf, loglike)
        for r, acc in zip(est_refs, accs):
            r[:, :] = acc

    return kernel


def _batched_call(seeds, thetas, alive, thr, y, *, n_static, d, init_fn,
                  transition_fn, log_weight_fn, aux_log_weight_fn,
                  move_fn, method, always_resample, interpret,
                  d_y=1, pack_fn=None, unpack_fn=None, num_packed_cols=1,
                  gaps=None, never_resample=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c = thetas[0].shape[0]
    p = len(thetas)
    n = n_static
    num_obs = y.shape[0]
    t1 = num_obs + 1
    gapped = gaps is not None

    # VMEM budget counts the columns actually ROUTED through the merge
    # network (the ancestor aux weight is recomputed, not routed).
    d_route = num_packed_cols if pack_fn is not None else d
    b = _chains_per_program(c, n, d_route)
    g = -(-c // b)
    pad = g * b - c
    if pad:
        seeds = jnp.pad(seeds, [(0, pad), (0, 0)])
        # Padded chains replicate the LAST chain's theta (mode="edge" —
        # any real chain's theta is in-support) with one alive lane;
        # padded outputs are discarded.
        thetas = tuple(
            jnp.pad(t, (0, pad), mode="edge") for t in thetas
        )
        alive = jnp.pad(alive, (0, pad), constant_values=1.0)
        thr = jnp.pad(thr, (0, pad), constant_values=1.0)

    kernel = _make_kernel(
        n, int(num_obs), d, p, init_fn, transition_fn, log_weight_fn,
        aux_log_weight_fn, move_fn, method, bool(always_resample),
        bool(interpret), d_y=int(d_y), pack_fn=pack_fn,
        unpack_fn=unpack_fn, gapped=gapped,
        never_resample=bool(never_resample),
    )
    space = pl.ANY if interpret else pltpu.VMEM
    smem = pl.ANY if interpret else pltpu.SMEM

    def spec(*dims):
        return pl.BlockSpec(
            (None,) + dims, lambda idx: (idx,) + (0,) * len(dims),
            memory_space=space,
        )

    def whole(shape):
        return pl.BlockSpec(
            shape, lambda idx: (0,) * len(shape), memory_space=smem
        )

    def col(x):
        return jnp.broadcast_to(
            x.astype(jnp.float32)[:, None], (g * b, n)
        ).reshape(g, b, n)

    def scol(x):
        return jnp.broadcast_to(x[:, None], (g * b, n)).reshape(g, b, n)

    sdim = (b, n)
    y1d = y.astype(jnp.float32).reshape(num_obs * d_y)
    gap_specs, gap_args = [], []
    if gapped:
        import numpy as np

        gaps_np = np.asarray(gaps, np.int32)
        times_np = np.cumsum(gaps_np).astype(np.int32)
        gap_specs = [whole((num_obs,)), whole((num_obs,))]
        gap_args = [jnp.asarray(gaps_np), jnp.asarray(times_np)]
    outs = pl.pallas_call(
        kernel,
        grid=(g,),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((g, b, 1), jnp.float32)]
            + [jax.ShapeDtypeStruct((g, b, t1), jnp.float32)] * d
        ),
        in_specs=[whole((g, 2)), whole((num_obs * d_y,))]
        + gap_specs
        + [spec(*sdim), spec(*sdim)]
        + [spec(*sdim)] * p
        + [spec(*sdim), spec(*sdim)],
        out_specs=tuple([spec(b, 1)] + [spec(b, t1)] * d),
        interpret=interpret,
    )(
        seeds.reshape(g, b, 2)[:, 0, :],
        y1d,
        *gap_args,
        scol(seeds[:, 0]),
        scol(seeds[:, 1]),
        *[col(t) for t in thetas],
        col(alive),
        col(thr),
    )
    ll = outs[0].reshape(g * b)[:c]
    ests = [o.reshape(g * b, t1)[:c] for o in outs[1:]]
    est = ests[0] if d == 1 else jnp.stack(ests, axis=-1)
    return ll, est


def build_sweep_op(
    num_state_cols: int,
    init_fn,
    transition_fn,
    log_weight_fn,
    num_params: int,
    aux_log_weight_fn=None,
    move_fn=None,
    resample_fn: str = "stratified",
    always_resample: bool = False,
    never_resample: bool = False,
    interpret: bool = False,
    num_obs_cols: int = 1,
    pack_fn=None,
    unpack_fn=None,
    num_packed_cols: int = 1,
    obs_gaps=None,
):
    """Build the vmap-aware whole-sweep op (module docstring contract).

    Returns ``op(key, y [T] or [T, num_obs_cols], theta_vec [P],
    num_particles, max_particles, threshold) -> (loglike,
    state_est [T+1(, d)])``.

    ``num_obs_cols`` (d_y): observation columns; callbacks receive
    ``y_t`` as a scalar when 1 (back-compat) or a tuple of d_y scalars
    read from SMEM (multivariate rows,
    /root/reference/R/particle_filter_core.R:176-183 — also usable for
    per-observation precomputed constants like ``lgamma(y + 1)``).

    ``pack_fn(cols) -> tuple`` / ``unpack_fn(packed) -> cols`` (with
    ``num_packed_cols`` = the packed tuple's length) optionally shrink
    the column set routed through the merge network per resample — e.g.
    two integer counts packed into one exact f32 lane (the
    ops/sir_sweep_pallas.py trick, generically). Merge copies are exact
    for any f32, so packing is purely a throughput optimization.

    ``obs_gaps``: static per-observation transition counts (tuple of
    ints >= 1, one per observation) for irregular observation grids
    (/root/reference/R/particle_filter_core.R:122-137). ``None`` = one
    transition per observation (contiguous). The callback's time
    argument is the absolute 0-based transition index.
    """
    if resample_fn not in ("stratified", "systematic"):
        raise ValueError(
            "the sweep builder resamples through the merge network and "
            "requires sorted positions (stratified/systematic)"
        )
    if (pack_fn is None) != (unpack_fn is None):
        raise ValueError("pack_fn and unpack_fn must be given together")
    if always_resample and never_resample:
        raise ValueError(
            "always_resample and never_resample are mutually exclusive"
        )
    if obs_gaps is not None:
        obs_gaps = tuple(int(g) for g in obs_gaps)
        if any(g < 1 for g in obs_gaps):
            raise ValueError("obs_gaps entries must be >= 1")
        if all(g == 1 for g in obs_gaps):
            obs_gaps = None  # contiguous: keep the no-inner-loop path

    d_y = int(num_obs_cols)
    kw = dict(
        d=int(num_state_cols), init_fn=init_fn,
        transition_fn=transition_fn, log_weight_fn=log_weight_fn,
        aux_log_weight_fn=aux_log_weight_fn, move_fn=move_fn,
        method=resample_fn, always_resample=bool(always_resample),
        never_resample=bool(never_resample),
        interpret=bool(interpret), d_y=d_y, pack_fn=pack_fn,
        unpack_fn=unpack_fn, num_packed_cols=int(num_packed_cols),
        gaps=obs_gaps,
    )
    p = int(num_params)

    def make(n_static):
        @jax.custom_batching.custom_vmap
        def op(seeds, thetas, alive, thr, y):
            ll, est = _batched_call(
                seeds[None], tuple(t[None] for t in thetas),
                alive[None], thr[None], y, n_static=n_static, **kw,
            )
            return ll[0], est[0]

        @op.def_vmap
        def _rule(axis_size, in_batched, seeds, thetas, alive, thr, y):
            if in_batched[4]:
                raise ValueError(
                    "sweep builder: y is shared across chains and cannot "
                    "be vmapped"
                )

            def ensure(x, batched):
                return x if batched else jnp.broadcast_to(
                    x[None], (axis_size,) + x.shape
                )

            seeds_b = ensure(seeds, in_batched[0])
            thetas_b = tuple(
                ensure(t, bt) for t, bt in zip(
                    thetas,
                    in_batched[1] if isinstance(in_batched[1], (list, tuple))
                    else [in_batched[1]] * p,
                )
            )
            alive_b = ensure(alive, in_batched[2])
            thr_b = ensure(thr, in_batched[3])
            out = _batched_call(
                seeds_b, thetas_b, alive_b, thr_b, y,
                n_static=n_static, **kw,
            )
            return out, (True, True)

        return op

    make = functools.lru_cache(maxsize=None)(make)

    def call(key, y, theta_vec, num_particles, max_particles=None,
             threshold=None):
        if max_particles is None:
            max_particles = int(num_particles)
        n_static = int(max_particles)
        if n_static < 128 or n_static > 1024 or n_static & (n_static - 1):
            # The builder's selection step is merge-only (no quadratic
            # fallback), and the merge network requires a power of two
            # (ops/merge_select.py contract).
            raise ValueError(
                "max_particles must be a power of two in [128, 1024] "
                f"(got {n_static}); the fused sweep resamples through "
                "the bitonic merge network, which is undefined for "
                "composite lane counts"
            )
        ys = jnp.asarray(y, jnp.float32)
        if d_y == 1:
            ys = ys.reshape(-1, 1)
        elif ys.ndim != 2 or ys.shape[1] != d_y:
            raise ValueError(
                f"y must be [T, {d_y}] for num_obs_cols={d_y} "
                f"(got shape {ys.shape})"
            )
        if obs_gaps is not None and len(obs_gaps) != ys.shape[0]:
            raise ValueError(
                f"obs_gaps has {len(obs_gaps)} entries but y has "
                f"{ys.shape[0]} observations"
            )
        kd = jnp.ravel(jax.random.key_data(key))[:2]
        seeds = jax.lax.bitcast_convert_type(
            kd.astype(jnp.uint32), jnp.int32
        )
        alive = jnp.asarray(num_particles, jnp.float32).reshape(())
        thr = (
            jnp.asarray(threshold, jnp.float32).reshape(())
            if threshold is not None
            else alive / 2.0
        )
        theta_vec = jnp.asarray(theta_vec, jnp.float32)
        thetas = tuple(theta_vec[j].reshape(()) for j in range(p))
        return make(n_static)(seeds, thetas, alive, thr, ys)

    return call


def build_sweep_pf_impl(
    num_state_cols: int,
    init_fn,
    transition_fn,
    log_weight_fn,
    param_names,
    aux_log_weight_fn=None,
    move_fn=None,
    interpret: bool = False,
    num_obs_cols: int = 1,
    pack_fn=None,
    unpack_fn=None,
    num_packed_cols: int = 1,
    obs_transform=None,
):
    """PMMH ``pf_impl`` factory over :func:`build_sweep_op`.

    ``param_names`` fixes the order of the ``theta`` tuple the callbacks
    receive. Supports BPF (plus APF when ``aux_log_weight_fn`` is given
    and RMPF when ``move_fn`` is given), fresh-weight SIS/SISR/SISAR
    (SIS compiles a never-resample day that skips selection entirely),
    stratified/systematic resampling, multivariate observation rows
    (``num_obs_cols``), irregular ``obs_times`` (static gap counts,
    compiled into the kernel's day loop), and optional selection
    packing (see :func:`build_sweep_op`).

    ``obs_transform(y) -> [T, num_obs_cols]``: optional host-side map
    applied to the driver's raw ``y`` once per pmmh() call — the place
    to append precomputed per-observation constants the kernel should
    not recompute per lane (e.g. ``lgamma(y + 1)`` for a Poisson
    weight, the trick of ops/sir_sweep_pallas.py's host-side ``lgy``).
    """
    expected_params = tuple(param_names)

    def factory(
        y,
        num_particles,
        param_names,
        model_fns,
        obs_times,
        algorithm,
        resample_algorithm,
        resample_fn,
        carry_weights,
        max_particles=None,
    ):
        del model_fns
        if algorithm not in ("BPF", "APF", "RMPF"):
            # SIS (never-resample) has no fused sweep: the builder's day
            # always runs the adaptive/forced resample stage, so an
            # unknown algorithm must not silently sample as BPF.
            raise ValueError(
                "the sweep builder supports BPF, APF or RMPF only"
            )
        if algorithm == "APF" and aux_log_weight_fn is None:
            raise ValueError(
                "APF requires the builder's aux_log_weight_fn"
            )
        if algorithm == "RMPF" and move_fn is None:
            raise ValueError("RMPF requires the builder's move_fn")
        if obs_times is not None:
            from bayesssm_tpu.filters.core import obs_times_to_gaps

            obs_gaps = obs_times_to_gaps(
                obs_times, int(jnp.asarray(y).shape[0])
            )
        else:
            obs_gaps = None
        if carry_weights:
            raise ValueError(
                "the sweep builder implements the reference fresh-weight "
                "semantics (carry_weights=False)"
            )
        if set(param_names) != set(expected_params):
            raise ValueError(
                f"sweep builder built for parameters {expected_params}, "
                f"driver passed {tuple(param_names)}"
            )
        # The callbacks see theta ordered as the BUILDER's param_names;
        # the driver passes theta_vec in ITS param order (whatever order
        # the user's log_priors dict iterates). Permute instead of
        # demanding exact order — the pre-consolidation SIR factory
        # accepted any order and this keeps that contract.
        perm = tuple(param_names.index(q) for q in expected_params)
        # RMPF strips any user resample_algorithm and forces SISR
        # (/root/reference/R/resample_move_filter.R:213-230), so SIS
        # only survives outside RMPF.
        always = (
            algorithm == "RMPF" or resample_algorithm == "SISR"
        )
        never = resample_algorithm == "SIS" and algorithm != "RMPF"
        op = build_sweep_op(
            num_state_cols, init_fn, transition_fn, log_weight_fn,
            len(expected_params),
            aux_log_weight_fn=(
                aux_log_weight_fn if algorithm == "APF" else None
            ),
            move_fn=move_fn if algorithm == "RMPF" else None,
            resample_fn=resample_fn, always_resample=always,
            never_resample=never,
            interpret=interpret, num_obs_cols=num_obs_cols,
            pack_fn=pack_fn, unpack_fn=unpack_fn,
            num_packed_cols=num_packed_cols, obs_gaps=obs_gaps,
        )
        ys = jnp.asarray(y, jnp.float32)
        if obs_transform is not None:
            ys = jnp.asarray(obs_transform(ys), jnp.float32)

        def pf(key, theta_vec, n=num_particles):
            theta_vec = jnp.asarray(theta_vec)
            if perm != tuple(range(len(perm))):
                theta_vec = theta_vec[jnp.array(perm)]
            return op(
                key, ys, theta_vec, n,
                max_particles=max_particles
                if max_particles is not None
                else n,
            )

        return pf

    return factory
