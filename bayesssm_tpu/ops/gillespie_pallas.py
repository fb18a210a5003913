"""Pallas TPU kernel for the exact Gillespie SIR day-step.

The XLA while_loop version (models/sir.py::gillespie_step) pays, per loop
iteration, an HBM round-trip of the whole carry (~16 MB at the benchmark's
524k lanes), a global any() across ALL lanes, and an RngBitGenerator call —
measured ~19 ms per 10-step particle-filter sweep at 4096 chains. This
kernel keeps (S, I, t, active) resident in VMEM, draws uniforms from the
per-core hardware PRNG (pltpu.prng_random_bits), and terminates per chain
block: a block of B chains exits at ITS max event count instead of the
global max, so the event-count tail is paid only by the block that has it.

Sampling distribution is the exact jump process, identical to the XLA
path: waiting times by inverse-CDF of Exp(rate_tot), event choice by a
second uniform against rate_inf/rate_tot (reference semantics:
/root/reference/vignettes/articles/stochastic-sir-model.Rmd:152-176).
Bit-streams differ from the XLA path (hardware PRNG vs threefry) — parity
is distributional, like everything RNG-bearing (SURVEY.md §7).

Batching: custom_vmap lowers a vmapped call to ONE gridded kernel; the
chain axis is blocked at ~64k lanes per grid program. Each block's PRNG is
seeded from the first chain's key data mixed with the program id, and
every chain's OWN key is additionally XOR-mixed into its lanes' bits
(ops/sir_sweep_pallas.py convention), so no chain's stream is a function
of another chain's key alone; a fixed root key gives reproducible results
for a fixed blocking.

Interpret mode (CPU CI): the Pallas interpreter has no hardware PRNG
(``pltpu.prng_random_bits`` returns zeros), so ``interpret=True`` swaps the
bits source for a counter-based lowbias32 hash stream seeded from the same
(key, program id, lane) data. Every other kernel line — rate arithmetic,
waiting times, event choice, termination, blocking, padding — is the code
that runs on TPU, so distributional tests in interpret mode cover the
kernel logic; only the bits instruction differs on hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["gillespie_step_pallas"]

# Lanes (chains x particles) per grid program: VMEM holds ~12 live [B, N]
# f32 arrays plus the (2*unroll, B, N) bits draw. Smaller blocks terminate
# closer to their OWN max event count (the per-block early exit is the
# kernel's main win over the XLA loop); 32k measured ~8% faster than 64k
# and ~5% faster than 128k on the heterogeneous-rate MH workload.
_LANES_PER_PROGRAM = 32 * 1024
# Hard cap on events per unit interval (same role as models/sir.py).
MAX_EVENTS = 100_000


def _hash32(x):
    """lowbias32 integer finalizer — a counter-based software PRNG step.

    Used only when the kernel runs under the Pallas interpreter, where the
    hardware PRNG (``pltpu.prng_random_bits``) is unavailable and returns
    zeros; uint32 multiply wraps mod 2^32 in XLA, matching the hash's
    definition.
    """
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> jnp.uint32(15))
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> jnp.uint32(16))
    return x


def _kernel(seed_ref, sd0_ref, sd1_ref, s_ref, i_ref, lam_ref, gam_ref,
            sout_ref, iout_ref, *, n_total: float, t_end: float,
            unroll: int, software_prng: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    s = s_ref[:, :]
    i = i_ref[:, :]
    b, n = s.shape
    # Per-chain seed mix (ops/sir_sweep_pallas.py convention): every
    # chain's OWN key feeds its lanes' bits via the XOR below, so no
    # chain's stream is a function of the block's first key alone —
    # keeps independent-chain diagnostics (R-hat, cross-chain ESS)
    # honest. int32 throughout; lowbias32-style finalizer decorrelates
    # adjacent fold_in seeds.
    rmix = sd0_ref[:, :] ^ (
        sd1_ref[:, :] * jnp.int32(-1640531527) + jnp.int32(1)
    )
    rmix = rmix ^ ((rmix >> 16) & jnp.int32(0x0000FFFF))
    rmix = rmix * jnp.int32(0x7FEB352D)
    rmix = rmix ^ ((rmix >> 15) & jnp.int32(0x0001FFFF))
    rmix = rmix * jnp.int32(-2073254261)                  # 0x846CA68B
    row_mix = jnp.broadcast_to(rmix, (b, n))              # [B, N] int32
    # The seed array rides along whole in SMEM (a [g, 2] block would break
    # Mosaic's (8, 128)-divisibility rule); each program picks its row.
    seed0 = seed_ref[pl.program_id(0), 0]
    seed1 = seed_ref[pl.program_id(0), 1]
    if software_prng:
        # Counter-based stream: hash(seed-mix + lane id, draw index). Same
        # role as the hardware PRNG (independent U[0,1) per lane per draw);
        # bit-streams differ, parity is distributional either way.
        pid = jax.lax.convert_element_type(pl.program_id(0), jnp.uint32)
        s0 = jax.lax.convert_element_type(seed0, jnp.uint32)
        s1 = jax.lax.convert_element_type(seed1, jnp.uint32)
        base = _hash32(s0 ^ _hash32(s1 ^ _hash32(pid)))
        row = jax.lax.broadcasted_iota(jnp.int32, (b, n), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (b, n), 1)
        lane_id = jax.lax.convert_element_type(row * n + col, jnp.uint32)
        lane_mix = _hash32(base + lane_id * jnp.uint32(0x9E3779B9))
    else:
        # Mosaic caps prng_seed at 2 values, so the program id is mixed
        # into the first seed word instead of passed as a third. Wrapping
        # int32 multiply by an odd constant is a bijection in pid, so
        # distinct programs always get distinct seed words (0x9E3779B9 as
        # two's-complement int32; scalar bitcast/uint ops don't lower).
        pid = pl.program_id(0)
        s0_mix = seed0 ^ (pid * jnp.int32(-1640531527) + jnp.int32(1))
        pltpu.prng_seed(s0_mix, seed1)
        lane_mix = None
    lam = lam_ref[:, :]                               # [B, N] broadcast
    gam = gam_ref[:, :]
    # lam/n_total is loop-invariant; hoisted out of the event body.
    lam_n = lam * jnp.float32(1.0 / n_total)
    t = jnp.zeros_like(s)
    # The active mask is carried as f32 (1.0/0.0): Mosaic fails to legalize
    # i1 vector carries in scf.while (scf.yield legalization error).
    active = (i > 0.0).astype(s.dtype)
    inv24 = jnp.float32(1.0 / (1 << 24))

    def cond(carry):
        _, _, _, active, steps = carry
        return jnp.logical_and(jnp.max(active) > 0.0, steps < MAX_EVENTS)

    def body(carry):
        s, i, t, active, steps = carry
        if software_prng:
            # Global draw index: each iteration advances steps by `unroll`
            # and consumes 2*unroll draws, so 2*steps+k is unique per draw.
            d0 = jax.lax.convert_element_type(2 * steps, jnp.uint32)
            rm = jax.lax.convert_element_type(row_mix, jnp.uint32)
            bits = jnp.stack([
                _hash32((lane_mix ^ rm) ^ ((d0 + jnp.uint32(k))
                                           * jnp.uint32(0x85EBCA6B)))
                for k in range(2 * unroll)
            ])
            u24 = (bits >> jnp.uint32(8)).astype(jnp.int32)
        else:
            # prng_random_bits returns SIGNED int32 on TPU Mosaic; the
            # arithmetic >> sign-extends, so mask back to the low 24 bits
            # after shifting (without the mask, half the "uniforms" came
            # out negative on hardware: epidemics collapsed, S went
            # negative). Mosaic cannot cast uint32->f32, hence int32 ops.
            # XOR the per-chain mix BEFORE the shift: the low 24 bits stay
            # uniform and each chain's own key enters its stream.
            raw = pltpu.prng_random_bits((2 * unroll, b, n))
            u24 = ((raw ^ row_mix[None]) >> 8) & jnp.int32(0x00FFFFFF)
        # Top 24 bits -> f32 uniforms in [0, 1) (exactly representable).
        u = u24.astype(jnp.float32) * inv24
        for e in range(unroll):
            # One division per event (see ops/sir_sweep_pallas.py for the
            # full argument): live lanes have rate_tot >= gam*i > 0, dead
            # lanes' inf/NaN is gated behind `fire` (NaN compares false),
            # and the event choice uses u * rate_tot < rate_inf instead
            # of a second division.
            rate_inf = lam_n * s * i
            rate_tot = rate_inf + gam * i
            dt = -jnp.log1p(-u[2 * e]) * (1.0 / rate_tot)
            t_new = t + dt
            fire = jnp.logical_and(active > 0.0, t_new <= t_end)
            infect = u[2 * e + 1] * rate_tot < rate_inf
            s = jnp.where(jnp.logical_and(fire, infect), s - 1.0, s)
            i = jnp.where(fire, jnp.where(infect, i + 1.0, i - 1.0), i)
            t = jnp.where(fire, t_new, t)
            active = jnp.logical_and(fire, i > 0.0).astype(s.dtype)
        return s, i, t, active, steps + unroll

    s, i, _, _, _ = jax.lax.while_loop(
        cond, body, (s, i, t, active, jnp.zeros((), jnp.int32))
    )
    sout_ref[:, :] = s
    iout_ref[:, :] = i


def _batched_call(seeds, s, i, lam, gam, n_total, t_end, unroll, interpret):
    """seeds [C, 2] int32; s/i [C, N] f32; lam/gam [C] f32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    c, n = s.shape
    b = max(1, min(c, _LANES_PER_PROGRAM // max(n, 1)))
    b = 1 << (b.bit_length() - 1)
    g = -(-c // b)
    pad = g * b - c
    if pad:
        def padc(x):
            return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))

        seeds, s, i = padc(seeds), padc(s), padc(i)
        # Padded chains must be inert: lam/gam 0 -> rate 0 -> never live.
        lam, gam = padc(lam), padc(gam)

    kernel = functools.partial(
        _kernel, n_total=float(n_total), t_end=float(t_end),
        unroll=int(unroll), software_prng=bool(interpret),
    )
    space = pl.ANY if interpret else pltpu.VMEM
    smem = pl.ANY if interpret else pltpu.SMEM

    def spec(*dims, ms=None):
        return pl.BlockSpec(
            (None,) + dims, lambda idx: (idx,) + (0,) * len(dims),
            memory_space=ms or space,
        )

    # Seeds go in whole ([g, 2] in SMEM; a grid-blocked (None, 2) spec
    # violates Mosaic's (8, 128) block-divisibility rule) and each program
    # indexes its own row with program_id.
    seed_spec = pl.BlockSpec(
        (g, 2), lambda idx: (0, 0), memory_space=smem
    )

    # Rates enter as FULL [B, N] broadcasts: Mosaic re-broadcasts a [B, 1]
    # vector on every event-loop iteration (measured ~2 ms/step on the
    # whole-sweep kernel, scripts/profile_sweep_boundary.py); the XLA-side
    # lane-replicating copy is paid once per call.
    def wide(x):
        return jnp.broadcast_to(
            x.astype(s.dtype)[:, None], (g * b, n)
        ).reshape(g, b, n)

    sout, iout = pl.pallas_call(
        kernel,
        grid=(g,),
        out_shape=(
            jax.ShapeDtypeStruct((g, b, n), s.dtype),
            jax.ShapeDtypeStruct((g, b, n), s.dtype),
        ),
        in_specs=[
            seed_spec,                           # block seeds (first chains)
            spec(b, 1), spec(b, 1),              # per-CHAIN seed words
            spec(b, n), spec(b, n), spec(b, n), spec(b, n),
        ],
        out_specs=(spec(b, n), spec(b, n)),
        interpret=interpret,
    )(
        seeds.reshape(g, b, 2)[:, 0, :],
        seeds[:, 0].reshape(g, b, 1),
        seeds[:, 1].reshape(g, b, 1),
        s.reshape(g, b, n),
        i.reshape(g, b, n),
        wide(lam),
        wide(gam),
    )
    return sout.reshape(g * b, n)[:c], iout.reshape(g * b, n)[:c]


@functools.lru_cache(maxsize=None)
def _make_op(n_total: float, t_end: float, unroll: int, interpret: bool):
    @jax.custom_batching.custom_vmap
    def op(seeds, s, i, lam, gam):
        sout, iout = _batched_call(
            seeds[None], s[None], i[None], lam[None], gam[None],
            n_total, t_end, unroll, interpret,
        )
        return sout[0], iout[0]

    @op.def_vmap
    def _rule(axis_size, in_batched, seeds, s, i, lam, gam):
        def ensure(x, batched):
            return x if batched else jnp.broadcast_to(
                x[None], (axis_size,) + x.shape
            )

        args = [
            ensure(x, bt)
            for x, bt in zip((seeds, s, i, lam, gam), in_batched)
        ]
        out = _batched_call(*args, n_total, t_end, unroll, interpret)
        return out, (True, True)

    return op


def gillespie_step_pallas(
    key, state, lam, gamma, n_total, t_end=1.0, unroll: int = 8,
    interpret: bool = False,
):
    """Exact SIR Gillespie unit-time advance, one chain (vmap-aware).

    ``state``: f32 [n, 2] (S, I columns); ``lam``/``gamma``: scalars.
    Drop-in distributional equivalent of models/sir.py::gillespie_step.
    """
    op = _make_op(float(n_total), float(t_end), int(unroll), bool(interpret))
    kd = jnp.ravel(jax.random.key_data(key))[:2]
    seeds = jax.lax.bitcast_convert_type(kd.astype(jnp.uint32), jnp.int32)
    lam = jnp.asarray(lam, state.dtype).reshape(())
    gam = jnp.asarray(gamma, state.dtype).reshape(())
    s, i = op(seeds, state[:, 0], state[:, 1], lam, gam)
    return jnp.stack([s, i], axis=-1)
