"""Isolate the fused weight+resample cost at bench shape [4096, 128]."""

import time

import jax
import jax.numpy as jnp

from bayesssm_tpu.ops.resampling import _positions
from bayesssm_tpu.ops.resampling_pallas import fused_weight_resample


def timed(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    for c, n in [(4096, 128), (512, 1024)]:
        key = jax.random.PRNGKey(0)
        lw = jax.random.normal(key, (c, n))
        p = jax.random.normal(key, (c, n, 2))
        uni = jnp.full((c, n), 1.0 / n)
        thr = jnp.full((c,), n / 2.0)
        nf = jnp.asarray(float(n))

        def run(key, lw, p):
            pos = jax.vmap(
                lambda k: _positions(k, "stratified", (), n, nf, jnp.float32)
            )(jax.random.split(key, c))
            return jax.vmap(
                lambda a, b, q, u, t: fused_weight_resample(
                    a, b, q, u, t, always_resample=False
                )
            )(lw, p, pos, uni, thr)

        jrun = jax.jit(run)
        t = timed(jrun, key, lw, p)
        print(f"fused weight+resample [{c}x{n}]: {t*1e3:.3f} ms")

        def pos_only(key):
            return jax.vmap(
                lambda k: _positions(k, "stratified", (), n, nf, jnp.float32)
            )(jax.random.split(key, c))

        t = timed(jax.jit(pos_only), key)
        print(f"  positions alone [{c}x{n}]: {t*1e3:.3f} ms")


if __name__ == "__main__":
    main()
