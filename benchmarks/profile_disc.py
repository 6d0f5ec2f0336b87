"""Per-discriminator timing: S + P2/3/5/7/11 fwd and vjp at production shape.

Usage: python benchmarks/profile_disc.py [batch] [iters]
"""
from __future__ import annotations

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from easevoice_trainer_tpu.models.sovits.discriminator import (
        DiscriminatorP, DiscriminatorS, MultiPeriodDiscriminator)

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    seg = 20480
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else None

    key = jax.random.PRNGKey(0)
    y = jax.random.normal(key, (batch, seg, 1), jnp.float32)
    y = jax.device_put(y, jax.devices()[0])

    def timeit(name, fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:12s} {dt*1e3:9.2f} ms", flush=True)

    modules = [("disc_s", DiscriminatorS(dtype=dtype))] + [
        (f"disc_p{p}", DiscriminatorP(p, dtype=dtype)) for p in
        (2, 3, 5, 7, 11)]
    for name, mod in modules:
        params = mod.init(key, y)["params"]
        params = jax.device_put(params, jax.devices()[0])

        fwd = jax.jit(lambda p, m=mod: m.apply({"params": p}, y)[0])
        timeit(name + ":fwd", fwd, params)

        def vjp_fn(p, m=mod):
            def loss(q):
                logit, fmap = m.apply({"params": q}, y)
                return (jnp.mean(logit ** 2)
                        + sum(jnp.mean(jnp.abs(f)) for f in fmap))
            return jax.tree_util.tree_leaves(jax.grad(loss)(p))[0]
        timeit(name + ":vjp", jax.jit(vjp_fn), params)

    mpd = MultiPeriodDiscriminator(dtype=dtype)
    params = jax.device_put(mpd.init(key, y, y)["params"], jax.devices()[0])
    fwd_all = jax.jit(lambda p: mpd.apply({"params": p}, y, y)[0])
    timeit("mpd:fwd2", fwd_all, params)

    def vjp_all(p):
        def loss(q):
            rl, gl, fr, fg = mpd.apply({"params": q}, y, y)
            fm = sum(jnp.mean(jnp.abs(a - b))
                     for fa, fb in zip(fr, fg) for a, b in zip(fa, fb))
            return sum(jnp.mean(x ** 2) for x in rl + gl) + fm
        return jax.tree_util.tree_leaves(jax.grad(loss)(p))[0]
    timeit("mpd:vjp2", jax.jit(vjp_all), params)


if __name__ == "__main__":
    main()
