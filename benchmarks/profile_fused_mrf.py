"""Race the fused MRF Pallas kernel against the plain-XLA composition at
production s2 stage geometries (single chip).

Usage: python benchmarks/profile_fused_mrf.py [--fwd-only]
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from easevoice_trainer_tpu.ops.fused_mrf import (
    build_stage_spec, mrf_stage, mrf_stage_reference)


def resblock1_defs(k, dilations=(1, 3, 5)):
    return [[(k, (k * d - d) // 2, d), (k, (k - 1) // 2, 1)]
            for d in dilations]


def stage_defs_unfolded():
    return [resblock1_defs(k) for k in (3, 7, 11)]


def folded_defs(f):
    """Fold (k, d) via the production selector to (kp, pl) taps."""
    from easevoice_trainer_tpu.nn.layers import _fold_selector
    out = []
    for k in (3, 7, 11):
        block = []
        for d in (1, 3, 5):
            convs = []
            for kk, dd in ((k, d), (k, 1)):
                pad = (kk * dd - dd) // 2
                _, q_min, kp = _fold_selector(kk, dd, pad, f, 1)
                convs.append((kp, -q_min, 1))
            block.append(convs)
        out.append(block)
    return out


def bench(fn, *args, n=20):
    r = jax.block_until_ready(fn(*args))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn(*args)
        jax.block_until_ready(r)
        np.asarray(jax.tree.leaves(r)[0][0, 0])  # force fetch
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def bench_inloop(step, x, *rest, n=50):
    """Time with the iteration INSIDE one jit: the axon tunnel adds
    ~4-9 ms dispatch latency per jitted call, which swamps ~10 ms
    kernels when timed call-by-call.  `step` must map x -> same-shape x
    (weights closed over via *rest)."""
    from jax import lax

    @jax.jit
    def loop(x0, *r):
        return lax.fori_loop(0, n, lambda i, c: step(c, *r), x0)

    jax.block_until_ready(loop(x, *rest))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = loop(x, *rest)
        jax.block_until_ready(out)
        np.asarray(jax.tree.leaves(out)[0][0, 0])
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def main():
    fwd_only = "--fwd-only" in sys.argv
    rng = np.random.default_rng(0)
    # (name, t, cf, defs): production stages 1-4 (stage0 C=512 excluded)
    cases = [
        ("s1 C=256 f=1", 2560, 256, stage_defs_unfolded()),
        ("s2 C=128 f=1", 5120, 128, stage_defs_unfolded()),
        ("s3 C=64  f=2", 5120, 128, folded_defs(2)),
        ("s4 C=32  f=4", 5120, 128, folded_defs(4)),
    ]
    only = [a.split("=", 1)[1] for a in sys.argv if a.startswith("--cases=")]
    if only:
        keep = only[0].split(",")
        cases = [c for c in cases if any(k in c[0] for k in keep)]
    for name, t, cf, defs in cases:
        try:
            run_case(name, t, cf, defs, rng, fwd_only)
        except Exception as exc:  # compile OOM etc. — keep racing the rest
            print(f"{name}: FAILED {type(exc).__name__}: {str(exc)[:200]}",
                  flush=True)


def run_case(name, t, cf, defs, rng, fwd_only):
    if True:
        spec = build_stage_spec(defs)
        wcat = jnp.asarray(
            rng.normal(0, 0.05, size=(spec.n_taps, cf, cf)), jnp.bfloat16)
        bcat = jnp.asarray(
            rng.normal(0, 0.05, size=(len(spec.convs), cf)), jnp.bfloat16)
        x = jnp.asarray(rng.normal(size=(8, t, cf)), jnp.bfloat16)
        ct = jnp.asarray(rng.normal(size=(8, t, cf)), jnp.bfloat16)

        f_fused = jax.jit(lambda a, w, b: mrf_stage(a, w, b, spec, False))
        f_ref = jax.jit(lambda a, w, b: mrf_stage_reference(a, w, b, spec))

        # numerics sanity at this shape on device
        yf = np.asarray(f_fused(x, wcat, bcat), np.float32)
        yr = np.asarray(f_ref(x, wcat, bcat), np.float32)
        err = np.max(np.abs(yf - yr)) / max(1e-6, np.max(np.abs(yr)))
        if "--inloop" in sys.argv:
            ms_f = bench_inloop(
                lambda a, w, b: mrf_stage(a, w, b, spec, False), x, wcat, bcat)
            ms_r = bench_inloop(
                lambda a, w, b: mrf_stage_reference(a, w, b, spec),
                x, wcat, bcat)
        else:
            ms_f = bench(f_fused, x, wcat, bcat)
            ms_r = bench(f_ref, x, wcat, bcat)
        line = (f"{name}: fwd fused {ms_f:7.3f} ms vs xla {ms_r:7.3f} ms "
                f"({ms_r / ms_f:4.2f}x)  rel_err {err:.2e}")
        print(line, flush=True)
        line = " " * len(name)

        if not fwd_only:
            g_fused = jax.jit(jax.grad(
                lambda a, w, b: jnp.sum(
                    (mrf_stage(a, w, b, spec, False) * ct).astype(jnp.float32)),
                argnums=(0, 1, 2)))
            g_ref = jax.jit(jax.grad(
                lambda a, w, b: jnp.sum(
                    (mrf_stage_reference(a, w, b, spec) * ct).astype(jnp.float32)),
                argnums=(0, 1, 2)))
            if "--inloop" in sys.argv:
                def gstep(g):
                    # keep dW/db alive (sums are negligible) so XLA can't
                    # DCE the weight-grad computation inside the loop
                    def step(a, w, b):
                        ga, gw, gb = g(a, w, b)
                        return ga + (jnp.sum(gw) + jnp.sum(gb)).astype(ga.dtype)
                    return step
                gms_f = bench_inloop(gstep(g_fused), x, wcat, bcat)
                gms_r = bench_inloop(gstep(g_ref), x, wcat, bcat)
            else:
                gms_f = bench(g_fused, x, wcat, bcat)
                gms_r = bench(g_ref, x, wcat, bcat)
            gf = g_fused(x, wcat, bcat)
            gr = g_ref(x, wcat, bcat)
            gerr = max(
                float(np.max(np.abs(np.asarray(a, np.float32)
                                    - np.asarray(b, np.float32)))
                      / max(1e-6, float(np.max(np.abs(np.asarray(b, np.float32))))))
                for a, b in zip(gf, gr))
            line += (f" | grad fused {gms_f:7.3f} ms vs xla {gms_r:7.3f} ms "
                     f"({gms_r / gms_f:4.2f}x)  rel_err {gerr:.2e}")
        print(line, flush=True)


if __name__ == "__main__":
    main()
