"""Bit-exact disk memoization of deterministic train-state inits.

The production fine-tune drivers initialize their train states on the
host CPU (``utils.config.host_cpu_init``).  XLA:CPU executables can
never be reloaded from the persistent compile cache (the
``cpu_aot_loader`` machine-type bug — see ``host_cpu_init``), so every
fresh trainer subprocess re-pays the init compile.  At the real s2
geometry that is *minutes* of XLA:CPU work on a slow host core
(measured 323 s for ``sovits_step.create_train_state`` on the 1-core
bench VM) — by far the largest fixed cost of a warm fine-tune run.

``create_train_state(PRNGKey(seed), model, hp, example_batch)`` is a
pure deterministic function of (seed, model/hp config, example-batch
shapes, code version): caching its *result* to disk is bit-exact
memoization, not an approximation.  Entries are platform-independent
numpy data, so — unlike compiled executables — they need no machine
keying and live directly under ``<compile-cache-root>/init_states/``
(a name ``GlobalCFG._purge_unkeyed_cache_entries`` explicitly spares).

Staleness safety: the key includes a content hash of every ``.py`` file
in the package, so any code change (which could alter parameter layout
or init math) invalidates the cache wholesale.  Loads are additionally
wrapped in try/except — a corrupt or unpicklable entry falls back to a
fresh build.

Reference context: the torch reference pays no analogous cost (eager
init, reference: src/train/sovits.py:219-280), so this cost class is
TPU-framework-specific and must not leak into user-visible wall-clock.
"""
from __future__ import annotations

import hashlib
import os
import pickle
from typing import Callable, Iterable, Optional

_CODE_FP: Optional[str] = None


def _enabled() -> bool:
    """Default: only when the session's default backend is an accelerator
    (production fine-tunes).  CPU-only sessions (the test suite) churn
    tiny fixtures whose init is cheap; caching them would just mask init
    bugs.  ``EASEVOICE_INIT_CACHE=on|off`` overrides either way."""
    val = os.environ.get("EASEVOICE_INIT_CACHE", "auto").strip().lower()
    if val in ("on", "1", "true"):
        return True
    if val in ("off", "0", "false", "none"):
        return False
    try:
        import jax

        return jax.default_backend() != "cpu"
    except Exception:  # pragma: no cover - no jax => nothing to cache
        return False


def _root() -> str:
    """Same root resolution as ``GlobalCFG._enable_compile_cache`` (the
    ``off`` sentinel there only disables *executable* caching)."""
    from ..utils import paths

    val = os.environ.get("EASEVOICE_COMPILE_CACHE", "").strip()
    if val and val.lower() not in ("off", "none", "0"):
        root = val
    else:
        root = os.path.join(paths.get_base_path(), "jax_compile_cache")
    return os.path.join(root, "init_states")


def code_fingerprint() -> str:
    """Content hash of every .py in the package — any code change
    invalidates all cached inits (conservative but sound)."""
    global _CODE_FP
    if _CODE_FP is not None:
        return _CODE_FP
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.sha256()
    for dirpath, dirnames, filenames in sorted(os.walk(pkg)):
        dirnames.sort()
        for name in sorted(filenames):
            if not name.endswith(".py"):
                continue
            path = os.path.join(dirpath, name)
            h.update(os.path.relpath(path, pkg).encode())
            try:
                with open(path, "rb") as f:
                    h.update(f.read())
            except OSError:  # pragma: no cover
                pass
    _CODE_FP = h.hexdigest()
    return _CODE_FP


def batch_signature(batch: dict) -> str:
    """Stable shapes+dtypes signature of an example batch."""
    return ";".join(f"{k}:{tuple(v.shape)}:{v.dtype}"
                    for k, v in sorted(batch.items()))


def cache_path(kind: str, key_parts: Iterable) -> str:
    import jax

    key = "|".join([*map(str, key_parts), code_fingerprint(), jax.__version__])
    digest = hashlib.sha256(key.encode()).hexdigest()[:16]
    return os.path.join(_root(), f"{kind}_{digest}.pkl")


def memoized(kind: str, key_parts: Iterable, build: Callable,
             force: Optional[bool] = None):
    """Return ``build()``, disk-memoized under a key derived from
    ``key_parts`` + package code hash + jax version.

    ``build`` must be deterministic and return a pytree of host numpy
    arrays (plus picklable static fields); the memo is then bit-exact.
    ``force=True/False`` overrides the backend-based default gate.
    """
    enabled = _enabled() if force is None else force
    if not enabled:
        return build()
    path = cache_path(kind, key_parts)
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                return pickle.load(f)
        except Exception:  # corrupt/stale entry -> rebuild below
            pass
    state = build()
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump(state, f)
        os.replace(tmp, path)
    except Exception:  # pragma: no cover - cache is best-effort
        pass
    return state
