"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is validated here without TPU hardware
(XLA host-platform device partitioning); the real-chip path is exercised by
bench.py and the driver's graft entry checks.
"""
import os

# Must be set before jax is imported anywhere in the test process.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The env var alone is not honored when an out-of-tree TPU plugin (axon) is
# installed; the config update is.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def _build_native_lib() -> None:
    """Build csrc/evaudio.cpp when a compiler exists so the
    tests/test_native.py parity tests run instead of skipping.
    Rebuilds when the source is newer than the .so; never fails the
    session (the package has numpy fallbacks for every native entry)."""
    import shutil
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(root, "csrc", "evaudio.cpp")
    so = os.path.join(root, "easevoice_trainer_tpu", "native",
                      "libevaudio.so")
    if not os.path.exists(src) or shutil.which("g++") is None:
        return
    if (os.path.exists(so)
            and os.path.getmtime(so) >= os.path.getmtime(src)):
        return
    try:
        subprocess.run(["sh", os.path.join(root, "tools", "build_native.sh")],
                       check=True, capture_output=True, timeout=300)
    except Exception as exc:  # pragma: no cover - fallback paths tested
        import warnings
        warnings.warn(f"native build failed, numpy fallbacks in use: {exc}")


_build_native_lib()


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def install_pypinyin_stub():
    """Complete pypinyin stand-in backed by the repo's vendored table, so
    reference modules (tone_sandhi, chinese_norm constants) import for the
    differential tests.  Idempotent; safe across test-order permutations."""
    import sys
    import types

    from easevoice_trainer_tpu.text.chinese import _backend

    backend = _backend()
    pp = sys.modules.get("pypinyin")
    if pp is None:
        pp = types.ModuleType("pypinyin")
        sys.modules["pypinyin"] = pp
    if not hasattr(pp, "Style"):
        class Style:
            FINALS_TONE3 = "finals_tone3"
            INITIALS = "initials"
            TONE3 = "tone3"

        def lazy_pinyin(word, style=None, neutral_tone_with_five=False,
                        **kw):
            pairs = backend(word)
            if style == Style.INITIALS:
                return [c for c, _ in pairs]
            return [v if c == v else c + v for c, v in pairs] \
                if style == Style.TONE3 else [v for _, v in pairs]

        pp.Style = Style
        pp.lazy_pinyin = lazy_pinyin
        pp.pinyin = lambda *a, **k: []
    if "pypinyin.compat" not in sys.modules:
        compat = types.ModuleType("pypinyin.compat")
        compat.SUPPORT_UCS4 = True
        pp.compat = compat
        sys.modules["pypinyin.compat"] = compat
    return pp
