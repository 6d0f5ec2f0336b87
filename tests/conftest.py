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
