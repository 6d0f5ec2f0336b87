"""Machine-keying of the persistent XLA compile cache.

Round-4 regression (VERDICT item 2): XLA:CPU AOT executables persisted on
one machine were loaded on a host with different CPU features, spamming
``cpu_aot_loader.cc`` "machine type mismatch" errors through the bench.
The cache directory is now keyed on (backend, device kind, host CPU
features) so artifacts never cross machines, and legacy flat (unkeyed)
entries are purged at startup.
"""
import os

from easevoice_trainer_tpu.utils.config import GlobalCFG


def test_fingerprint_varies_with_backend():
    a = GlobalCFG._machine_fingerprint("tpu", "TPU v5 lite", "avx2 sse4")
    b = GlobalCFG._machine_fingerprint("cpu", "cpu", "avx2 sse4")
    assert a != b
    assert a.startswith("tpu-")
    assert b.startswith("cpu-")


def test_fingerprint_varies_with_cpu_features():
    a = GlobalCFG._machine_fingerprint("tpu", "TPU v5 lite",
                                       "avx2 avx512f amx-bf16")
    b = GlobalCFG._machine_fingerprint("tpu", "TPU v5 lite", "avx2 sse4")
    assert a != b


def test_fingerprint_varies_with_device_kind():
    a = GlobalCFG._machine_fingerprint("tpu", "TPU v5 lite", "avx2")
    b = GlobalCFG._machine_fingerprint("tpu", "TPU v6 lite", "avx2")
    assert a != b


def test_fingerprint_is_stable_and_path_safe():
    a = GlobalCFG._machine_fingerprint("tpu", "TPU v5 lite", "avx2")
    b = GlobalCFG._machine_fingerprint("tpu", "TPU v5 lite", "avx2")
    assert a == b
    assert "/" not in a and " " not in a


def test_fingerprint_reads_host_features_by_default():
    # No args: must not raise, must produce a keyed name even when jax's
    # backend query fails or /proc/cpuinfo is absent (macOS etc.).
    fp = GlobalCFG._machine_fingerprint()
    backend, _, digest = fp.rpartition("-")
    assert backend and len(digest) == 12
    assert all(c in "0123456789abcdef" for c in digest)


def test_purge_removes_legacy_flat_entries(tmp_path):
    root = tmp_path / "cache"
    root.mkdir()
    # legacy flat artifacts: exactly what a pre-keying checkout holds
    (root / "jit_init-abc123-cache").write_bytes(b"stale aot")
    (root / "jit__lambda-deadbeef-cache").write_bytes(b"stale aot")
    legacy_dir = root / "some_dir"
    legacy_dir.mkdir()
    (legacy_dir / "x").write_bytes(b"y")
    # keyed per-machine dirs must survive
    keep = root / GlobalCFG._machine_fingerprint("tpu", "TPU v5 lite", "f")
    keep.mkdir()
    (keep / "entry-cache").write_bytes(b"good")

    GlobalCFG._purge_unkeyed_cache_entries(str(root))

    remaining = sorted(os.listdir(root))
    assert remaining == [keep.name]
    assert (keep / "entry-cache").exists()


def test_purge_tolerates_missing_root(tmp_path):
    GlobalCFG._purge_unkeyed_cache_entries(str(tmp_path / "nope"))


def test_host_cpu_init_suspends_persistent_cache(tmp_path):
    """XLA:CPU AOT artifacts fail their machine-type check even on the
    compiling machine (compiler pseudo-features like +prefer-no-gather
    never appear in runtime host detection), so host-CPU init compiles
    must never reach the persistent cache."""
    import jax

    from easevoice_trainer_tpu.utils.config import host_cpu_init

    prev = jax.config.jax_compilation_cache_dir
    try:
        jax.config.update("jax_compilation_cache_dir", str(tmp_path))
        with host_cpu_init():
            assert jax.config.jax_compilation_cache_dir is None
            # compiles inside run on host CPU and are not persisted
            y = jax.jit(lambda x: x * 2)(3.0)
            assert float(y) == 6.0
        assert jax.config.jax_compilation_cache_dir == str(tmp_path)
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)


def test_host_cpu_init_places_on_cpu():
    import jax

    from easevoice_trainer_tpu.utils.config import host_cpu_init

    with host_cpu_init():
        x = jax.jit(lambda: jax.numpy.zeros((2,)))()
    assert x.devices() == {jax.local_devices(backend="cpu")[0]}
