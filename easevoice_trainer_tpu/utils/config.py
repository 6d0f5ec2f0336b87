"""Global runtime configuration (env-driven singleton).

TPU-native analogue of the reference ``GlobalCFG``
(reference: src/utils/config/config.py:13-66). Differences by design:

* ``device`` is a JAX platform name; half precision means **bfloat16**
  (TPU-native) rather than fp16, and there is no GPU-name denylist.
* Pretrained weights are never downloaded at import time; paths may point at
  missing files and each consumer degrades gracefully (random init / clear
  error), since the training cluster has no egress.
"""
from __future__ import annotations

import contextlib
import os
import threading
from typing import Optional

from . import paths


def str2bool(v: str | bool) -> bool:
    if isinstance(v, bool):
        return v
    return str(v).strip().lower() in ("1", "true", "t", "yes", "y")


@contextlib.contextmanager
def host_cpu_init():
    """Place init computations on the host CPU WITHOUT persisting their
    XLA:CPU executables in the compilation cache.

    XLA:CPU AOT artifacts embed compiler-chosen pseudo-features
    (``+prefer-no-scatter``/``+prefer-no-gather``) that the runtime
    loader's host-feature detection never reports, so a persisted CPU
    executable fails its machine-type check on *every* load — including
    on the very machine that compiled it — spamming ``cpu_aot_loader.cc``
    errors and recompiling anyway.  Machine-keying the cache directory
    (``GlobalCFG._machine_fingerprint``) cannot fix that; the only robust
    answer is to never persist CPU-placed compiles.  They are cheap init
    paths — the persistent cache exists for the minutes-long TPU step
    compiles, which stay cached.
    """
    import jax

    prev = jax.config.jax_compilation_cache_dir
    cpu = jax.local_devices(backend="cpu")[0]
    try:
        if prev is not None:
            jax.config.update("jax_compilation_cache_dir", None)
        with jax.default_device(cpu):
            yield
    finally:
        if prev is not None:
            jax.config.update("jax_compilation_cache_dir", prev)


class GlobalCFG:
    _instance: Optional["GlobalCFG"] = None
    _lock = threading.Lock()

    def __new__(cls):
        if cls._instance is None:
            with cls._lock:
                if cls._instance is None:
                    inst = super().__new__(cls)
                    inst._init()
                    cls._instance = inst
        return cls._instance

    def _init(self) -> None:
        self.is_half: bool = str2bool(os.environ.get("is_half", "True"))
        self.is_share: bool = str2bool(os.environ.get("is_share", "False"))
        self.is_g2pw: bool = str2bool(os.environ.get("is_g2pw", "True"))

        self.platform = self._detect_platform()
        if self.platform == "cpu":
            # bf16 matmuls on CPU are emulated and slow; keep fp32 there.
            self.is_half = False
        self._enable_compile_cache()

        pretrained = paths.pretrained_root()
        self.gpt_path: str = os.environ.get(
            "gpt_path",
            os.path.join(pretrained, "gsv-v2final-pretrained",
                         "s1bert25hz-5kh-longer-epoch=12-step=369668.ckpt"),
        )
        self.bert_path: str = os.environ.get(
            "bert_path", os.path.join(pretrained, "chinese-roberta-wwm-ext-large"))
        self.cnhubert_path: str = os.environ.get(
            "cnhubert_path", os.path.join(pretrained, "chinese-hubert-base"))
        self.sovits_path: str = os.environ.get(
            "sovits_path",
            os.path.join(pretrained, "gsv-v2final-pretrained", "s2G2333k.pth"),
        )

    @staticmethod
    def _machine_fingerprint(backend: str | None = None,
                             device_kind: str | None = None,
                             cpu_flags: str | None = None) -> str:
        """Cache key for persisted XLA executables: backend + device kind +
        host-CPU feature set.

        The persistent cache stores *compiled machine code*, and not only
        for the accelerator: computations placed on the host CPU (e.g.
        ``jax.default_device(cpu)`` init paths) persist XLA:CPU AOT
        executables whose instruction selection is pinned to the compiling
        machine's CPU features.  Loading those on a host with a different
        feature set fails with ``cpu_aot_loader.cc`` "machine type
        mismatch" errors (or worse, SIGILL).  Keying the cache directory
        on (backend, device kind, CPU flags) makes a cache populated on
        one machine invisible — rather than poisonous — on another.

        Arguments exist for tests; production callers pass nothing.
        """
        import hashlib

        if backend is None or device_kind is None:
            try:
                import jax

                backend = backend or jax.default_backend()
                if device_kind is None:
                    device_kind = jax.devices()[0].device_kind
            except Exception:
                backend = backend or "unknown"
                device_kind = device_kind or "unknown"
        if cpu_flags is None:
            cpu_flags = ""
            try:
                with open("/proc/cpuinfo") as f:
                    for line in f:
                        if line.startswith(("flags", "Features")):
                            cpu_flags = " ".join(
                                sorted(line.split(":", 1)[1].split()))
                            break
            except OSError:
                import platform

                cpu_flags = platform.processor() or platform.machine()
        digest = hashlib.sha256(
            f"{backend}|{device_kind}|{cpu_flags}".encode()).hexdigest()[:12]
        safe_backend = "".join(c if c.isalnum() else "_" for c in backend)
        return f"{safe_backend}-{digest}"

    @staticmethod
    def _purge_unkeyed_cache_entries(root: str) -> None:
        """Remove legacy flat cache entries (pre machine-keying) from the
        cache root.  Keyed per-machine subdirectories (``tpu-a1b2...``) are
        left alone — only loose compile artifacts that any machine would
        load (and possibly SIGILL on) are deleted."""
        import re
        import shutil

        keyed = re.compile(r"^[A-Za-z0-9_]+-[0-9a-f]{12}$")
        try:
            entries = os.listdir(root)
        except OSError:
            return
        for name in entries:
            if keyed.match(name):
                continue
            if name == "init_states":
                # train/init_cache.py memoized init states: platform-
                # independent numpy data, safe on any machine
                continue
            path = os.path.join(root, name)
            try:
                if os.path.isdir(path):
                    shutil.rmtree(path, ignore_errors=True)
                else:
                    os.remove(path)
            except OSError:     # pragma: no cover - best-effort hygiene
                pass

    @classmethod
    def _enable_compile_cache(cls) -> None:
        """Persistent XLA compilation cache shared across processes.

        Every train run is its own subprocess (service/session.py spawns
        cmd entrypoints), and a cold TPU compile of the s2/s1 step is
        minutes — without this cache each run pays it again.  Off-CPU
        only (CPU compiles are cheap and tests churn tiny shapes).
        Disable with EASEVOICE_COMPILE_CACHE=off or point the *root*
        elsewhere with EASEVOICE_COMPILE_CACHE=/path; either way the
        actual cache lives in a per-machine subdirectory (see
        ``_machine_fingerprint``) so artifacts never cross machines.
        """
        val = os.environ.get("EASEVOICE_COMPILE_CACHE", "").strip()
        if val.lower() in ("off", "none", "0"):
            return
        try:
            import jax

            if jax.default_backend() == "cpu":
                return
            cache_root = val or os.path.join(paths.get_base_path(),
                                             "jax_compile_cache")
            cls._purge_unkeyed_cache_entries(cache_root)
            cache_dir = os.path.join(cache_root, cls._machine_fingerprint())
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        except Exception:       # pragma: no cover - cache is best-effort
            pass

    @staticmethod
    def _detect_platform() -> str:
        forced = os.environ.get("JAX_PLATFORMS")
        if forced:
            return forced.split(",")[0].strip()
        try:
            import jax

            return jax.default_backend()
        except Exception:
            return "cpu"

    @classmethod
    def reset(cls) -> None:
        """Testing hook: drop the singleton so env changes take effect."""
        with cls._lock:
            cls._instance = None
