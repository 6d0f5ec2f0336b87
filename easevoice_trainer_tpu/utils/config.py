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

import os
import threading
from typing import Optional

from . import paths


def str2bool(v: str | bool) -> bool:
    if isinstance(v, bool):
        return v
    return str(v).strip().lower() in ("1", "true", "t", "yes", "y")


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
    def _enable_compile_cache() -> None:
        """Persistent XLA compilation cache shared across processes.

        Every train run is its own subprocess (service/session.py spawns
        cmd entrypoints), and a cold TPU compile of the s2/s1 step is
        minutes — without this cache each run pays it again.  Off-CPU
        only (CPU compiles are cheap and tests churn tiny shapes).
        Disable with EASEVOICE_COMPILE_CACHE=off or point it elsewhere
        with EASEVOICE_COMPILE_CACHE=/path.
        """
        val = os.environ.get("EASEVOICE_COMPILE_CACHE", "").strip()
        if val.lower() in ("off", "none", "0"):
            return
        try:
            import jax

            if jax.default_backend() == "cpu":
                return
            cache_dir = val or os.path.join(paths.get_base_path(),
                                            "jax_compile_cache")
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
