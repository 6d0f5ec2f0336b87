"""Network-gated validation of the REAL released checkpoints.

Runs tools/validate_released.py's validators against weights fetched by
tools/fetch_pretrained.py (layout: {repo}/models/...).  Offline — the
normal state of this environment — every case SKIPS (not fails); when
the weights are present each converter must consume the real file with
the documented allow-lists and produce a finite smoke forward.

Marker: ``released`` (excluded from nothing; skips are cheap).
Reference load sites: src/easevoice/inference/tts.py:268-310,
src/audiokit/uvr5/separate.py:93-99,291-296.
"""
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import validate_released as vr  # noqa: E402


@pytest.mark.released
@pytest.mark.parametrize("name", sorted(vr.VALIDATORS))
def test_released_checkpoint(name):
    base = os.environ.get("EASEVOICE_PRETRAINED_BASE", REPO)
    rel, fn = vr.VALIDATORS[name]
    path = os.path.join(base, "models", rel)
    if not os.path.exists(path):
        pytest.skip(f"released weights absent: {path} "
                    "(run tools/fetch_pretrained.py with network access)")
    fn(path)
