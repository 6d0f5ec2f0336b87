"""train/init_cache.py — bit-exact disk memoization of train-state inits."""
import os
import pickle

import jax
import numpy as np
import pytest

from easevoice_trainer_tpu.train import init_cache


@pytest.fixture()
def cache_env(tmp_path, monkeypatch):
    monkeypatch.setenv("EASEVOICE_COMPILE_CACHE", str(tmp_path))
    monkeypatch.setenv("EASEVOICE_INIT_CACHE", "on")
    return tmp_path


def test_memoized_roundtrip_bit_exact(cache_env):
    calls = []

    def build():
        calls.append(1)
        return {"w": np.arange(6, dtype=np.float32).reshape(2, 3),
                "b": np.float32(1.5)}

    first = init_cache.memoized("t", ("a", 1), build)
    second = init_cache.memoized("t", ("a", 1), build)
    assert len(calls) == 1  # second call served from disk
    np.testing.assert_array_equal(first["w"], second["w"])
    assert first["b"] == second["b"]
    assert os.path.isdir(os.path.join(str(cache_env), "init_states"))


def test_key_varies_with_parts_and_code(cache_env):
    p1 = init_cache.cache_path("t", ("a", 1))
    p2 = init_cache.cache_path("t", ("a", 2))
    p3 = init_cache.cache_path("u", ("a", 1))
    assert len({p1, p2, p3}) == 3


def test_corrupt_entry_falls_back_to_build(cache_env):
    path = init_cache.cache_path("t", ("x",))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(b"not a pickle")
    out = init_cache.memoized("t", ("x",), lambda: {"v": np.ones(2)})
    np.testing.assert_array_equal(out["v"], np.ones(2))
    # the rebuilt state replaced the corrupt entry
    with open(path, "rb") as f:
        np.testing.assert_array_equal(pickle.load(f)["v"], np.ones(2))


def test_disabled_on_cpu_backend_by_default(cache_env, monkeypatch):
    monkeypatch.delenv("EASEVOICE_INIT_CACHE")
    calls = []

    def build():
        calls.append(1)
        return np.zeros(1)

    init_cache.memoized("t", ("y",), build)
    init_cache.memoized("t", ("y",), build)
    assert len(calls) == 2  # cpu default backend -> no caching
    # force=True overrides the gate
    init_cache.memoized("t", ("y",), build, force=True)
    init_cache.memoized("t", ("y",), build, force=True)
    assert len(calls) == 3


def test_purge_spares_init_states(tmp_path):
    from easevoice_trainer_tpu.utils.config import GlobalCFG

    keep = tmp_path / "init_states"
    keep.mkdir()
    (keep / "s2_init_abc.pkl").write_bytes(b"x")
    legacy = tmp_path / "some_legacy_entry"
    legacy.write_bytes(b"x")
    keyed = tmp_path / "tpu-0123456789ab"
    keyed.mkdir()
    GlobalCFG._purge_unkeyed_cache_entries(str(tmp_path))
    assert (keep / "s2_init_abc.pkl").exists()
    assert keyed.exists()
    assert not legacy.exists()


def test_s2_init_independent_of_steps_per_epoch():
    """Justifies excluding steps_per_epoch from the s2 memo key: it only
    parameterizes the LR schedule closure, never the init values."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _dist_worker import s2_fixture
    from easevoice_trainer_tpu.train import sovits_step

    synth, disc, hp, _mel, batch = s2_fixture()
    s1 = sovits_step.create_train_state(
        jax.random.PRNGKey(3), synth, disc, hp, batch, steps_per_epoch=1)
    s2 = sovits_step.create_train_state(
        jax.random.PRNGKey(3), synth, disc, hp, batch, steps_per_epoch=7)
    l1 = jax.tree_util.tree_leaves(s1)
    l2 = jax.tree_util.tree_leaves(s2)
    assert len(l1) == len(l2)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_production_state_pickle_roundtrips(tmp_path):
    """The memo stores the full S2TrainState incl. static arena specs —
    assert the pytree (treedefs and all) survives pickle bit-exactly."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from _dist_worker import s2_fixture
    from easevoice_trainer_tpu.train import sovits_step

    synth, disc, hp, _mel, batch = s2_fixture()
    state = sovits_step.create_train_state(
        jax.random.PRNGKey(0), synth, disc, hp, batch, steps_per_epoch=2)
    state = jax.tree_util.tree_map(np.asarray, state)
    blob = pickle.dumps(state)
    loaded = pickle.loads(blob)
    assert (jax.tree_util.tree_structure(loaded)
            == jax.tree_util.tree_structure(state))
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(a, b)
