"""Parameter-arena invariants (train/arena.py).

The arena must be a pure re-layout: packing params into stacked groups
and running the optimizer on the stacks has to reproduce the per-leaf
optimizer bit for bit (elementwise updates are invariant under
stacking).  Reference semantics under test: torch AdamW per param group
(reference: src/train/sovits.py:459-525 optimizer setup).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from easevoice_trainer_tpu.train import arena as arena_mod
from easevoice_trainer_tpu.train import sovits_step


def _toy_tree(seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    return {
        "enc_p": {
            "text_embedding": {"embedding": mk(11, 8)},
            "encoder_text": {"w": mk(8, 8), "b": mk(8)},
            "mrte": {"w": mk(8, 8)},
            "other": {"w": mk(8, 8), "b": mk(8)},
        },
        "dec": {
            "c1": {"kernel": mk(3, 4, 4), "bias": mk(4)},
            "c2": {"kernel": mk(3, 4, 4), "bias": mk(4)},
            "scalar": mk(),
        },
    }


def test_pack_unpack_roundtrip():
    tree = _toy_tree()
    ar = arena_mod.build_arena(tree, sovits_step._text_lr_label)
    packed = arena_mod.pack(ar, tree)
    # grouping really merges same-shape leaves
    assert len(packed) < len(jax.tree_util.tree_leaves(tree))
    back = arena_mod.unpack(ar, packed)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        tree, back)


def test_label_grouping_separates_text_lr():
    tree = _toy_tree()
    ar = arena_mod.build_arena(tree, sovits_step._text_lr_label)
    labels = set(ar.group_labels)
    assert labels == {"base", "text"}
    # same shape (8,8) but different label must land in different groups
    keys = [k for k in ar.group_keys if k.endswith("8x8")]
    assert len(keys) == 2


def test_arena_adamw_matches_per_leaf_bitwise(monkeypatch):
    # pin fp32 moments: this test asserts the STACKING invariance
    # bitwise; bf16-moment drift has its own bound in test_optim_lowp.py
    monkeypatch.setenv("EASEVOICE_OPT_STATE", "fp32")
    hp = sovits_step.S2TrainHP(learning_rate=2e-3, text_low_lr_rate=0.4)
    tree = _toy_tree()
    grads = _toy_tree(seed=1)

    # per-leaf reference: exactly the pre-arena construction
    def lr_fn(scale):
        return lambda step: hp.learning_rate * scale * (hp.lr_decay ** (step // 2))

    def adamw(fn):
        return optax.adamw(fn, b1=hp.betas[0], b2=hp.betas[1], eps=hp.eps,
                           weight_decay=hp.weight_decay)

    labels = jax.tree_util.tree_map_with_path(sovits_step._text_lr_label, tree)
    ref_opt = optax.multi_transform(
        {"base": adamw(lr_fn(1.0)), "text": adamw(lr_fn(hp.text_low_lr_rate))},
        labels)
    ref_state = ref_opt.init(tree)
    ref_params = tree
    for i in range(3):
        upd, ref_state = ref_opt.update(grads, ref_state, ref_params)
        ref_params = optax.apply_updates(ref_params, upd)

    # arena path
    ar = arena_mod.build_arena(tree, sovits_step._text_lr_label)
    ar_d = arena_mod.build_arena(tree)
    opt_g, _ = sovits_step.make_optimizers(
        sovits_step.S2TrainHP(learning_rate=2e-3, text_low_lr_rate=0.4),
        ar, ar_d, steps_per_epoch=2)
    packed = arena_mod.pack(ar, tree)
    pgrads = arena_mod.pack(ar, grads)
    ostate = opt_g.init(packed)
    for i in range(3):
        upd, ostate = opt_g.update(pgrads, ostate, packed)
        packed = optax.apply_updates(packed, upd)
    got = arena_mod.unpack(ar, packed)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        ref_params, got)


def test_rowwise_scaled_adam_matches_per_leaf():
    """scaled_adam(rowwise=True) on arena-packed params must reproduce the
    per-leaf trajectory (reference semantics: k2 ScaledAdam,
    optim.py:123-622) — including scalar leaves, size updates (step % K)
    and the clipping-norm bookkeeping."""
    from easevoice_trainer_tpu.train.scaled_adam import scaled_adam

    tree = {
        "a": {"w1": None, "w2": None, "s": None},
        "b": {"w3": None, "emb": None},
    }
    rng = np.random.default_rng(7)
    mk = lambda *s: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.3)
    tree = {
        "a": {"w1": mk(6, 4), "w2": mk(6, 4), "s": mk()},
        "b": {"w3": mk(6, 4), "emb": mk(9, 3), "s2": mk()},
    }
    grads0 = jax.tree_util.tree_map(lambda p: mk(*p.shape), tree)

    kw = dict(learning_rate=0.02, size_update_period=2,
              clipping_scale=2.0, clipping_update_period=4)
    ref = scaled_adam(**kw)
    row = scaled_adam(**kw, rowwise=True)

    ar = arena_mod.build_arena(tree)
    packed = arena_mod.pack(ar, tree)
    pgrads = arena_mod.pack(ar, grads0)

    rs, ps = ref.init(tree), row.init(packed)
    p_ref, p_row = tree, packed
    for i in range(6):   # crosses a size-update and the first ring slots
        u, rs = ref.update(grads0, rs, p_ref)
        p_ref = optax.apply_updates(p_ref, u)
        up, ps = row.update(pgrads, ps, p_row)
        p_row = optax.apply_updates(p_row, up)
    got = arena_mod.unpack(ar, p_row)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7),
        p_ref, got)


def test_state_params_tree_view():
    tree = _toy_tree()
    ar = arena_mod.build_arena(tree, sovits_step._text_lr_label)
    state = sovits_step.S2TrainState(
        step=jnp.zeros((), jnp.int32),
        params_g=arena_mod.pack(ar, tree), params_d=arena_mod.pack(ar, tree),
        opt_g=None, opt_d=None, arena_g=ar, arena_d=ar)
    view = sovits_step.params_tree(state, "g")
    np.testing.assert_array_equal(
        np.asarray(view["dec"]["c1"]["kernel"]),
        np.asarray(tree["dec"]["c1"]["kernel"]))
    # replace-through-tree round-trips
    tree2 = jax.tree_util.tree_map(lambda x: x + 1.0, tree)
    state2 = sovits_step.with_params_tree(state, tree2, "g")
    view2 = sovits_step.params_tree(state2, "g")
    np.testing.assert_allclose(
        np.asarray(view2["dec"]["scalar"]), np.asarray(tree["dec"]["scalar"]) + 1.0)


def test_packed_state_serialization_roundtrip():
    """Resume checkpoints serialize the packed state with flax msgpack and
    restore against a template (train/sovits.py _save_resume/_try_resume);
    static arena fields must survive via the template, data fields via the
    blob."""
    import flax.serialization

    tree = _toy_tree()
    ar = arena_mod.build_arena(tree, sovits_step._text_lr_label)
    packed = arena_mod.pack(ar, tree)
    state = sovits_step.S2TrainState(
        step=jnp.asarray(7, jnp.int32),
        params_g=packed, params_d=packed,
        opt_g={"m": packed}, opt_d=None,
        arena_g=ar, arena_d=ar)
    blob = flax.serialization.to_bytes(state)

    fresh_tree = jax.tree_util.tree_map(jnp.zeros_like, tree)
    template = sovits_step.S2TrainState(
        step=jnp.zeros((), jnp.int32),
        params_g=arena_mod.pack(ar, fresh_tree),
        params_d=arena_mod.pack(ar, fresh_tree),
        opt_g={"m": arena_mod.pack(ar, fresh_tree)}, opt_d=None,
        arena_g=ar, arena_d=ar)
    restored = flax.serialization.from_bytes(template, blob)
    assert int(restored.step) == 7
    assert restored.arena_g is ar
    got = sovits_step.params_tree(restored, "g")
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        tree, got)
