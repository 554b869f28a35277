"""Checkpoint dual-cadence save/GC/restore + adapter npz round-trip +
grid plotting smoke."""

import chex
import jax
import jax.numpy as jnp
import numpy as np
import optax

from fairdiff.io.adapters_io import load_adapters, save_adapters
from fairdiff.training.checkpoints import DualCadenceCheckpointer
from fairdiff.training.debias import DebiasState
from fairdiff.utils.grids import plot_in_grid


def _mk_state(step, val=1.0):
    adapters = {"te_lora": {"layer": {"down": jnp.full((3, 2), val), "up": jnp.zeros((2, 3))}}}
    tx = optax.adamw(1e-4)
    return DebiasState(adapters, tx.init(adapters), adapters, step)


def test_dual_cadence_and_restore(tmp_path):
    ckpt = DualCadenceCheckpointer(
        tmp_path, tmp_every=2, perm_every=10, tmp_keep=2
    )
    for step in range(1, 13):
        ckpt.maybe_save(_mk_state(step, float(step)))
    ckpt.wait()
    # tmp keeps only 2 newest of {2,4,6,8,12}; 10 went to perm
    assert ckpt._perm.all_steps() == [10]
    assert len(ckpt._tmp.all_steps()) == 2
    assert ckpt.latest_step() == 12

    restored = ckpt.restore(_mk_state(0))
    assert restored.step == 12
    np.testing.assert_allclose(
        np.asarray(restored.adapters["te_lora"]["layer"]["down"]), 12.0
    )
    # restore a specific permanent step
    r10 = ckpt.restore(_mk_state(0), step=10)
    assert r10.step == 10
    ckpt.close()


def test_adapters_npz_roundtrip(tmp_path):
    tree = {
        "a": {"down": np.ones((2, 3)), "up": np.zeros((3, 2))},
        "b": {"c": {"kernel": np.arange(6.0).reshape(2, 3)}},
    }
    save_adapters(tmp_path / "x.npz", tree)
    back = load_adapters(tmp_path / "x.npz")
    chex.assert_trees_all_close(tree, back)


def test_plot_in_grid(tmp_path):
    rng = np.random.default_rng(0)
    imgs = rng.uniform(-1, 1, (6, 16, 16, 3))
    out = plot_in_grid(
        imgs,
        tmp_path / "grid.jpg",
        face_indicators=np.array([1, 1, 0, 1, 1, 1], bool),
        preds=np.array([0, 1, -1, 0, 1, 1]),
        probs_max=np.array([0.9, 0.6, -1, 0.7, 0.95, 0.5]),
    )
    assert out.exists() and out.stat().st_size > 500


def test_cast_floats_and_sd_loader_cast(tmp_path):
    import jax.numpy as jnp

    from fairdiff.io.checkpoints import cast_floats, load_sd_params, save_params

    tree = {
        "w": np.ones((2, 2), np.float32),
        "ids": np.arange(4, dtype=np.int32),
        "nested": {"b": np.zeros((3,), np.float64)},
    }
    out = cast_floats(tree, jnp.bfloat16)
    assert out["w"].dtype == jnp.bfloat16
    assert out["ids"].dtype == np.int32  # non-float passes through
    assert out["nested"]["b"].dtype == jnp.bfloat16

    save_params(tmp_path, {
        "text_encoder": {"w": np.ones((2,), np.float32)},
        "unet": {"w": np.ones((2,), np.float32)},
        "vae": {"w": np.ones((2,), np.float32)},
    })
    loaded = load_sd_params(tmp_path)  # default bf16 residency
    assert loaded["unet"]["w"].dtype == jnp.bfloat16
    loaded32 = load_sd_params(tmp_path, cast=None)
    assert loaded32["unet"]["w"].dtype == np.float32
