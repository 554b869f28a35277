import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from fairdiff.parallel import MeshConfig, create_mesh, replicated, shard_batch
from fairdiff.utils import config as cfglib
from fairdiff.utils import rng


def test_mesh_shapes():
    mesh = create_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data", "model")

    mesh2 = create_mesh(MeshConfig(data=4, model=2))
    assert mesh2.shape["data"] == 4 and mesh2.shape["model"] == 2

    with pytest.raises(ValueError):
        create_mesh(MeshConfig(data=3, model=2))


def test_shard_and_psum():
    mesh = create_mesh()
    x = jnp.arange(16.0).reshape(16, 1)
    xs = shard_batch(mesh, x)
    assert xs.sharding.spec[0] == "data"
    # global mean under data sharding == plain mean (XLA inserts the reduce)
    got = jax.jit(lambda a: a.mean())(xs)
    np.testing.assert_allclose(float(got), float(x.mean()))


def test_replicated():
    mesh = create_mesh()
    p = replicated(mesh, {"w": jnp.ones((4, 4))})
    assert p["w"].sharding.spec == P()


def test_rng_determinism():
    root = rng.root_key(0)
    a = rng.noise_key(root, step=3, lane=1)
    b = rng.noise_key(root, step=3, lane=1)
    assert jnp.all(jax.random.key_data(a) == jax.random.key_data(b))
    c = rng.noise_key(root, step=3, lane=2)
    assert not jnp.all(jax.random.key_data(a) == jax.random.key_data(c))

    n = rng.sample_num_denoising_steps(root, 7)
    assert 19 <= n <= 23
    assert n == rng.sample_num_denoising_steps(root, 7)

    # stable across processes (unlike Python hash)
    assert rng.stable_hash("a photo of a doctor") == rng.stable_hash(
        "a photo of a doctor"
    )


@dataclasses.dataclass(frozen=True)
class _Demo:
    lr: float = 1e-4
    steps: int = 100
    name: str = "x"
    flags: tuple[int, ...] = (1, 2)


def test_config_merge_coercion(tmp_path):
    cfg = _Demo()
    cfg2 = cfglib.merge(cfg, {"lr": "5e-5", "steps": "10"})
    assert cfg2.lr == 5e-5 and cfg2.steps == 10 and isinstance(cfg2.steps, int)

    yml = tmp_path / "o.yaml"
    yml.write_text("steps: 7\nname: run1\n")
    cfg3 = cfglib.load_yaml(cfg, yml)
    assert cfg3.steps == 7 and cfg3.name == "run1"

    with pytest.raises(KeyError):
        cfglib.merge(cfg, {"nope": 1})
