"""Device mesh and sharding helpers.

TPU-native replacement for the reference's NCCL/torch.distributed layer
(reference: exp-1-debias-gender/1-main-debias.py:222-235 `customized_all_gather`,
:821/:1832 broadcasts, :1996-2011 manual grad all-reduce, accelerate MULTI_GPU
configs). On TPU there is no process-group plumbing: we build one
`jax.sharding.Mesh` over all devices and express placement with
`NamedSharding`; XLA inserts the collectives (psum/all-gather) over ICI.

The reference's rank-0 broadcasts of freshly-initialised parameters become
unnecessary: the same jitted init with the same PRNG key yields identical
values on every device. Its `customized_all_gather` of per-rank probability
tensors becomes a no-op under pjit — a batch-sharded array *is* the global
array; any consumer that needs it replicated just requests a replicated
sharding.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Logical mesh layout.

    data:  batch / image-ensemble parallelism (the reference's only axis —
           2-way DP over A100s; here it is N-way over TPU chips).
    model: tensor-parallel axis — Megatron-style column/row sharding of
           UNet/CLIP attention heads and the TE MLP (fairdiff/parallel/tp.py).
           Size 1 (pure DP) suffices at SD-1.5 scale (SURVEY.md §2.5);
           sizes 2/4 divide per-chip activation memory past one HBM.
    """

    data: int = -1  # -1 = all remaining devices
    model: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int]:
        model = max(1, self.model)
        data = self.data if self.data > 0 else n_devices // model
        if data * model != n_devices:
            raise ValueError(
                f"mesh {data}x{model} does not tile {n_devices} devices"
            )
        return data, model


def create_mesh(
    config: MeshConfig | None = None,
    *,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a 2-D ("data", "model") mesh over the given devices.

    Device order follows `jax.devices()` which on TPU enumerates chips in
    ICI-contiguous order, so both mesh axes ride ICI, never DCN, within a
    slice.
    """
    config = config or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    data, model = config.resolve(len(devices))
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def shard_batch(mesh: Mesh, tree: Any, axis: int = 0) -> Any:
    """Place every leaf with dim `axis` sharded across the "data" mesh axis."""

    def _shard(x):
        x = jax.numpy.asarray(x)
        spec = [None] * x.ndim
        spec[axis] = "data"
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map(_shard, tree)


def replicated(mesh: Mesh, tree: Any) -> Any:
    """Replicate every leaf of the tree across the whole mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def with_sharding(mesh: Mesh, spec: P, x: Any) -> Any:
    """In-jit sharding constraint (annotation for XLA's SPMD partitioner)."""
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def local_slice(n: int, axis_size: int, axis_index: int) -> slice:
    """The reference slices gathered tensors back to a per-rank span
    (exp-1:1836-1838). Equivalent span arithmetic for host-side code paths.
    """
    per = math.ceil(n / axis_size)
    return slice(axis_index * per, min((axis_index + 1) * per, n))
