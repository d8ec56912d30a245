# Copyright (c) 2026 touchnet_tpu authors.
# ParallelDims: validated N-D parallel degrees -> jax.sharding.Mesh.
#
# Capability parity: reference touchnet/utils/distributed.py:72-196
# (ParallelDims + build_mesh over torch DeviceMesh, with flattened submeshes
# dp / dp_shard_cp / dp_cp). In JAX the "flattened" meshes become axis-name
# TUPLES inside PartitionSpecs — XLA folds multi-axis shardings natively, so
# no mesh flattening machinery is needed:
#   dp          = ("dp_replicate", "dp_shard")      — data loading / batch
#   dp_shard_cp = ("dp_shard", "cp")                — parameter sharding (FSDP)
#   dp_cp       = ("dp_replicate", "dp_shard", "cp")— loss/grad all-reduce
# Mesh axis order [pp, dp_replicate, dp_shard, cp, tp] matches the reference
# so collective locality follows the same layout (tp innermost -> ICI).

from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
from jax.sharding import Mesh

MESH_AXES = ("pp", "dp_replicate", "dp_shard", "cp", "tp")

DP = ("dp_replicate", "dp_shard")
DP_SHARD_CP = ("dp_shard", "cp")
DP_CP = ("dp_replicate", "dp_shard", "cp")


@dataclass
class ParallelDims:
    dp_replicate: int = 1
    dp_shard: int = -1  # -1 => autofill leftover devices
    cp: int = 1
    tp: int = 1
    pp: int = 1
    world_size: int = field(default=-1)
    enable_loss_parallel: bool = False

    def __post_init__(self):
        if self.world_size == -1:
            self.world_size = jax.device_count()
        self._validate()

    def _validate(self):
        for name in ("dp_replicate", "cp", "tp", "pp"):
            assert getattr(self, name) >= 1, f"{name} must be >= 1"
        assert self.dp_shard == -1 or self.dp_shard >= 1
        if self.dp_shard == -1:
            denom = self.dp_replicate * self.cp * self.tp * self.pp
            assert self.world_size % denom == 0, (
                f"world_size {self.world_size} not divisible by "
                f"dp_replicate*cp*tp*pp = {denom}"
            )
            self.dp_shard = self.world_size // denom
        total = self.dp_replicate * self.dp_shard * self.cp * self.tp * self.pp
        assert total == self.world_size, (
            f"dp_replicate({self.dp_replicate}) * dp_shard({self.dp_shard}) * "
            f"cp({self.cp}) * tp({self.tp}) * pp({self.pp}) = {total} "
            f"!= world_size({self.world_size})"
        )

    def build_mesh(self, devices=None) -> Mesh:
        shape = (self.pp, self.dp_replicate, self.dp_shard, self.cp, self.tp)
        if devices is None:
            devices = jax.devices()
        import numpy as np

        dev_array = np.asarray(devices[: self.world_size]).reshape(shape)
        return Mesh(dev_array, MESH_AXES)

    # -- enabled-degree properties (reference ParallelDims API) --
    @property
    def dp_enabled(self) -> bool:
        return self.dp_replicate > 1 or self.dp_shard > 1

    @property
    def dp_replicate_enabled(self) -> bool:
        return self.dp_replicate > 1

    @property
    def dp_shard_enabled(self) -> bool:
        return self.dp_shard > 1

    @property
    def cp_enabled(self) -> bool:
        return self.cp > 1

    @property
    def tp_enabled(self) -> bool:
        return self.tp > 1

    @property
    def pp_enabled(self) -> bool:
        return self.pp > 1

    @property
    def loss_parallel_enabled(self) -> bool:
        return self.tp > 1 and self.enable_loss_parallel

    @property
    def dp_degree(self) -> int:
        """Data-loading world size (reference mesh["dp"])."""
        return self.dp_replicate * self.dp_shard

    @property
    def non_data_parallel_size(self) -> int:
        return self.cp * self.tp * self.pp

    def dp_rank(self, mesh: Optional[Mesh] = None) -> int:
        """This process's data-parallel rank (for dataloader sharding).
        Single-process (one controller over all devices): rank 0 loads for
        every dp index — per-dp-rank streams are split by the loader."""
        if jax.process_count() == 1:
            return 0
        # multi-process: derive from the first local device's mesh coords
        mesh = mesh or self.build_mesh()
        dev = jax.local_devices()[0]
        coords = dict(zip(MESH_AXES, _device_coords(mesh, dev)))
        return coords["dp_replicate"] * self.dp_shard + coords["dp_shard"]


def _device_coords(mesh: Mesh, device) -> Tuple[int, ...]:
    import numpy as np

    idx = np.argwhere(mesh.devices == device)
    assert idx.shape[0] == 1, f"device {device} not in mesh"
    return tuple(int(i) for i in idx[0])
