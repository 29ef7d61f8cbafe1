"""Orbax-backed sharded checkpoint option (utils/orbax_io.py): save sharded
params on the 8-device mesh, restore with the same shardings, bitwise
round-trip — the multi-host checkpoint path msgpack can't cover."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from deepfake_vit_tpu.parallel import data_parallel_mesh
from deepfake_vit_tpu.utils.orbax_io import (
    restore_checkpoint_sharded,
    save_checkpoint_sharded,
)


def test_sharded_roundtrip(tmp_path):
    mesh = data_parallel_mesh()
    sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    rng = np.random.default_rng(0)
    tree = {
        "dense": {"kernel": jax.device_put(
            rng.normal(0, 1, (16, 8)).astype(np.float32), sh)},
        "bias": jax.device_put(rng.normal(0, 1, (8,)).astype(np.float32), repl),
        "step": jax.device_put(np.int32(7), repl),
    }
    path = save_checkpoint_sharded(tree, tmp_path / "ckpt")
    assert path.exists()

    template = jax.tree_util.tree_map(lambda x: x, tree)
    out = restore_checkpoint_sharded(path, template=template)
    for a, b in zip(jax.tree_util.tree_leaves(out), jax.tree_util.tree_leaves(tree)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored kernel keeps the sharded layout
    assert out["dense"]["kernel"].sharding.is_equivalent_to(sh, 2)
