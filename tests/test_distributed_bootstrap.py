"""Two-process CPU smoke for the jax.distributed bootstrap (SURVEY §2.10).

Spawns two real processes that initialize through
``maybe_initialize_distributed`` (env-driven), build one global mesh over
both processes' virtual CPU devices, assemble a process-sharded global
array, and run a jitted global reduction — the full multi-process
data-parallel contract end to end, CPU-only."""

import os
import subprocess
import sys
import textwrap
from pathlib import Path

_WORKER = textwrap.dedent(
    """
    import numpy as np

    from deepfake_vit_tpu.parallel import maybe_initialize_distributed

    assert maybe_initialize_distributed()

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from deepfake_vit_tpu.data.dataset import HostLoader
    from deepfake_vit_tpu.parallel import make_mesh

    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()   # 2 local × 2 procs

    mesh = make_mesh(("data",))
    sharding = NamedSharding(mesh, P("data"))

    # Each process contributes its own stripe of the global batch.
    local = np.full((2, 3), jax.process_index() + 1.0, np.float32)
    global_arr = jax.make_array_from_process_local_data(sharding, local, (4, 3))
    total = jax.jit(lambda a: a.sum(), out_shardings=NamedSharding(mesh, P()))(global_arr)
    got = float(jax.device_get(total))
    assert got == 2 * 3 * (1.0 + 2.0), got

    # Loader stripes follow process_index: disjoint coverage of 8 items.
    class _DS:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            return {"image": np.full((2, 2, 3), i, np.float32), "label": np.int32(0)}

    loader = HostLoader(_DS(), batch_size=2, shuffle=True, seed=11,
                        process_index=jax.process_index(),
                        process_count=jax.process_count())
    ids = sorted(
        int(v) for b in loader for v in b["image"][:, 0, 0, 0].tolist()
    )
    assert len(ids) == 4
    print(f"OK process={jax.process_index()} ids={ids}", flush=True)
    """
)


def test_two_process_cpu_bootstrap(tmp_path):
    port = 17365
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            JAX_PLATFORM_NAME="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            DFV_COORDINATOR=f"localhost:{port}",
            DFV_NUM_PROCESSES="2",
            DFV_PROCESS_ID=str(pid),
        )
        env.pop("JAX_PLATFORM_ALLOW_UNRECOGNIZED", None)
        # Pure-CPU subprocess: the ambient PALLAS_AXON_POOL_IPS makes the
        # sitecustomize axon.register call run at import, which blocks jax
        # backend init for minutes when the TPU tunnel is busy/wedged —
        # regardless of JAX_PLATFORMS=cpu (CLAUDE.md round-3 lessons).
        env.pop("PALLAS_AXON_POOL_IPS", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER],
                env=env,
                cwd=str(Path(__file__).resolve().parents[1]),
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"OK process={pid}" in out

    # The two stripes must be disjoint and jointly cover 0..7.
    import re

    sets = [set(map(int, re.search(r"ids=\[(.*)\]", o).group(1).split(","))) for o in outs]
    assert not (sets[0] & sets[1])
    assert sets[0] | sets[1] == set(range(8))
