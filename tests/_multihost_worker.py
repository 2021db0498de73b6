"""Multi-process worker for tests/test_multihost_mp.py.

Run as: python _multihost_worker.py <process_id> <num_processes> <port>

Each process owns 2 virtual CPU devices; jax.distributed wires them into
one 4-device global mesh with REAL cross-process collectives (XLA CPU's
gloo backend). The worker drives the production multihost recipe
(parallel/multihost.py): initialize -> global_data_mesh -> host_shard /
local_device_batches -> the Trainer's DP train step — and asserts the
multi-process result equals the locally-computed single-device step
(every global device is fed the same sub-batch, so pmean(grads) must
reproduce the single-device update bit-for-tolerance).
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
)
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from molkgnn_tpu.parallel import multihost  # noqa: E402

multihost.initialize(
    coordinator_address=f"localhost:{port}",
    num_processes=nproc,
    process_id=pid,
)
assert jax.process_count() == nproc, jax.process_count()
assert jax.local_device_count() == 2
assert len(jax.devices()) == 2 * nproc

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from molkgnn_tpu.data.dataset import GraphLoader, make_synthetic_dataset  # noqa: E402
from molkgnn_tpu.graphs import spec_for_graphs  # noqa: E402
from molkgnn_tpu.models import MolKGNNNet  # noqa: E402
from molkgnn_tpu.parallel import stack_shards  # noqa: E402
from molkgnn_tpu.parallel.data_parallel import shard_train_step  # noqa: E402
from molkgnn_tpu.training import GNNModel, TrainConfig, Trainer  # noqa: E402

# Identical seeded construction on every process => identical params.
ds = make_synthetic_dataset(seed=11, num_graphs=32)
spec = spec_for_graphs(ds.graphs, batch_size=2)
model = GNNModel(
    encoder=MolKGNNNet(
        num_layers=1,
        kernels_1hop=(2, 3, 4, 5),
        kernels_nhop=(2, 3, 4, 5),
        graph_embedding_dim=8,
    ),
    ffn_dropout_rate=0.0,
)
cfg = TrainConfig(
    batch_size=2, max_epochs=1, warmup_iterations=5,
    oversample=False, progress=False, use_device_data=False,
)
trainer = Trainer(model, ds, spec, cfg)

# Input-pipeline contracts: each host packs only its own slice.
ids = list(range(8))
mine = multihost.host_shard(ids)
assert mine == (ids[:4] if pid == 0 else ids[4:]), mine
gb = np.arange(4 * 3, dtype=np.int32).reshape(4, 3)  # [n_global_dev, B]
loc = multihost.local_device_batches(gb)
np.testing.assert_array_equal(loc, gb[2 * pid : 2 * pid + 2])

mesh = multihost.global_data_mesh()
n_glob = 2 * nproc

# One sub-batch replicated to every global device: pmean of identical
# grads == the single-device step on that sub-batch.
batch = next(iter(GraphLoader(ds.graphs[:2], spec, 2)))
stacked = stack_shards([batch] * n_glob)


def to_global(tree, sharding_spec):
    sh = NamedSharding(mesh, sharding_spec)

    def put(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
            data = np.asarray(jax.random.key_data(x))
            arr = jax.make_array_from_callback(
                data.shape, sh, lambda idx: data[idx]
            )
            return jax.random.wrap_key_data(arr)
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])

    return jax.tree.map(put, tree)


state_g = to_global(trainer.state, P())
batch_g = to_global(stacked, P("data"))

step = shard_train_step(trainer._train_step_fn, mesh)
new_state, loss = step(state_g, batch_g)

# Local single-device reference on the same sub-batch.
sd_state, sd_loss = trainer._train_step(
    jax.tree.map(jnp.array, trainer.state), batch
)

np.testing.assert_allclose(
    float(np.asarray(jax.device_get(loss))), float(sd_loss), rtol=1e-6
)
got = jax.tree.leaves(jax.device_get(new_state.params))
want = jax.tree.leaves(jax.device_get(sd_state.params))
assert len(got) == len(want)
for g, w in zip(got, want):
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(w), rtol=1e-5, atol=1e-7
    )
print(f"MULTIHOST-OK pid={pid} loss={float(np.asarray(loss)):.6f}", flush=True)

# Device-sampled DP over the REAL multi-process mesh (r4): every global
# device draws its own weighted ids ON DEVICE (zero per-step host input),
# gathers its sub-batch from its replicated HBM dataset copy, and pmeans
# grads across processes. The replicated per-step losses must agree
# bit-for-bit between the two processes (asserted by the parent test
# comparing the printed vectors).
from molkgnn_tpu.data.dataset import oversampling_weights  # noqa: E402
from molkgnn_tpu.graphs.device_pack import (  # noqa: E402
    DeviceDataset,
    alias_sampler,
    gather_batch,
)
from molkgnn_tpu.graphs.packed import PackedGraphs  # noqa: E402
from molkgnn_tpu.parallel.data_parallel import shard_sample_steps  # noqa: E402

dd_g = to_global(
    DeviceDataset.from_packed(PackedGraphs.from_graphs(ds.graphs)), P()
)
labels = np.array([g.y for g in ds.graphs])
consts_g = to_global(
    (
        jnp.arange(len(ds.graphs), dtype=jnp.int32),
        jax.tree.map(jnp.asarray, alias_sampler(oversampling_weights(labels))),
    ),
    P(),
)
prog = shard_sample_steps(
    trainer._train_step_fn, gather_batch, spec, mesh, 2, 2, 0x5A17
)
st_s, losses_s, edges_s = prog(to_global(trainer.state, P()), dd_g, *consts_g)
losses_s = np.asarray(jax.device_get(losses_s))
edges_s = np.asarray(jax.device_get(edges_s))
assert np.all(np.isfinite(losses_s)), losses_s
assert int(np.asarray(jax.device_get(st_s.step))) == 2
print(
    f"MULTIHOST-DEVSAMPLE-OK pid={pid} "
    f"losses={losses_s.round(6).tolist()} edges={edges_s.tolist()}",
    flush=True,
)
