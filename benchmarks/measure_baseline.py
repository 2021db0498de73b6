"""Measure the PyTorch reference's training throughput on this machine.

VERDICT r1 item 2: bench.py's ``vs_baseline`` was computed against an
*estimated* reference rate. This script replaces the estimate with a
measurement: it runs the reference's own kernel code
(/root/reference/models/MolKGNN/kernels.py, imported unmodified with a
3-line torch_geometric.data.Data stub) inside a faithful replica of the
reference training step, on the SAME synthetic molecule batches bench.py
uses, and times full optimizer steps (forward + backward + AdamW +
PolynomialDecayLR). It then times our jax-CPU backend at the identical
config for an apples-to-apples row.

What is replicated (and where the reference does it):
  * 4 KernelSetConv layers, kernels 10/20/30/50, hidden 32
    (MolKGNNNet.py:162-174, Supplement Table 3 flagship config).
  * MolGCN layer loop: data.x = h, sc = layer(...), h = propagate(sc)
    (KernelLayer.py:109-123). ``propagate`` with aggr='add' and message
    sim_sc_j is h_i = sum_{j->i} sc_j; we use index_add_, which is what
    PyG lowers to on CPU (minus PyG dispatch overhead, so this bar is if
    anything *favorable* to the reference).
  * node/edge BatchNorm1d incl. the dead edge-BN quirk (MolKGNNNet.py:115-116),
    swish MLP + global_add_pool readout (MolKGNNNet.py:144-147),
    dropout + FFN head (model.py:165-174), BCEWithLogitsLoss (data.py:37),
    AdamW with the kernel no-decay partition (model.py:367-385),
    per-step PolynomialDecayLR (lr.py:17-31, model.py:389-401).

Usage (CPU-only; ~10 min):
  env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
      python benchmarks/measure_baseline.py

Writes benchmarks/BASELINE_MEASURED.json and prints it.
"""

import importlib.util
import json
import platform
import sys
import time
import types
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
REF_KERNELS = "/root/reference/models/MolKGNN/kernels.py"

BATCH_SIZES = (16, 256)
NUM_LAYERS = 4
KERNELS = (10, 20, 30, 50)
HIDDEN = 32
MIN_SECONDS = 15.0
MIN_STEPS = 5
MAX_STEPS = 60


def _ensure_pyg_stub():
    if "torch_geometric" in sys.modules:
        return

    class Data:
        def __init__(self, **kwargs):
            for k, v in kwargs.items():
                setattr(self, k, v)

    tg = types.ModuleType("torch_geometric")
    tg_data = types.ModuleType("torch_geometric.data")
    tg_data.Data = Data
    tg.data = tg_data
    sys.modules["torch_geometric"] = tg
    sys.modules["torch_geometric.data"] = tg_data


def _load_ref(path, name):
    _ensure_pyg_stub()
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------- reference


def build_reference_model(torch, kmod):
    """The reference MolKGNNNet + GNNModel head as one torch module, built
    on the reference's own KernelSetConv layers."""
    import torch
    from torch.nn import BatchNorm1d, Dropout, Linear, Module, ModuleList

    total = sum(KERNELS)

    class RefMolKGNN(Module):
        def __init__(self):
            super().__init__()
            layers = [
                kmod.KernelSetConv(
                    *KERNELS, D=3, node_attr_dim=28, edge_attr_dim=7
                )
            ]
            for _ in range(NUM_LAYERS - 1):
                layers.append(
                    kmod.KernelSetConv(
                        *KERNELS, D=3, node_attr_dim=total, edge_attr_dim=7
                    )
                )
            self.layers = ModuleList(layers)
            self.node_batch_norm = BatchNorm1d(28)
            self.edge_batch_norm = BatchNorm1d(7)
            self.graph_embedding_lin1 = Linear(total, HIDDEN)
            self.graph_embedding_lin2 = Linear(HIDDEN, HIDDEN)
            self.dropout = Dropout(0.2)
            self.ffn_dropout = Dropout(0.25)
            self.ffn = Linear(HIDDEN, 1)

        def forward(self, b):
            from torch_geometric.data import Data  # the stub

            x = self.node_batch_norm(b["x"])
            edge_attr = self.edge_batch_norm(b["edge_attr"])  # dead quirk
            src, dst = b["edge_index"][0], b["edge_index"][1]
            h = x
            n_layers = len(self.layers)
            for i, layer in enumerate(self.layers):
                data = Data(
                    x=h,
                    p=b["p"],
                    edge_index=b["edge_index"],
                    edge_attr=edge_attr,
                    **b["deg_fields"],
                )
                sc = layer(
                    is_last_layer=(i == n_layers - 1),
                    data=data,
                    save_score=False,
                )
                agg = sc.new_zeros(sc.shape)
                agg.index_add_(0, dst, sc[src])  # KernelLayer.py:119-123
                h = agg
            node_emb = self.graph_embedding_lin2(
                self.dropout(
                    torch.nn.functional.silu(self.graph_embedding_lin1(h))
                )
            )
            g = node_emb.new_zeros((b["num_graphs"], HIDDEN))
            g.index_add_(0, b["batch_vec"], node_emb)  # global_add_pool
            return self.ffn(self.ffn_dropout(g)).view(-1)

    return RefMolKGNN()


def to_torch_batch(torch, gb):
    """Strip our fixed-shape GraphBatch padding back to the reference's
    dynamic-shape tensors."""
    node_mask = np.asarray(gb.node_mask)
    n = int(node_mask.sum())
    assert node_mask[:n].all(), "real nodes must be a prefix"
    x = np.asarray(gb.x)[:n]
    p = np.asarray(gb.p)[:n]
    em = np.asarray(gb.edge_mask)
    src = np.asarray(gb.edge_src)[em]
    dst = np.asarray(gb.edge_dst)[em]
    edge_attr = np.asarray(gb.edge_attr)[em]

    deg_fields = {}
    covered = 0
    for d, bucket in enumerate(gb.buckets(), start=1):
        mask = np.asarray(bucket.mask)
        focal = np.asarray(bucket.focal_index)[mask]
        nei = np.asarray(bucket.nei_index)[mask]
        ea = np.asarray(bucket.nei_edge_attr)[mask]
        covered += len(focal)
        deg_fields[f"p_focal_deg{d}"] = torch.tensor(p[focal])
        deg_fields[f"nei_p_deg{d}"] = torch.tensor(p[nei])
        deg_fields[f"nei_edge_attr_deg{d}"] = torch.tensor(ea)
        deg_fields[f"selected_index_deg{d}"] = torch.tensor(
            focal, dtype=torch.long
        )
        deg_fields[f"nei_index_deg{d}"] = torch.tensor(
            nei.reshape(-1), dtype=torch.long
        )
    # Reference's column reorder requires every node in exactly one bucket
    # (kernels.py:740-747); degree-0/5+ nodes would change output shape.
    assert covered == n, f"{covered} bucket rows != {n} nodes"

    gm = np.asarray(gb.graph_mask)
    node_graph_id = np.asarray(gb.node_graph_id)[:n]
    y = np.asarray(gb.y)
    return {
        "x": torch.tensor(x),
        "p": torch.tensor(p),
        "edge_index": torch.tensor(
            np.stack([src, dst]), dtype=torch.long
        ),
        "edge_attr": torch.tensor(edge_attr),
        "deg_fields": deg_fields,
        "batch_vec": torch.tensor(node_graph_id, dtype=torch.long),
        "num_graphs": len(gm),
        "graph_mask": torch.tensor(gm),
        "y": torch.tensor(y),
        "num_edges": int(em.sum()),
    }


def measure_reference(batch_size):
    import torch

    from molkgnn_tpu.data.dataset import GraphLoader, make_synthetic_dataset
    from molkgnn_tpu.graphs import spec_for_graphs

    kmod = _load_ref(REF_KERNELS, "ref_kernels_bench")
    lrmod = _load_ref_lr()

    ds = make_synthetic_dataset(seed=0, num_graphs=4 * batch_size)
    spec = spec_for_graphs(ds.graphs, batch_size=batch_size)
    loader = GraphLoader(
        ds.subset("train"), spec, batch_size, oversample=True, seed=0,
        drop_last=True,
    )
    batches = [to_torch_batch(torch, gb) for gb in loader]

    model = build_reference_model(torch, kmod)
    model.train()

    # model.py:367-385 no-decay partition
    nodecay, decay = [], []
    for name, m in model.named_parameters():
        if (
            "x_center" in name
            or "p_support" in name
            or ("edge_attr_support" in name and "edge_attr_support_sc" not in name)
            or "x_support" in name
        ):
            nodecay.append(m)
        else:
            decay.append(m)
    opt = torch.optim.AdamW(
        [
            {"params": nodecay, "weight_decay": 0},
            {"params": decay, "weight_decay": 1e-3},
        ],
        lr=5e-3,
    )
    sched = lrmod.PolynomialDecayLR(
        opt, warmup_iterations=300, tot_iterations=10_000, lr=5e-3,
        end_lr=1e-10, power=1.0,
    )
    loss_fn = torch.nn.BCEWithLogitsLoss()

    def step(b):
        opt.zero_grad()
        pred = model(b)
        loss = loss_fn(pred[b["graph_mask"]], b["y"][b["graph_mask"]])
        loss.backward()
        opt.step()
        sched.step()
        return float(loss.detach())

    step(batches[0])  # warmup

    steps = 0
    edges = 0
    t0 = time.perf_counter()
    while True:
        b = batches[steps % len(batches)]
        step(b)
        edges += b["num_edges"]
        steps += 1
        dt = time.perf_counter() - t0
        if steps >= MAX_STEPS or (steps >= MIN_STEPS and dt >= MIN_SECONDS):
            break
    return {
        "edges_per_s": round(edges / dt, 1),
        "step_ms": round(1e3 * dt / steps, 2),
        "steps": steps,
        "batch_size": batch_size,
        "torch_threads": torch.get_num_threads(),
    }


def _load_ref_lr():
    import torch.optim.lr_scheduler as tls

    class _CompatLRScheduler(tls.LRScheduler):
        def __init__(self, optimizer, last_epoch=-1, verbose=False):
            super().__init__(optimizer, last_epoch)

    orig = getattr(tls, "_LRScheduler", None)
    tls._LRScheduler = _CompatLRScheduler
    try:
        return _load_ref("/root/reference/lr.py", "ref_lr_bench")
    finally:
        if orig is not None:
            tls._LRScheduler = orig


# --------------------------------------------------------------------- ours


def measure_ours_cpu(batch_size):
    import jax

    from molkgnn_tpu.data.dataset import GraphLoader, make_synthetic_dataset
    from molkgnn_tpu.graphs import spec_for_graphs
    from molkgnn_tpu.models import MolKGNNNet
    from molkgnn_tpu.training import GNNModel, TrainConfig, Trainer

    ds = make_synthetic_dataset(seed=0, num_graphs=4 * batch_size)
    spec = spec_for_graphs(ds.graphs, batch_size=batch_size)
    model = GNNModel(
        encoder=MolKGNNNet(
            num_layers=NUM_LAYERS,
            kernels_1hop=KERNELS,
            kernels_nhop=KERNELS,
            graph_embedding_dim=HIDDEN,
            drop_ratio=0.2,
        ),
        ffn_dropout_rate=0.25,
    )
    cfg = TrainConfig(
        batch_size=batch_size, max_epochs=1, warmup_iterations=300,
        weight_decay=1e-3, progress=False,
    )
    trainer = Trainer(model, ds, spec, cfg)
    loader = GraphLoader(
        ds.subset("train"), spec, batch_size, oversample=True, seed=0,
        drop_last=True,
    )
    batches = list(loader)
    edge_counts = [int(np.asarray(b.edge_mask).sum()) for b in batches]

    state = trainer.state
    state, loss = trainer._train_step(state, batches[0])
    jax.block_until_ready(loss)  # compile

    steps = 0
    edges = 0
    t0 = time.perf_counter()
    while True:
        i = steps % len(batches)
        state, loss = trainer._train_step(state, batches[i])
        edges += edge_counts[i]
        steps += 1
        if steps % 10 == 0 or steps >= MAX_STEPS:
            jax.block_until_ready(loss)
        dt = time.perf_counter() - t0
        if steps >= MAX_STEPS or (steps >= MIN_STEPS and dt >= MIN_SECONDS):
            break
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    return {
        "edges_per_s": round(edges / dt, 1),
        "step_ms": round(1e3 * dt / steps, 2),
        "steps": steps,
        "batch_size": batch_size,
    }


def main():
    import torch

    out = {
        "config": {
            "num_layers": NUM_LAYERS,
            "kernels": list(KERNELS),
            "hidden": HIDDEN,
            "dataset": "make_synthetic_dataset(seed=0) — same as bench.py",
        },
        "machine": {
            "platform": platform.platform(),
            "cpus": __import__("os").cpu_count(),
            "torch": torch.__version__,
        },
        "note": (
            "reference measured on torch-CPU (no GPU in this environment); "
            "the reference's GPU rate remains unmeasured — this is the "
            "measured-CPU bar VERDICT r1 item 2 asked for"
        ),
        "reference_torch_cpu": {},
        "ours_jax_cpu": {},
    }
    for bs in BATCH_SIZES:
        print(f"measuring reference torch-CPU @ batch {bs}...", flush=True)
        out["reference_torch_cpu"][f"b{bs}"] = measure_reference(bs)
        print(json.dumps(out["reference_torch_cpu"][f"b{bs}"]), flush=True)
    for bs in BATCH_SIZES:
        print(f"measuring ours jax-CPU @ batch {bs}...", flush=True)
        out["ours_jax_cpu"][f"b{bs}"] = measure_ours_cpu(bs)
        print(json.dumps(out["ours_jax_cpu"][f"b{bs}"]), flush=True)

    path = REPO / "benchmarks" / "BASELINE_MEASURED.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
