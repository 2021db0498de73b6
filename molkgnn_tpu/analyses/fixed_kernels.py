"""Fixed (human-designed) kernel sets: load from disk, dump node scores.

Reference contract: BaseKernelSetConv accepts per-degree *fixed* KernelConvs
whose scores are concatenated ahead of the trainable ones in each degree's
column block (/root/reference/models/MolKGNN/kernels.py:451-545), and its
``save_score`` hook labels each score row with the kernel's name from
``customized_kernels/`` CSVs — trainable kernels are labeled ``std_kernel``
(kernels.py:594-608). The reference never ships the value format (the
directory is user-supplied); this module defines a concrete one:

    customized_kernels/
      deg{d}.npz   x_center [L,F], x_support [L,d,F],
                   edge_attr_support [L,d,Fe], p_support [L,d,3]
      deg{d}.csv   one row per kernel, a ``name`` column (labels only)

Score capture is TPU-native: instead of a host callback inside the forward
(a device sync point), ``KernelSetConv(sow_scores=True)`` sows the node-order
score matrix into the 'intermediates' collection, and ``dump_scores`` writes
the reference-shaped ``scores.csv`` (rows = kernels, columns = nodes) on the
host from ONE readback.
"""

from __future__ import annotations

import csv
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

KERNEL_FIELDS = ("x_center", "x_support", "edge_attr_support", "p_support")


def load_customized_kernels(
    root: str = "customized_kernels",
) -> Tuple[Tuple[Optional[Dict], ...], Tuple[List[str], ...]]:
    """Read per-degree fixed kernel tensors + names.

    Returns (fixed_kernels, names): ``fixed_kernels`` is a 4-tuple suitable
    for ``MolKGNNNet(fixed_kernels=...)`` (None for absent degrees);
    ``names`` is a 4-tuple of per-kernel label lists (empty for absent
    degrees).
    """
    kernels: List[Optional[Dict]] = []
    names: List[List[str]] = []
    for d in range(1, 5):
        npz_path = os.path.join(root, f"deg{d}.npz")
        if not os.path.exists(npz_path):
            kernels.append(None)
            names.append([])
            continue
        with np.load(npz_path) as z:
            entry = {k: np.asarray(z[k], np.float32) for k in KERNEL_FIELDS}
        L = entry["x_center"].shape[0]
        for k in ("x_support", "edge_attr_support", "p_support"):
            if entry[k].shape[0] != L or entry[k].shape[1] != d:
                raise ValueError(
                    f"{npz_path}: {k} must be [L={L}, d={d}, ...], "
                    f"got {entry[k].shape}"
                )
        kernels.append(entry)
        csv_path = os.path.join(root, f"deg{d}.csv")
        if os.path.exists(csv_path):
            with open(csv_path, newline="") as f:
                rows = list(csv.DictReader(f))
            labels = [r["name"] for r in rows]
            if len(labels) != L:
                raise ValueError(
                    f"{csv_path}: {len(labels)} names for {L} kernels"
                )
        else:
            labels = [f"fixed_kernel_{i}" for i in range(L)]
        names.append(labels)
    return tuple(kernels), tuple(names)


def save_customized_kernels(
    root: str,
    kernels: Sequence[Optional[Dict]],
    names: Optional[Sequence[Sequence[str]]] = None,
) -> None:
    """Write the ``customized_kernels/`` layout read by the loader."""
    os.makedirs(root, exist_ok=True)
    for d, entry in enumerate(kernels, start=1):
        if entry is None:
            continue
        np.savez(
            os.path.join(root, f"deg{d}.npz"),
            **{k: np.asarray(entry[k], np.float32) for k in KERNEL_FIELDS},
        )
        if names is not None and names[d - 1]:
            with open(os.path.join(root, f"deg{d}.csv"), "w", newline="") as f:
                w = csv.writer(f)
                w.writerow(["name"])
                for n in names[d - 1]:
                    w.writerow([n])


def score_headers(
    fixed_names: Sequence[Sequence[str]],
    num_trainable: Sequence[int],
) -> List[str]:
    """Row labels for scores.csv: per degree, fixed-kernel names then
    ``std_kernel`` per trainable kernel (kernels.py:597-603)."""
    headers: List[str] = []
    for d in range(4):
        headers += list(fixed_names[d]) if d < len(fixed_names) else []
        headers += ["std_kernel"] * num_trainable[d]
    return headers


def dump_scores(
    scores: np.ndarray,  # [N, sum(block widths)] node-order score matrix
    fixed_names: Sequence[Sequence[str]],
    num_trainable: Sequence[int],
    path: str = "scores.csv",
) -> None:
    """Write the reference-shaped scores.csv: one row per kernel (named),
    one column per node (kernels.py:604-608 transposes before writing)."""
    headers = score_headers(fixed_names, num_trainable)
    scores = np.asarray(scores)
    if scores.shape[1] != len(headers):
        raise ValueError(
            f"scores have {scores.shape[1]} kernel columns, "
            f"headers describe {len(headers)}"
        )
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow([""] + list(range(scores.shape[0])))
        for i, name in enumerate(headers):
            w.writerow([name] + [repr(float(v)) for v in scores[:, i]])


def capture_layer0_scores(model, variables, batch) -> np.ndarray:
    """Run one forward with score sowing and return the layer-0 node-order
    score matrix [N, sum(block widths)] (the reference's save_score input)."""
    _, aux = model.apply(
        variables, batch, train=False, mutable=["intermediates"]
    )
    inter = aux["intermediates"]
    while "scores" not in inter:  # descend encoder/gnn/layer0 nesting
        for key in ("encoder", "gnn", "layer0"):
            if key in inter:
                inter = inter[key]
                break
        else:
            raise KeyError(f"no sown scores found; keys: {list(inter)}")
    return np.asarray(inter["scores"][0])
