"""`molkgnn-screen`: score an SDF library with an exported model.

The reference's end product is a ranked screening library (virtual
screening of PubChem HTS sets, /root/reference/README.md:4) but it ships
no inference tool — scoring requires the full training stack. This CLI
closes the deployment loop with the serving layer's AOT export
(`Predictor.export`): the artifact carries StableHLO + parameters + the
BatchSpec, so scoring needs no model code, no checkpoint directory, and
no training configuration.

    molkgnn fit ...                      # train
    predictor.export("model.mkx")       # serving/predictor.py
    molkgnn-screen --exported model.mkx --sdf library.sdf --out scores.csv

Output CSV: record_index,score per SDF record (parse failures score NaN,
positions preserved — the reference's invalid-molecule bookkeeping,
wrapper.py:414-427).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="molkgnn-screen",
        description="Score an SDF molecule library with an exported model",
    )
    p.add_argument("--exported", required=True, help="Predictor.export artifact")
    p.add_argument("--sdf", required=True, help="SDF file to score")
    p.add_argument("--out", required=True, help="output CSV path")
    p.add_argument(
        "--probabilities",
        action="store_true",
        default=False,
        help="emit sigmoid probabilities instead of raw logits",
    )
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(
        argv if argv is not None else sys.argv[1:]
    )
    t0 = time.time()

    from molkgnn_tpu.chem.sdf import parse_sdf
    from molkgnn_tpu.serving.predictor import Predictor, host_pipeline_for_spec

    forward, spec = Predictor.load_exported(args.exported)
    # The artifact's spec names its batch family (kgnn / point-cloud /
    # chironet) — featurize and pack accordingly.
    to_graph, collate = host_pipeline_for_spec(spec)

    graphs, rows = [], []  # rows[i] = record index of graphs[i]
    n_records = 0
    for mol, _data in parse_sdf(args.sdf):
        idx = n_records
        n_records += 1
        g = None if mol is None else to_graph(mol, y=0.0, idx=idx)
        if g is None:
            continue
        rows.append(idx)
        graphs.append(g)

    scores = np.full((n_records,), np.nan, np.float32)
    b = spec.num_graphs
    dev_preds, masks = [], []
    for start in range(0, len(graphs), b):
        chunk = graphs[start : start + b]
        batch = collate(chunk, spec)  # raises on capacity overflow
        pred, _emb = forward(batch)
        dev_preds.append(pred)
        masks.append(np.asarray(batch.graph_mask))
    if dev_preds:
        flat = np.concatenate([np.asarray(p) for p in dev_preds])
        scores[np.asarray(rows)] = flat[np.concatenate(masks)]
    if args.probabilities:
        from molkgnn_tpu.training.metrics import sigmoid

        finite = np.isfinite(scores)
        scores[finite] = sigmoid(scores[finite])

    with open(args.out, "w") as f:
        f.write("record_index,score\n")
        for i, v in enumerate(scores):
            f.write(f"{i},{'' if np.isnan(v) else repr(float(v))}\n")
    print(
        f"molkgnn-screen: {n_records} records, {len(graphs)} scored,"
        f" {n_records - len(graphs)} invalid, {time.time() - t0:.1f}s"
        f" -> {args.out}",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
