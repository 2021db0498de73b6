"""`molkgnn-import`: reference torch checkpoint -> serving export artifact.

A user of the reference trains with PyTorch Lightning and holds either a
PL ``.ckpt`` (entry.py:134-162 best-ckpt loading) or a raw
``state_dict`` dump. This CLI ports those weights into this framework's
deployment format in one step:

    molkgnn-import --torch_ckpt best.ckpt --sdf library.sdf --out model.mkx
    molkgnn-screen --exported model.mkx --sdf library.sdf --out scores.csv

The model shape flags must match the checkpoint's training config (the
importer validates every parameter's shape and fails loudly on
mismatch). ``--sdf`` provides the molecule library the export's static
BatchSpec must cover (padding capacities derive from it).
"""

from __future__ import annotations

import argparse
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="molkgnn-import",
        description="Port a trained reference checkpoint into a serving "
        "export artifact",
    )
    p.add_argument(
        "--torch_ckpt", required=True,
        help="PL .ckpt ({'state_dict': ...}) or raw state_dict torch file",
    )
    p.add_argument(
        "--sdf", required=True,
        help="SDF library the export's BatchSpec must cover",
    )
    p.add_argument("--out", required=True, help="output artifact path (.mkx)")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument(
        "--prefix", type=str, default="",
        help="key prefix inside the state_dict (e.g. 'model.')",
    )
    # Model shape (must match the checkpoint's training config).
    p.add_argument("--num_layers", type=int, default=4)
    for i, dflt in ((1, 10), (2, 20), (3, 30), (4, 50)):
        p.add_argument(f"--num_kernel{i}_1hop", type=int, default=dflt)
        p.add_argument(f"--num_kernel{i}_Nhop", type=int, default=dflt)
    p.add_argument("--hidden_dim", type=int, default=32)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(
        argv if argv is not None else sys.argv[1:]
    )
    t0 = time.time()

    import jax

    from molkgnn_tpu.chem.features import mol_to_graph
    from molkgnn_tpu.chem.sdf import parse_sdf
    from molkgnn_tpu.graphs import spec_for_graphs
    from molkgnn_tpu.graphs.batch import batch_graphs
    from molkgnn_tpu.models import MolKGNNNet
    from molkgnn_tpu.serving.predictor import Predictor
    from molkgnn_tpu.training import GNNModel
    from molkgnn_tpu.training.checkpoint import load_torch_checkpoint

    graphs = []
    for i, (mol, _data) in enumerate(parse_sdf(args.sdf)):
        if mol is not None:
            g = mol_to_graph(mol, y=0.0, idx=i)
            if g is not None:
                graphs.append(g)
    if not graphs:
        print("no parseable molecules in --sdf", file=sys.stderr)
        return 2
    spec = spec_for_graphs(graphs, batch_size=args.batch_size)

    model = GNNModel(
        encoder=MolKGNNNet(
            num_layers=args.num_layers,
            kernels_1hop=(
                args.num_kernel1_1hop, args.num_kernel2_1hop,
                args.num_kernel3_1hop, args.num_kernel4_1hop,
            ),
            kernels_nhop=(
                args.num_kernel1_Nhop, args.num_kernel2_Nhop,
                args.num_kernel3_Nhop, args.num_kernel4_Nhop,
            ),
            graph_embedding_dim=args.hidden_dim,
        ),
    )
    template = model.init(
        jax.random.key(0),
        batch_graphs(graphs[: args.batch_size], spec),
    )
    variables = load_torch_checkpoint(
        args.torch_ckpt, jax.device_get(template), prefix=args.prefix
    )

    pred = Predictor(
        model, variables["params"], variables["batch_stats"], spec
    )
    pred.export(args.out)
    print(
        f"imported {args.torch_ckpt} -> {args.out} "
        f"(spec covers {len(graphs)} molecules, batch {args.batch_size}, "
        f"{time.time() - t0:.1f}s)"
    )
    return 0


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
