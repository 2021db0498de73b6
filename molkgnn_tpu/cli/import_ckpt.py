"""`molkgnn-import`: reference torch checkpoint -> serving export artifact.

A user of the reference trains with PyTorch Lightning and holds either a
PL ``.ckpt`` (entry.py:134-162 best-ckpt loading) or a raw
``state_dict`` dump. This CLI ports those weights into this framework's
deployment format in one step, for ANY of the five model families
(training.checkpoint.from_torch_state_dict dispatches the mapping):

    molkgnn-import --torch_ckpt best.ckpt --sdf library.sdf --out model.mkx
    molkgnn-import --torch_ckpt schnet.ckpt --gnn_type schnet \
        --num_layers 3 --sdf library.sdf --out model.mkx
    molkgnn-screen --exported model.mkx --sdf library.sdf --out scores.csv

Model shape flags are the SAME per-family flags `molkgnn` trains with
(cli/entry.py build_parser) and must match the checkpoint's training
config — the importer validates every parameter's shape and fails
loudly on mismatch. ``--sdf`` provides the molecule library the
export's static BatchSpec must cover (padding capacities derive from
it).
"""

from __future__ import annotations

import argparse
import sys
import time


def build_base_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="molkgnn-import",
        description="Port a trained reference checkpoint into a serving "
        "export artifact (model shape flags follow `molkgnn`'s)",
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
    return p


def main(argv=None) -> int:
    argv = argv if argv is not None else sys.argv[1:]
    # Peek at --gnn_type with argparse (accepts both '--gnn_type X' and
    # '--gnn_type=X') to pick the per-family flag group; the flag itself
    # stays in model_argv for build_parser to consume.
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--gnn_type", default="kgnn")
    gnn_type = pre.parse_known_args(argv)[0].gnn_type
    base = build_base_parser()
    args, model_argv = base.parse_known_args(argv)
    t0 = time.time()

    import jax

    from molkgnn_tpu.chem.sdf import parse_sdf
    from molkgnn_tpu.cli.entry import build_encoder, build_parser
    from molkgnn_tpu.serving.predictor import Predictor
    from molkgnn_tpu.training import GNNModel
    from molkgnn_tpu.training.checkpoint import load_torch_checkpoint

    # The per-family model-shape args are `molkgnn`'s own (every one has
    # a default, so only the shape flags need passing).
    margs = build_parser(gnn_type).parse_args(model_argv)
    fam, encoder = build_encoder(margs)

    if gnn_type == "chironet":
        from molkgnn_tpu.graphs.chiro import mol_to_chiro_graph as _to_graph
    else:
        from molkgnn_tpu.chem.features import mol_to_graph as _to_graph

    graphs = []
    for i, (mol, _data) in enumerate(parse_sdf(args.sdf)):
        if mol is not None:
            g = _to_graph(mol, y=0.0, idx=i)
            if g is not None:
                graphs.append(g)
    if not graphs:
        print("no parseable molecules in --sdf", file=sys.stderr)
        return 2
    spec = fam.make_spec(
        graphs,
        batch_size=args.batch_size,
        **(
            {"cutoff": margs.cutoff}
            if gnn_type in ("schnet", "dimenet_pp", "spherenet")
            else {}
        ),
    )

    model = GNNModel(encoder=encoder)
    batch = fam.collate(graphs[: args.batch_size], spec)
    template = model.init(jax.random.key(0), batch)
    variables = load_torch_checkpoint(
        args.torch_ckpt, jax.device_get(template), prefix=args.prefix
    )

    pred = Predictor(
        model,
        variables["params"],
        variables.get("batch_stats", {}),
        spec,
        collate=fam.collate,
    )
    pred.export(args.out)
    print(
        f"imported {args.torch_ckpt} ({gnn_type}) -> {args.out} "
        f"(spec covers {len(graphs)} molecules, batch {args.batch_size}, "
        f"{time.time() - t0:.1f}s)"
    )
    return 0


if __name__ == "__main__":  # pragma: no cover
    sys.exit(main())
