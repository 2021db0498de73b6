"""CLI entry point: train / validate / test a model on a dataset.

Reference contract: /root/reference/entry.py — three merged argument groups
(trainer + model + data), derived iteration budget (tot_iterations =
ceil(train/batch)*max_epochs + 2, warmup += 2; entry.py:97-103), dispatch on
--validate/--test flags (entry.py:299-314), post-run artifact dumps, and run
bookkeeping under logs/ (task_info.log with wall time, entry.py:369-393).

Improvements over the reference: ``--gnn_type`` is a real flag (the
reference hardcodes it, entry.py:355-361), and there is a ``synthetic``
dataset for smoke runs without any raw data.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def build_parser(gnn_type: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="molkgnn-tpu training entry")

    # Trainer group (the PL-flags analogue).
    t = p.add_argument_group("Trainer")
    t.add_argument("--max_epochs", type=int, default=20)
    t.add_argument("--default_root_dir", type=str, default=".")
    t.add_argument("--num_devices", type=int, default=1)
    # none: single device (or DP when num_devices > 1); halo: node-sharded
    # halo-exchange model parallelism over num_devices (kgnn only);
    # hybrid: data x model 2D mesh (num_data_shards x
    # num_devices/num_data_shards).
    t.add_argument(
        "--model_parallel",
        choices=["none", "halo", "hybrid"],
        default="none",
    )
    t.add_argument("--num_data_shards", type=int, default=2)
    t.add_argument("--task_name", type=str, default="Unnamed")
    t.add_argument("--task_comment", type=str, default="")
    t.add_argument("--machine", type=str, default="tpu")

    # GNNModel group (reference model.py:436-465).
    m = p.add_argument_group("GNN_Model")
    m.add_argument("--seed", type=int, default=42)
    m.add_argument("--validate", action="store_true", default=False)
    m.add_argument("--test", action="store_true", default=False)
    m.add_argument("--record_valid_pred", action="store_true", default=False)
    m.add_argument("--train_metric", action="store_true", default=False)
    # Preemption-safe training: autosave full state after every epoch under
    # default_root_dir and resume from it on restart (SIGTERM/SIGINT finish
    # the epoch, autosave, and exit cleanly).
    m.add_argument("--autosave", action="store_true", default=False)
    m.add_argument("--warmup_iterations", type=int, default=60000)
    m.add_argument("--peak_lr", type=float, default=5e-2)
    m.add_argument("--end_lr", type=float, default=1e-9)
    m.add_argument("--weight_decay", type=float, default=0.0)
    m.add_argument("--ffn_dropout_rate", type=float, default=0.25)
    m.add_argument("--ffn_hidden_dim", type=int, default=64)
    m.add_argument("--task_dim", type=int, default=1)

    # Data group (reference data.py:231-239).
    d = p.add_argument_group("DataLoader")
    d.add_argument("--dataset_name", type=str, default="435034")
    d.add_argument("--num_workers", type=int, default=2)
    d.add_argument("--batch_size", type=int, default=17)
    d.add_argument(
        "--enable_oversampling_with_replacement",
        action="store_true",
        default=False,
    )
    d.add_argument("--dataset_path", type=str, default="../dataset/")
    # Size-dealt batch composition on a tight sampler-aware BatchSpec
    # (graphs/balance.py): ~1.7x smaller padded shapes, same per-epoch
    # sample multiset. kgnn (device-data) family only.
    d.add_argument("--balanced_batches", action="store_true", default=False)
    # Sample training ids ON DEVICE (inverse-CDF over the oversampling
    # distribution, device RNG): zero per-step host input — the epoch runs
    # entirely from HBM, single-device or data-parallel. Requires
    # --enable_oversampling_with_replacement; kgnn family only
    # (trainer.TrainConfig.device_sampling).
    d.add_argument("--device_sampling", action="store_true", default=False)
    # Pool size for the synthetic / synthetic_motif smoke datasets only
    # (framework extension; real AIDs get their size from the SDFs).
    d.add_argument("--synthetic_graphs", type=int, default=256)
    # Optimizer steps fused per device dispatch (lax.scan; identical math,
    # parity-tested). >1 amortizes launch latency — essential on
    # remote/tunneled accelerators (trainer.TrainConfig.scan_steps).
    d.add_argument("--scan_steps", type=int, default=1)
    # Nest the K-step fused scan as (K//chunk x chunk) when chunk divides K
    # (trainer.TrainConfig.scan_chunk): identical step sequence, program
    # size bounded by the chunk — needed where a backend's compile capacity
    # limits (batch x flat scan length).
    d.add_argument("--scan_chunk", type=int, default=0)

    p.add_argument("--gnn_type", type=str, default=gnn_type)

    # Model-specific groups.
    if gnn_type == "kgnn":
        g = p.add_argument_group("MolKGNNNet")
        g.add_argument("--num_layers", type=int, default=4)
        for i, dflt in ((1, 10), (2, 20), (3, 30), (4, 50)):
            g.add_argument(f"--num_kernel{i}_1hop", type=int, default=dflt)
            g.add_argument(f"--num_kernel{i}_Nhop", type=int, default=dflt)
        g.add_argument("--node_feature_dim", type=int, default=28)
        g.add_argument("--edge_feature_dim", type=int, default=7)
        g.add_argument("--hidden_dim", type=int, default=32)
        g.add_argument("--dropout_ratio", type=float, default=0.0)
        # Framework extension (default off = reference parity): apply the
        # deg-4 chirality sign at every layer, not only the last — deep
        # stacks lose pure-chirality signal otherwise (QUALITY.md 2b,
        # models/kgnn.py::MolGCN.chirality_every_layer).
        g.add_argument(
            "--chirality_every_layer", action="store_true", default=False
        )
    elif gnn_type == "schnet":
        g = p.add_argument_group("SchNet")
        g.add_argument("--num_layers", type=int, default=6)
        g.add_argument("--hidden_channels", type=int, default=128)
        g.add_argument("--num_filters", type=int, default=128)
        g.add_argument("--num_gaussians", type=int, default=50)
        g.add_argument("--cutoff", type=float, default=10.0)
        g.add_argument("--out_channels", type=int, default=32)
    elif gnn_type == "dimenet_pp":
        g = p.add_argument_group("DimeNetPP")
        g.add_argument("--hidden_channels", type=int, default=128)
        g.add_argument("--out_channels", type=int, default=32)
        g.add_argument("--num_blocks", type=int, default=4)
        g.add_argument("--int_emb_size", type=int, default=64)
        g.add_argument("--basis_emb_size", type=int, default=8)
        g.add_argument("--out_emb_channels", type=int, default=256)
        g.add_argument("--num_spherical", type=int, default=7)
        g.add_argument("--num_radial", type=int, default=6)
        g.add_argument("--cutoff", type=float, default=5.0)
        g.add_argument("--envelope_exponent", type=int, default=5)
        g.add_argument("--num_before_skip", type=int, default=1)
        g.add_argument("--num_after_skip", type=int, default=2)
        g.add_argument("--num_output_layers", type=int, default=3)
    elif gnn_type == "spherenet":
        g = p.add_argument_group("SphereNet")
        g.add_argument("--cutoff", type=float, default=5.0)
        g.add_argument("--num_layers", type=int, default=4)
        g.add_argument("--hidden_channels", type=int, default=128)
        g.add_argument("--out_channels", type=int, default=32)
        g.add_argument("--int_emb_size", type=int, default=64)
        g.add_argument("--basis_emb_size_dist", type=int, default=8)
        g.add_argument("--basis_emb_size_angle", type=int, default=8)
        g.add_argument("--basis_emb_size_torsion", type=int, default=8)
        g.add_argument("--out_emb_channels", type=int, default=256)
        g.add_argument("--num_spherical", type=int, default=7)
        g.add_argument("--num_radial", type=int, default=6)
        g.add_argument("--envelope_exponent", type=int, default=5)
        g.add_argument("--num_before_skip", type=int, default=1)
        g.add_argument("--num_after_skip", type=int, default=2)
        g.add_argument("--num_output_layers", type=int, default=3)
    elif gnn_type == "chironet":
        g = p.add_argument_group("ChIRoNet")
        g.add_argument("--F_H", type=int, default=64)
        g.add_argument("--F_H_EConv", type=int, default=64)
        g.add_argument("--GAT_N_heads", type=int, default=4)
        g.add_argument("--use_chiral_message_passing", action="store_true")
        g.add_argument("--CMP_GAT_N_layers", type=int, default=3)
        g.add_argument("--CMP_GAT_N_heads", type=int, default=2)
        g.add_argument(
            "--c_coefficient_normalization", type=str, default="sigmoid"
        )
        g.add_argument("--encoder_reduction", type=str, default="sum")
        g.add_argument("--dropout", type=float, default=0.0)
    return p


def build_encoder(args):
    from molkgnn_tpu.models.registry import get_family

    fam = get_family(args.gnn_type)
    if args.gnn_type == "kgnn":
        enc = fam.make_encoder(
            num_layers=args.num_layers,
            kernels_1hop=(
                args.num_kernel1_1hop, args.num_kernel2_1hop,
                args.num_kernel3_1hop, args.num_kernel4_1hop,
            ),
            kernels_nhop=(
                args.num_kernel1_Nhop, args.num_kernel2_Nhop,
                args.num_kernel3_Nhop, args.num_kernel4_Nhop,
            ),
            node_dim=args.node_feature_dim,
            edge_dim=args.edge_feature_dim,
            graph_embedding_dim=args.hidden_dim,
            drop_ratio=args.dropout_ratio,
            chirality_every_layer=args.chirality_every_layer,
        )
    elif args.gnn_type == "schnet":
        enc = fam.make_encoder(
            cutoff=args.cutoff, num_layers=args.num_layers,
            hidden_channels=args.hidden_channels,
            num_filters=args.num_filters, num_gaussians=args.num_gaussians,
            out_channels=args.out_channels,
        )
    elif args.gnn_type == "dimenet_pp":
        enc = fam.make_encoder(
            hidden_channels=args.hidden_channels,
            out_channels=args.out_channels, num_blocks=args.num_blocks,
            int_emb_size=args.int_emb_size,
            basis_emb_size=args.basis_emb_size,
            out_emb_channels=args.out_emb_channels,
            num_spherical=args.num_spherical, num_radial=args.num_radial,
            cutoff=args.cutoff, envelope_exponent=args.envelope_exponent,
            num_before_skip=args.num_before_skip,
            num_after_skip=args.num_after_skip,
            num_output_layers=args.num_output_layers,
        )
    elif args.gnn_type == "spherenet":
        enc = fam.make_encoder(
            cutoff=args.cutoff, num_layers=args.num_layers,
            hidden_channels=args.hidden_channels,
            out_channels=args.out_channels, int_emb_size=args.int_emb_size,
            basis_emb_size_dist=args.basis_emb_size_dist,
            basis_emb_size_angle=args.basis_emb_size_angle,
            basis_emb_size_torsion=args.basis_emb_size_torsion,
            out_emb_channels=args.out_emb_channels,
            num_spherical=args.num_spherical, num_radial=args.num_radial,
            envelope_exponent=args.envelope_exponent,
            num_before_skip=args.num_before_skip,
            num_after_skip=args.num_after_skip,
            num_output_layers=args.num_output_layers,
        )
    else:  # chironet
        enc = fam.make_encoder(
            f_h=args.F_H, f_h_econv=args.F_H_EConv,
            gat_heads=args.GAT_N_heads,
            chiral_message_passing=args.use_chiral_message_passing,
            cmp_gat_layers=args.CMP_GAT_N_layers,
            cmp_gat_heads=args.CMP_GAT_N_heads,
            c_normalization=args.c_coefficient_normalization,
            reduction=args.encoder_reduction,
            dropout=args.dropout,
        )
    return fam, enc


def load_dataset(args):
    from molkgnn_tpu.data.dataset import (
        D4DCHP_DATASET_NAMES,
        QSAR_DATASET_NAMES,
        make_motif_dataset,
        make_synthetic_dataset,
    )

    name = args.dataset_name
    if name == "synthetic":
        return make_synthetic_dataset(
            seed=args.seed, num_graphs=args.synthetic_graphs
        )
    if name == "synthetic_motif":
        # Learnable smoke task (planted deg-4 motif): random-label
        # ``synthetic`` gives noise metrics by construction; this one's
        # curves are real training evidence (see logs/history.json).
        return make_motif_dataset(
            seed=args.seed, num_graphs=args.synthetic_graphs
        )
    if name in QSAR_DATASET_NAMES:
        from molkgnn_tpu.data.qsar import load_qsar_dataset

        return load_qsar_dataset(
            os.path.join(args.dataset_path, "qsar", "clean_sdf"),
            dataset=name,
            gnn_type=args.gnn_type,
        )
    if name in D4DCHP_DATASET_NAMES:
        from molkgnn_tpu.data.d4dchp import load_d4dchp_dataset

        base = os.path.join(args.dataset_path, "d4_docking")
        files = {
            "CHIRAL1": ("d4_docking_rs.csv", "rs/split0.npy"),
            "D4DCHP": ("d4_docking.csv", "full/split0.npy"),
            "dummy": ("dummy/dummy.csv", "dummy/split.npy"),
            "DIFF5": ("d4_docking_diff5.csv", "diff5/split0.npy"),
        }[name]
        return load_d4dchp_dataset(
            os.path.join(base, files[0]),
            name,
            os.path.join(base, files[1]),
            gnn_type=args.gnn_type,
        )
    raise ValueError(f"unknown dataset {name}")


def main(argv=None):
    t_start = time.time()
    argv = argv if argv is not None else sys.argv[1:]
    # Peek at --gnn_type with argparse (accepts both '--gnn_type X' and
    # '--gnn_type=X') to pick the per-family flag group.
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--gnn_type", default="kgnn")
    gnn_type = pre.parse_known_args(argv)[0].gnn_type
    args = build_parser(gnn_type).parse_args(argv)
    # --device_sampling is supported for every gnn_type since r4: kgnn
    # (graphs/device_pack, incl. all model_parallel modes), the 3D
    # point-cloud families (graphs/device_points), and chironet
    # (graphs/device_chiro). The one prerequisite is surfaced HERE with
    # the flag's own vocabulary (the Trainer's error mentions neither
    # flag name).
    if args.device_sampling and not args.enable_oversampling_with_replacement:
        raise SystemExit(
            "--device_sampling reproduces the oversampling sampler on"
            " device; pass --enable_oversampling_with_replacement with it"
            " (shuffle-without-replacement epochs stay on the host path)"
        )

    from molkgnn_tpu.training import GNNModel, TrainConfig, Trainer

    dataset = load_dataset(args)
    fam, encoder = build_encoder(args)
    balanced = args.balanced_batches and args.gnn_type == "kgnn"
    if balanced:
        from molkgnn_tpu.graphs import spec_for_dataset

        spec = spec_for_dataset(
            dataset,
            args.batch_size,
            oversample=args.enable_oversampling_with_replacement,
        )
    else:
        spec = fam.make_spec(
            dataset.graphs,
            batch_size=args.batch_size,
            **(
                {"cutoff": args.cutoff}
                if args.gnn_type in ("schnet", "dimenet_pp", "spherenet")
                else {}
            ),
        )
    model = GNNModel(
        encoder=encoder,
        task_dim=args.task_dim,
        ffn_dropout_rate=args.ffn_dropout_rate,
    )
    log_dir = os.path.join(args.default_root_dir, "logs")
    cfg = TrainConfig(
        batch_size=args.batch_size,
        max_epochs=args.max_epochs,
        peak_lr=args.peak_lr,
        end_lr=args.end_lr,
        # reference adds 2 after deriving tot_iterations (entry.py:102)
        warmup_iterations=args.warmup_iterations + 2,
        weight_decay=args.weight_decay,
        seed=args.seed,
        oversample=args.enable_oversampling_with_replacement,
        train_metric=args.train_metric,
        record_valid_pred=args.record_valid_pred,
        log_dir=log_dir,
        checkpoint_dir=os.path.join(args.default_root_dir, "checkpoints"),
        balanced_batches=balanced,
        device_sampling=args.device_sampling,
        scan_steps=args.scan_steps,
        scan_chunk=args.scan_chunk,
        autosave_path=(
            os.path.join(args.default_root_dir, "autosave")
            if args.autosave
            else None
        ),
    )
    collate = None if args.gnn_type == "kgnn" else fam.collate
    mesh = None
    if args.model_parallel == "hybrid":
        from molkgnn_tpu.parallel import make_mesh_2d

        nd = args.num_data_shards
        if args.num_devices % nd:
            raise SystemExit(
                f"--num_devices {args.num_devices} not divisible by"
                f" --num_data_shards {nd}"
            )
        mesh = make_mesh_2d(nd, args.num_devices // nd)
        cfg.model_parallel = "hybrid"
    elif args.model_parallel == "halo" or args.num_devices > 1:
        from molkgnn_tpu.parallel import make_mesh

        mesh = make_mesh(args.num_devices)
        if args.model_parallel == "halo":
            cfg.model_parallel = "halo"
    trainer = Trainer(model, dataset, spec, cfg, mesh=mesh, collate=collate)

    if args.validate:
        results = trainer.evaluate("valid")
        print(json.dumps({"valid": results}, default=float))
    elif args.test:
        # Test-only mode: restore + evaluate (requires checkpoints from a
        # previous fit in checkpoint_dir).
        from molkgnn_tpu.training.checkpoint import load_checkpoint

        for tag in ["last"] + [f"best_{m}" for m in cfg.monitors]:
            path = os.path.join(cfg.checkpoint_dir, tag)
            if os.path.exists(path) or os.path.exists(path + ".msgpack"):
                trainer._ckpts[tag] = load_checkpoint(path)
        if not trainer._ckpts:
            raise SystemExit(
                f"--test: no checkpoints found under {cfg.checkpoint_dir!r};"
                " run a fit first (same --default_root_dir) or drop --test"
                " to train+test in one run"
            )
        results = trainer.test()
        print(json.dumps(results, default=float))
    else:
        trainer.fit()
        results = trainer.test()
        print(json.dumps(results, default=float))
        if args.gnn_type == "kgnn":
            trainer.save_kernels(os.path.join(log_dir, "kernels"))
        trainer.save_graph_embedding(log_dir)

    # Run bookkeeping (entry.py:369-393).
    os.makedirs(log_dir, exist_ok=True)
    seconds = time.time() - t_start
    with open(os.path.join(log_dir, "task_info.log"), "a") as f:
        f.write(f"task_name: {args.task_name}\n")
        f.write(f"gnn_type: {args.gnn_type}\n")
        f.write(f"dataset: {args.dataset_name}\n")
        f.write(f"comment: {args.task_comment}\n")
        f.write(
            f"run_time: {seconds / 3600:.0f}h{(seconds % 3600) / 60:.0f}m"
            f"{seconds % 60:.0f}s ({seconds:.1f}s)\n"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
