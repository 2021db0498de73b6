"""Hyperparameter sweep runner.

Reference contract: utils/scheduler-*.py (C19) — an itertools.product grid
over hyperparameters, one experiment directory per combination, resume by
skipping combinations whose results already exist
(scheduler-barium-kgnn.py:118), and a worker pool dispatching runs.

TPU-native differences: experiments run the CLI entry in subprocesses (one
per accelerator by default — a TPU chip is single-tenant, unlike the
reference's 5-way GPU sharing), experiment dirs hold args + logs instead of
git-clone copies, and the grid is declarative (JSON/dict), not a per-machine
script fork.
"""

from __future__ import annotations

import dataclasses
import itertools
import json
import os
import subprocess
import sys
import time
from typing import Dict, List, Sequence


@dataclasses.dataclass
class SweepConfig:
    base_args: Dict[str, object]  # flag -> value (no leading --)
    grid: Dict[str, Sequence]  # flag -> values to sweep
    out_dir: str = "experiments"
    max_parallel: int = 1
    resume: bool = True
    done_marker: str = "logs/test_result.log"  # scheduler:118 contract


def grid_points(grid: Dict[str, Sequence]) -> List[Dict[str, object]]:
    keys = list(grid.keys())
    return [
        dict(zip(keys, combo))
        for combo in itertools.product(*(grid[k] for k in keys))
    ]


def experiment_name(point: Dict[str, object]) -> str:
    return "_".join(f"{k}-{v}" for k, v in sorted(point.items()))


def _flag_list(args: Dict[str, object]) -> List[str]:
    out: List[str] = []
    for k, v in args.items():
        if isinstance(v, bool):
            if v:
                out.append(f"--{k}")
        else:
            out += [f"--{k}", str(v)]
    return out


def run_sweep(cfg: SweepConfig, dry_run: bool = False) -> List[Dict]:
    """Run (or plan) the sweep; returns one record per experiment with its
    status: 'done' (skipped via resume), 'ok', 'failed', or 'planned'."""
    points = grid_points(cfg.grid)
    records = []
    running: List[tuple] = []

    def reap(block: bool):
        still = []
        for proc, rec in running:
            if proc.poll() is None and not block:
                still.append((proc, rec))
                continue
            proc.wait()
            rec["status"] = "ok" if proc.returncode == 0 else "failed"
            rec["returncode"] = proc.returncode
        running[:] = still

    for point in points:
        name = experiment_name(point)
        exp_dir = os.path.join(cfg.out_dir, name)
        rec = {"name": name, "dir": exp_dir, "point": point}
        records.append(rec)
        marker = os.path.join(exp_dir, cfg.done_marker)
        if cfg.resume and os.path.exists(marker):
            rec["status"] = "done"
            continue
        if dry_run:
            rec["status"] = "planned"
            continue
        os.makedirs(exp_dir, exist_ok=True)
        args = dict(cfg.base_args)
        args.update(point)
        args["default_root_dir"] = exp_dir
        args.setdefault("task_name", name)
        with open(os.path.join(exp_dir, "params.log"), "w") as f:
            json.dump(args, f, indent=1, default=str)
        cmd = (
            [sys.executable, "-m", "molkgnn_tpu.cli.entry"]
            + _flag_list(args)
        )
        while len(running) >= cfg.max_parallel:
            reap(block=False)
            time.sleep(0.2)
        log = open(os.path.join(exp_dir, "run.log"), "w")
        proc = subprocess.Popen(cmd, stdout=log, stderr=subprocess.STDOUT)
        rec["status"] = "running"
        running.append((proc, rec))

    while running:
        reap(block=True)
    return records
