"""Benchmark: MolKGNN end-to-end training throughput (edges/s) on the local
accelerator.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "edges/s", "vs_baseline": N, ...}

Setup mirrors the reference's flagship model (4 layers, 10/20/30/50 kernels
per degree, hidden 32 — Supplement Table 3 / MolKGNNNet.py:162-174) on
synthetic molecules with AID-like sizes. The tracked headline (since r3) is
the COMPUTE-BOUND config — batch 1024, bfloat16 scoring matmuls — because
the b256 e2e row is latency-bound against the tunneled link (~0.26 ms HBM
floor per step, benchmarks/SEGMENT_OPS.json) and mostly measures the link,
not the machine. The r01/r02-comparable b256 fp32 END-TO-END row (host id
sampling, on-device batch assembly, scan-fused fwd+bwd+AdamW steps) is
reported alongside. Both configs are measured in INTERLEAVED windows
across the whole run so they sample the same tunnel-drift states; every
row carries its full window list + spread (drift is real: same program has
measured a 2x spread minutes apart).

vs_baseline: MEASURED. benchmarks/measure_baseline.py runs the reference's
own kernels.py (imported unmodified, torch-CPU) inside a faithful replica
of its training step on the same synthetic molecules: 936.6 edges/s at its
flagship batch 16 (its best config; 119 edges/s at batch 256 — the
per-node Python chirality loop dominates, kernels.py:279-350). That is the
measured-CPU bar; the reference's GPU rate remains unmeasured (no GPU in
any environment seen so far, BASELINE.md). Same-hardware comparison for
calibration: our jax-CPU backend does 63.0k edges/s at batch 16 on the
same 2-core box — 67x the reference before any TPU enters the picture.
"""

import json
import os
import sys
import threading
import time

import numpy as np

_T0 = time.time()

# Measured: benchmarks/BASELINE_MEASURED.json (reference torch-CPU, its
# flagship batch 16, 2 threads — the faster of its two measured configs).
BASELINE_EDGES_PER_S = 936.6
BASELINE_PROVENANCE = "measured torch-CPU b16 (benchmarks/BASELINE_MEASURED.json); reference GPU unmeasured"

# TPU v5e peak: 197 TFLOP/s bf16 (fp32 matmuls decompose on the MXU, so
# bf16 peak is the honest denominator for both dtypes).
PEAK_FLOPS_BF16 = 197e12

# Watchdog: the dev environment reaches the TPU through a relay that can
# wedge if a previous process died holding the grant; a hung device op
# cannot be interrupted in-process. If the bench makes no progress for
# WATCHDOG_S seconds, emit a diagnostic line and hard-exit instead of
# hanging the driver.
WATCHDOG_S = 480
# Hard wall-clock deadline (ADVICE r2): the per-op watchdog cannot catch a
# slow-but-progressing run blowing through the driver's ~590s timeout (an
# external kill is exactly the wedged-grant scenario). At DEADLINE_S the
# deadline thread prints whatever rows exist and exits 0 on its own.
DEADLINE_S = 555
_progress = {"t": time.time()}
_PARTIAL = {"rows": {}, "emitted": False}


def _tick():
    _progress["t"] = time.time()


def _emit(extra=None):
    """Serialize current results (used by main AND the deadline thread)."""
    if _PARTIAL["emitted"]:
        return
    _PARTIAL["emitted"] = True
    print(json.dumps(_final_json(_PARTIAL["rows"], extra or {})), flush=True)


def _watchdog():
    while True:
        time.sleep(10)
        if time.time() - _progress["t"] > WATCHDOG_S:
            print(
                json.dumps(
                    {
                        "metric": "train_edges_per_s_molkgnn_4layer_b1024_bf16",
                        "value": 0,
                        "unit": "edges/s",
                        "vs_baseline": 0,
                        "error": "accelerator unresponsive (relay wedged?)",
                    }
                ),
                flush=True,
            )
            os._exit(1)
        if time.time() - _T0 > DEADLINE_S:
            _log("wall-clock deadline reached; emitting partial results")
            _emit({"deadline_hit": True})
            os._exit(0)


BATCH_SIZE = 256
# Steps per timed repeat, and repeats per config (max kept). The tunneled
# link's latency drifts minute-to-minute (measured spread up to ~2x on
# identical programs), so a single short window is noise-dominated; longer
# windows + best-of-R isolates the program's own rate.
BENCH_STEPS = 320
BENCH_REPEATS = 2
# Wall-clock budget: the driver runs this file under a ~10 min timeout; a
# killed TPU process can wedge the single-tenant grant for every later
# process (CLAUDE.md), so the bench must ALWAYS print its JSON line and
# exit on its own. The headline row always runs; optional rows are skipped
# once the budget is spent (remote compiles are the dominant cost, 20-40s
# per program).
TOTAL_BUDGET_S = 420
# Optimizer steps fused per device dispatch (lax.scan over sampled-id
# blocks, trainer.scan_steps). The per-dispatch launch latency over the
# tunneled link is the dominant e2e overhead; fusing amortizes it across
# SCAN_STEPS steps with identical math (parity test:
# tests/test_training.py::test_scan_steps_match_single_steps).
# 80 (was 10 through r2): at 10, a b1024 window paid 16 link round trips
# against ~64 ms of compute — ~1.5x of the healthy-link headline and the
# entire ~300x collapse in the relay's stable degraded state (~30 ms per
# dispatch+sync, CLAUDE.md). At 80 a window is 4 dispatches, so even a
# degraded-link run stays within ~2x of the program's own rate instead of
# measuring the tunnel.
SCAN_STEPS = 80

PERMS = {1: 1, 2: 2, 3: 6, 4: 12}
KERNELS = (10, 20, 30, 50)
NUM_LAYERS = 4
EDGE_DIM = 7
NODE_DIM = 28


def _flops_per_graph(graphs):
    """Analytic matmul FLOPs per molecule for one fwd+bwd train step
    (backward ~= 2x forward for the scoring matmuls; head/BN negligible)."""
    deg_counts = np.zeros(5)
    for g in graphs:
        for d in range(1, 5):
            deg_counts[d] += g.fields[d].count
    deg_counts /= len(graphs)
    fwd = 0.0
    for layer in range(NUM_LAYERS):
        f_in = NODE_DIM if layer == 0 else sum(KERNELS)
        for d in range(1, 5):
            n_d, l_d, p_d = deg_counts[d], KERNELS[d - 1], PERMS[d]
            fwd += 2 * n_d * (d * f_in) * (l_d * p_d)  # support scoring
            fwd += 2 * n_d * (d * EDGE_DIM) * (l_d * p_d)  # edge scoring
            fwd += 2 * n_d * f_in * l_d  # center scoring
    return 3.0 * fwd  # fwd + bwd


def _log(msg):
    print(f"[bench +{time.time() - _T0:.0f}s] {msg}", file=sys.stderr, flush=True)


class _Runner:
    """One (batch, dtype, spec) config: built once (device transfer +
    compile), measurable in repeated windows. Keeping runners alive lets the
    main loop interleave windows across wall-clock time — the tunneled
    link's latency drifts minute-to-minute (up to ~2x), so the max over
    time-separated windows isolates the program's own rate.

    ``balanced=True`` uses the sampler-aware tight spec + size-dealt batch
    composition (graphs/balance.py): ~90% bucket occupancy vs ~55% for the
    cover spec — same math on the real rows, ~1.7x smaller padded shapes.
    """

    def __init__(
        self, batch_size, matmul_dtype, ds, balanced=False,
        device_sample=False, scan_steps=None, scan_chunk=0,
    ):
        import jax

        from molkgnn_tpu.graphs import spec_for_dataset, spec_for_graphs
        from molkgnn_tpu.models import MolKGNNNet
        from molkgnn_tpu.training import GNNModel, TrainConfig, Trainer

        self.batch_size = batch_size
        # Per-runner scan structure: the b8192 saturation config FAILS to
        # compile as a FLAT scan=80 on the relay backend (UNAVAILABLE
        # ~150 s into the remote compile; bisected r4 — fails with host
        # ids too, so it is a (batch x flat-loop-length) compile-capacity
        # limit, NOT the sampled gather; benchmarks/B8192_BISECT.json).
        # The r5 fix is scan_chunk: nest the 80-step window as 8x10 so
        # the program's loop body is bounded by the chunk while the step
        # sequence stays identical to the headline's
        # (TrainConfig.scan_chunk; parity:
        # tests/test_training.py::test_scan_chunk_matches_flat_scan).
        self.scan = scan_steps or SCAN_STEPS
        # MFU denominator must come from THIS runner's dataset (ADVICE r2:
        # per-dataset mean flops/graph differ between the 256- and
        # 1024-graph pools).
        self.flops_per_graph = _flops_per_graph(ds.graphs)
        self._jax = jax
        if balanced:
            spec = spec_for_dataset(ds, batch_size)
        else:
            spec = spec_for_graphs(ds.graphs, batch_size=batch_size)
        model = GNNModel(
            encoder=MolKGNNNet(
                num_layers=NUM_LAYERS,
                kernels_1hop=KERNELS,
                kernels_nhop=KERNELS,
                graph_embedding_dim=32,
                drop_ratio=0.2,
                matmul_dtype=matmul_dtype,
            ),
            ffn_dropout_rate=0.25,
        )
        cfg = TrainConfig(
            batch_size=batch_size,
            max_epochs=1,
            warmup_iterations=300,
            weight_decay=1e-3,
            progress=False,
            scan_steps=self.scan,
            scan_chunk=scan_chunk,
            balanced_batches=balanced,
            device_sampling=device_sample,
        )
        self.tag = f"b{batch_size}" + ("_devsample" if device_sample else "")
        t0 = time.time()
        self.trainer = Trainer(model, ds, spec, cfg)
        self.dev_data = self.trainer._device_data
        self.device_sample = device_sample
        self.edge_counts = np.array([g.num_edges for g in ds.graphs])
        _log(f"{self.tag} setup (incl. device transfer) {time.time()-t0:.0f}s")

        def id_blocks():
            stream = self.trainer._epoch_id_batches(cfg)
            while True:
                block = []
                while len(block) < self.scan:
                    try:
                        block.append(next(stream))
                    except StopIteration:
                        stream = self.trainer._epoch_id_batches(cfg)
                yield np.stack(block)

        self.state = self.trainer.state
        t0 = time.time()
        if device_sample:
            # Zero per-step host input: ids are drawn on device from the
            # oversampling cdf (trainer._train_steps_sample); the program
            # returns per-step TRUE edge counts for throughput accounting.
            self._prog = self.trainer._train_steps_sample(self.scan)
            self._consts = self.trainer._sample_consts
            self.state, loss_k, _ = self._prog(
                self.state, self.dev_data, *self._consts
            )
        else:
            self.blocks = id_blocks()
            self.state, loss_k = self.trainer._train_steps_scan(
                self.state, self.dev_data, next(self.blocks)
            )
        jax.block_until_ready(loss_k)  # compile
        # Pay the first-readback penalty HERE, outside timed windows (r3
        # measured it at up to 133 s on a degraded link; subsequent value
        # fetches are ~RTT).
        assert np.isfinite(float(np.asarray(loss_k[-1])))
        _log(f"{self.tag} compile {time.time()-t0:.0f}s")
        _tick()
        self.best = None
        self.windows = []  # every window's edges/s, in time order
        self._max_residual_ms = 0.0

    def measure(self, steps=BENCH_STEPS, repeats=BENCH_REPEATS):
        """Run timed windows; keep the best across ALL calls (time-spread),
        and record every window so the artifact carries the drift spread.

        Timing-honesty guard (r3): after the block_until_ready that ends a
        window, ALSO fetch the final loss VALUE and record the residual
        wall time. A remote/relay backend could in principle resolve
        readiness before the device queue drains (a fixed-block microbench
        once "exceeded" the MXU roofline 2.4x that way); a value fetch
        cannot lie — the number must exist. The residual stays OUT of the
        timed window (it includes one link RTT, which would bias fast
        windows down) but ships in the row: a residual comparable to the
        window duration marks the rate as untrustworthy.
        """
        for _ in range(repeats):
            done = 0
            total_edges = 0
            edge_accs = []  # device-sampled path: per-dispatch edge sums
            t0 = time.perf_counter()
            while done < steps:
                if self.device_sample:
                    self.state, loss_k, edges_k = self._prog(
                        self.state, self.dev_data, *self._consts
                    )
                    edge_accs.append(edges_k)
                else:
                    block = next(self.blocks)
                    total_edges += int(
                        self.edge_counts[block[block >= 0]].sum()
                    )
                    self.state, loss_k = self.trainer._train_steps_scan(
                        self.state, self.dev_data, block
                    )
                done += self.scan
                _tick()
            self._jax.block_until_ready(loss_k)
            dt = time.perf_counter() - t0
            t_res = time.perf_counter()
            assert np.isfinite(float(np.asarray(loss_k[-1])))
            residual_ms = 1e3 * (time.perf_counter() - t_res)
            # Accounting readbacks stay OUT of the timed window (they cost
            # link RTTs, not device work; the work they describe is inside).
            for e in edge_accs:
                total_edges += int(np.asarray(e).sum())
            row = {
                "edges_per_s": round(total_edges / dt, 1),
                "step_ms": round(1e3 * dt / done, 3),
                "graphs_per_s": round(done * self.batch_size / dt, 1),
                "sync_residual_ms": round(residual_ms, 2),
            }
            self.windows.append(row["edges_per_s"])
            self._max_residual_ms = max(
                self._max_residual_ms, row["sync_residual_ms"]
            )
            if self.best is None or row["edges_per_s"] > self.best["edges_per_s"]:
                self.best = row
        self.best["windows"] = list(self.windows)
        self.best["max_sync_residual_ms"] = round(self._max_residual_ms, 2)
        self.best["spread"] = round(
            (max(self.windows) - min(self.windows)) / max(self.windows), 3
        )
        self.best["flops_per_graph"] = self.flops_per_graph
        _log(
            f"{self.tag} window: best {self.best['edges_per_s']:.3g} edges/s"
            f" over {len(self.windows)} windows (spread {self.best['spread']})"
        )
        return self.best


def _final_json(rows, extra):
    """Build the output line from whatever rows exist so far. The tracked
    headline is the COMPUTE-BOUND config (b1024 bf16 — VERDICT r2: the b256
    e2e row is latency-bound and mostly measures the tunnel); the
    r01/r02-comparable b256 e2e row rides along as fields."""
    out = {
        "metric": "train_edges_per_s_molkgnn_4layer_b1024_bf16",
        "value": 0,
        "unit": "edges/s",
        "vs_baseline": 0,
        "baseline": BASELINE_PROVENANCE,
        "scan_steps": SCAN_STEPS,
        "wall_s": round(time.time() - _T0, 1),
    }
    if "link_rtt_ms" in _PARTIAL:
        out["link_rtt_ms"] = _PARTIAL["link_rtt_ms"]
        # The relay link has a known stable ~300x-degraded failure state
        # (tiny-dispatch+readback RTT ~29 ms vs <5 ms healthy; see CLAUDE.md).
        # Make the artifact self-explaining: rates measured through a degraded
        # link characterize the link, not the code — point at the committed
        # healthy-link measurement of the same code.
        if _PARTIAL["link_rtt_ms"] > 10.0:
            out["link_state"] = "degraded"
            out["healthy_reference"] = "benchmarks/BENCH_r03_midround.json"
            # r4 root cause (benchmarks/DIAG_TRAINSTEP.json + CLAUDE.md):
            # in this state gather/scatter-path HBM traffic is throttled
            # ~30-80x and each scan iteration pays a ~1.6 ms floor, while
            # MXU matmul chains run at full speed — the numbers below
            # measure that throttle, not this program.
            out["degraded_decomposition"] = "benchmarks/DIAG_TRAINSTEP.json"
        else:
            out["link_state"] = "healthy"
    try:
        import jax

        out["device"] = str(jax.devices()[0])
    except Exception:
        pass
    if "b1024_bf16" in rows:
        head = rows["b1024_bf16"]
    elif rows:
        head = rows[max(rows, key=lambda k: rows[k]["edges_per_s"])]
        out["metric"] = "train_edges_per_s_molkgnn_4layer_fallback"
    else:
        return {**out, **extra, "error": "no row completed"}
    out["value"] = head["edges_per_s"]
    out["vs_baseline"] = round(head["edges_per_s"] / BASELINE_EDGES_PER_S, 1)
    if "flops_per_graph" in head:
        out["mfu_bf16peak"] = round(
            head["graphs_per_s"] * head["flops_per_graph"] / PEAK_FLOPS_BF16,
            4,
        )
        out["matmul_flops_per_graph"] = round(head["flops_per_graph"])
    if "b256_fp32" in rows:
        r256 = rows["b256_fp32"]
        out["b256_fp32_e2e_edges_per_s"] = r256["edges_per_s"]
        out["b256_fp32_e2e_step_ms"] = r256["step_ms"]
        out["b256_fp32_vs_baseline"] = round(
            r256["edges_per_s"] / BASELINE_EDGES_PER_S, 1
        )
    best_name = max(rows, key=lambda k: rows[k]["edges_per_s"])
    best = rows[best_name]
    out["best_config"] = best_name
    out["best_edges_per_s"] = best["edges_per_s"]
    out["best_vs_baseline"] = round(
        best["edges_per_s"] / BASELINE_EDGES_PER_S, 1
    )
    if "flops_per_graph" in best:
        out["mfu_best_bf16peak"] = round(
            best["graphs_per_s"] * best["flops_per_graph"] / PEAK_FLOPS_BF16,
            4,
        )
    for name, row in rows.items():
        out[f"{name}_windows"] = row.get("windows", [])
        out[f"{name}_spread"] = row.get("spread")
        out[f"{name}_max_sync_residual_ms"] = row.get("max_sync_residual_ms")
    if _PARTIAL.get("errors"):
        out["errors"] = _PARTIAL["errors"]
    if "b8192_skipped" in _PARTIAL:
        out["b8192_skipped"] = _PARTIAL["b8192_skipped"]
    return {**out, **extra}


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    import jax

    from molkgnn_tpu.data.dataset import make_synthetic_dataset

    _tick()
    rows = _PARTIAL["rows"]

    # Link health: round-trip a trivial dispatch so a degraded-tunnel run
    # carries its own explanation (r3 observed a stable ~300x-slow relay
    # state after a wedged-grant recovery, on top of the usual ~2x drift).
    import jax.numpy as jnp

    x = jnp.ones((8, 8))
    float(jnp.sum(x + x))  # compile + first-readback, untimed
    t0 = time.perf_counter()
    for _ in range(3):
        float(jnp.sum(x + x))
    _PARTIAL["link_rtt_ms"] = round(1e3 * (time.perf_counter() - t0) / 3, 2)
    _log(f"link RTT (tiny dispatch+readback) {_PARTIAL['link_rtt_ms']} ms")
    _tick()

    # Fault isolation: the relay can throw UNAVAILABLE mid-run (observed
    # during a b8192 compile on a degraded link) — one row dying must not
    # take the emitted JSON line with it.
    def safe(what, fn):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — report, never die
            _log(f"{what} FAILED: {type(e).__name__}: {e}")
            _PARTIAL.setdefault("errors", {})[what] = (
                f"{type(e).__name__}: {e}"
            )
            _tick()
            return None

    # Same dataset construction as earlier rounds (spec capacities derive
    # from the graph pool, so pool size is part of the config).
    ds256 = make_synthetic_dataset(seed=0, num_graphs=4 * BATCH_SIZE)
    r256 = safe("b256_fp32", lambda: _Runner(BATCH_SIZE, None, ds256))
    if r256:
        rows["b256_fp32"] = r256.measure(repeats=1)

    ds1024 = make_synthetic_dataset(seed=0, num_graphs=4 * 1024)
    r1024 = safe("b1024_bf16", lambda: _Runner(1024, "bfloat16", ds1024))
    if r1024:
        rows["b1024_bf16"] = r1024.measure(repeats=1)

    # Device-sampled row: ids drawn ON DEVICE from the oversampling cdf
    # (TrainConfig.device_sampling) — zero per-step host input. Removes
    # the id-block H2D from the step. Measured on the degraded link
    # (2026-08-20): +26% over the host row (557k vs 443k edges/s),
    # exactly the id H2D share at that state's ~30 ms/KB — the rest of
    # the degradation throttles execution itself (~250x), which no code
    # change can route around.
    rs1024 = safe(
        "b1024_bf16_devsample",
        lambda: _Runner(1024, "bfloat16", ds1024, device_sample=True),
    )
    if rs1024:
        rows["b1024_bf16_devsample"] = rs1024.measure(repeats=1)

    def budget_left():
        return TOTAL_BUDGET_S - (time.time() - _T0)

    # Saturation row: batch scaling is near-linear well past 1024 (measured
    # r3: 119M/185M/255M/282M edges/s at b1024/2048/4096/8192 bf16 — the
    # smaller batches are dispatch-latency-bound). At b8192 the step is
    # genuinely compute-bound: 93.5% MFU of bf16 peak with 0.5% window
    # spread (the tunnel disappears from the measurement). Optional so a
    # slow-link day still emits the tracked rows. Device-sampled (the host
    # path's per-dispatch id block is MBs of H2D a degraded link cannot
    # move). Scan structure (bisected r4+r5, benchmarks/B8192_BISECT.json):
    # EVERY K=80 structure fails the relay's remote compile at this batch
    # (flat, 8x10, 16x5 — the compiler evidently expands through loop
    # nesting and dies on total fused step count), while K<=40 NESTED
    # compiles ~3x faster than flat scan10 (127 s for 4x10 vs 437 s).
    # So the row runs scan_steps=40 nested 4x10 (identical step sequence
    # to the headline, tests/test_training.py::test_scan_chunk_matches_
    # flat_scan); the 80-step window is 2 dispatches. Fallback: 2x10.
    r8192 = None
    if budget_left() <= 150:
        # Self-explaining skip (r5): on a degraded link the three tracked
        # rows' compiles + windows eat the budget first; the saturation
        # row returns on a healthy link (where windows are ~ms).
        _PARTIAL["b8192_skipped"] = (
            f"budget ({budget_left():.0f}s left < 150s needed; "
            "degraded-link compiles+windows consumed it)"
        )
        _tick()
    else:
        ds8192 = make_synthetic_dataset(seed=0, num_graphs=2 * 8192)
        r8192 = safe(
            "b8192_bf16_devsample",
            lambda: _Runner(
                8192, "bfloat16", ds8192, device_sample=True,
                scan_steps=40, scan_chunk=10,
            ),
        )
        if r8192 is None and budget_left() > 150:
            r8192 = safe(
                "b8192_bf16_devsample_scan20",
                lambda: _Runner(
                    8192, "bfloat16", ds8192, device_sample=True,
                    scan_steps=20, scan_chunk=10,
                ),
            )
        if r8192:
            rows["b8192_bf16_devsample"] = r8192.measure(
                steps=80, repeats=1
            )

    # Interleaved windows (VERDICT r2 item 3): alternate the compiled
    # programs across wall-clock time so all sample the same tunnel
    # states; each row reports best + all windows + spread. The balanced-
    # batch question moved to benchmarks/compare_balanced.py (a dedicated
    # interleaved A/B; see benchmarks/BALANCED_AB.json).
    # Gate on ANY surviving runner (ADVICE r3: keying the loop on r1024
    # alone meant one failed row froze window accumulation for the rest).
    survivors = [r for r in (r256, r1024, rs1024, r8192) if r]
    while (
        budget_left() > 60
        and survivors
        and min(len(r.windows) for r in survivors) < 5
    ):
        if r256:
            rows["b256_fp32"] = r256.measure(repeats=1)
        if r1024:
            rows["b1024_bf16"] = r1024.measure(repeats=1)
        if rs1024:
            rows["b1024_bf16_devsample"] = rs1024.measure(repeats=1)
        if r8192 is not None:
            rows["b8192_bf16_devsample"] = r8192.measure(
                steps=80, repeats=1
            )
        _tick()

    _emit()


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 — the line must always print
        _log(f"FATAL: {type(e).__name__}: {e}")
        _emit({"error": f"{type(e).__name__}: {e}"})
