"""Parity against the reference's OWN code (not builder-authored oracles).

These tests import /root/reference/models/MolKGNN/kernels.py and
/root/reference/lr.py directly (torch-CPU is installed; torch_geometric is
stubbed with a 3-line attribute container) and assert allclose between the
reference forward/backward and the TPU implementation on random inputs:

  * KernelConv.forward / calculate_total_score (kernels.py:353-448) vs
    models/kgnn.py::KernelConv — all 4 degrees, chirality on/off, achiral
    duplicate-neighbor handling, distinct score weights.
  * Gradient parity through torch.autograd vs jax.grad (argmax-gated
    gather paths, softmax weight mixing).
  * BaseKernelSetConv.forward assembly/column-reordering (kernels.py:610-751)
    vs models/kgnn.py::KernelSetConv on a real packed batch — trainable-only
    and fixed+trainable ([fixed; trainable] block order, kernels.py:701-721).
  * PolynomialDecayLR (lr.py:17-31) vs training/schedule.py, stepped through
    a real torch optimizer.
  * evaluation.py metrics (logAUC both FPR ranges, AUC, PPV, accuracy, F1,
    incl. degenerate-input branches) vs training/metrics.py.

This retires the round-1 risk that implementation and hand-written spec
oracle (tests/spec_kgnn.py) could be wrong together.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from molkgnn_tpu.models.kgnn import KernelConv, KernelSetConv  # noqa: E402

F, E = 28, 7


def _ensure_pyg_stub():
    """kernels.py needs only ``torch_geometric.data.Data`` — an attribute
    container. Stub it so the reference module imports without PyG."""
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


@pytest.fixture(scope="module")
def ref_kernels():
    return _load_ref("/root/reference/models/MolKGNN/kernels.py", "ref_kernels")


@pytest.fixture(scope="module")
def ref_lr():
    # torch >= 2.x dropped the positional ``verbose`` arg the reference
    # passes to _LRScheduler.__init__ (lr.py:15); shim a compat base with
    # the old signature so the reference code runs unmodified.
    import torch.optim.lr_scheduler as tls

    class _CompatLRScheduler(tls.LRScheduler):
        def __init__(self, optimizer, last_epoch=-1, verbose=False):
            super().__init__(optimizer, last_epoch)

    orig = tls._LRScheduler
    tls._LRScheduler = _CompatLRScheduler
    try:
        return _load_ref("/root/reference/lr.py", "ref_lr")
    finally:
        tls._LRScheduler = orig


# Distinct values so a bug that mixes up the three softmax'd score weights
# cannot cancel out.
W_SUPPORT, W_CENTER, W_EDGE = 0.3, 0.1, 0.45


def _random_kernel(rng, L, deg):
    return {
        "x_center": rng.standard_normal((L, F)).astype(np.float32),
        "x_support": rng.standard_normal((L, deg, F)).astype(np.float32),
        "edge_attr_support": rng.standard_normal((L, deg, E)).astype(
            np.float32
        ),
        "p_support": rng.standard_normal((L, deg, 3)).astype(np.float32),
    }


def _random_inputs(rng, m, deg, achiral_dups=False):
    x_focal = rng.standard_normal((m, F)).astype(np.float32)
    p_focal = rng.standard_normal((m, 3)).astype(np.float32)
    x_nei = rng.standard_normal((m, deg, F)).astype(np.float32)
    if achiral_dups and deg == 4:
        for i in range(0, m, 2):  # every other node: two identical neighbors
            x_nei[i, 3] = x_nei[i, 1]
    p_nei = rng.standard_normal((m, deg, 3)).astype(np.float32)
    e_nei = rng.standard_normal((m, deg, E)).astype(np.float32)
    return x_focal, p_focal, x_nei, p_nei, e_nei


def _ref_conv(ref_kernels, kernel, requires_grad=True):
    sys.modules.setdefault  # noqa: B018 (keep import-order explicit)
    from torch_geometric.data import Data  # the stub

    return ref_kernels.KernelConv(
        init_kernel=Data(
            x_center=torch.tensor(kernel["x_center"]),
            x_support=torch.tensor(kernel["x_support"]),
            edge_attr_support=torch.tensor(kernel["edge_attr_support"]),
            p_support=torch.tensor(kernel["p_support"]),
        ),
        requires_grad=requires_grad,
        init_support_attr_sc_weight=W_SUPPORT,
        init_center_attr_sc_weight=W_CENTER,
        init_edge_attr_support_sc_weight=W_EDGE,
    )


def _our_params(kernel):
    return {
        "params": {
            **{k: jnp.asarray(v) for k, v in kernel.items()},
            "length_sc_weight": jnp.asarray(0.2),
            "angle_sc_weight": jnp.asarray(0.2),
            "support_attr_sc_weight": jnp.asarray(W_SUPPORT),
            "center_attr_sc_weight": jnp.asarray(W_CENTER),
            "edge_attr_support_sc_weight": jnp.asarray(W_EDGE),
        }
    }


def _ref_forward(conv, inputs, is_last_layer):
    x_focal, p_focal, x_nei, p_nei, e_nei = map(torch.tensor, inputs)
    sc = conv(
        is_last_layer,
        x_focal=x_focal,
        p_focal=p_focal,
        x_neighbor=x_nei,
        p_neighbor=p_nei,
        edge_attr_neighbor=e_nei,
    )
    return sc  # [L, M]


@pytest.mark.parametrize(
    "deg,is_last_layer",
    [(1, False), (2, False), (3, False), (4, False), (4, True)],
)
def test_kernelconv_forward_matches_reference(ref_kernels, deg, is_last_layer):
    rng = np.random.default_rng(100 + deg)
    m, L = 11, 6
    kernel = _random_kernel(rng, L, deg)
    inputs = _random_inputs(rng, m, deg)

    want = _ref_forward(
        _ref_conv(ref_kernels, kernel), inputs, is_last_layer
    ).detach().numpy().T  # reference is [L, M]; ours is [M, L]

    ours = KernelConv(deg=deg, num_kernels=L, node_dim=F, edge_dim=E)
    got = np.asarray(
        ours.apply(
            _our_params(kernel),
            *map(jnp.asarray, inputs),
            np.ones((m,), bool),
            is_last_layer,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_kernelconv_chirality_achiral_dups_matches_reference(ref_kernels):
    """Nodes with two bitwise-equal neighbor features are achiral: the
    reference short-circuits to +1 for all kernels (kernels.py:309-317)."""
    rng = np.random.default_rng(7)
    m, L, deg = 10, 5, 4
    kernel = _random_kernel(rng, L, deg)
    inputs = _random_inputs(rng, m, deg, achiral_dups=True)

    want = _ref_forward(
        _ref_conv(ref_kernels, kernel), inputs, True
    ).detach().numpy().T

    ours = KernelConv(deg=deg, num_kernels=L, node_dim=F, edge_dim=E)
    got = np.asarray(
        ours.apply(
            _our_params(kernel),
            *map(jnp.asarray, inputs),
            np.ones((m,), bool),
            True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("deg,is_last_layer", [(2, False), (4, True)])
def test_kernelconv_grads_match_reference(ref_kernels, deg, is_last_layer):
    """Backward parity: d(sum(sc * w))/d(kernel tensors + score weights)
    through torch.autograd vs jax.grad. Covers the argmax-gated gathers
    (gradient only through the selected permutation) and the softmax weight
    mixing; the chirality sign is a constant in both (no gradient)."""
    rng = np.random.default_rng(40 + deg)
    m, L = 9, 4
    kernel = _random_kernel(rng, L, deg)
    inputs = _random_inputs(rng, m, deg)
    wout = rng.standard_normal((m, L)).astype(np.float32)

    conv = _ref_conv(ref_kernels, kernel)
    sc = _ref_forward(conv, inputs, is_last_layer)
    (sc.T * torch.tensor(wout)).sum().backward()
    want = {
        "x_center": conv.x_center.grad.numpy(),
        "x_support": conv.x_support.grad.numpy(),
        "edge_attr_support": conv.edge_attr_support.grad.numpy(),
        "support_attr_sc_weight": conv.support_attr_sc_weight.grad.numpy(),
        "center_attr_sc_weight": conv.center_attr_sc_weight.grad.numpy(),
        "edge_attr_support_sc_weight": (
            conv.edge_attr_support_sc_weight.grad.numpy()
        ),
    }

    ours = KernelConv(deg=deg, num_kernels=L, node_dim=F, edge_dim=E)

    def loss(params):
        sc = ours.apply(
            params,
            *map(jnp.asarray, inputs),
            np.ones((m,), bool),
            is_last_layer,
        )
        return jnp.sum(sc * wout)

    got = jax.grad(loss)(_our_params(kernel))["params"]
    for name, ref_g in want.items():
        np.testing.assert_allclose(
            np.asarray(got[name]),
            ref_g,
            rtol=3e-4,
            atol=3e-6,
            err_msg=f"grad mismatch: {name}",
        )
    # p_support only enters through the (piecewise-constant) chirality sign
    # and the argmax gather: zero gradient on both sides.
    assert conv.p_support.grad is None or not conv.p_support.grad.any()
    assert not np.asarray(got["p_support"]).any()


def test_kernelsetconv_assembly_matches_reference(ref_kernels):
    """BaseKernelSetConv.forward (per-degree blocks -> zero matrix ->
    column argsort -> transpose, kernels.py:610-751) vs our scatter-add
    KernelSetConv on a real packed molecule batch."""
    from torch_geometric.data import Data  # the stub

    from molkgnn_tpu.data.dataset import GraphLoader, make_synthetic_dataset
    from molkgnn_tpu.graphs import spec_for_graphs

    ds = make_synthetic_dataset(seed=5, num_graphs=8)
    spec = spec_for_graphs(ds.graphs, batch_size=4)
    batch = next(iter(GraphLoader(ds.graphs[:4], spec, 4)))

    node_mask = np.asarray(batch.node_mask)
    n_real = int(node_mask.sum())
    assert node_mask[:n_real].all(), "real nodes must be a prefix"
    x = np.asarray(batch.x)[:n_real]
    p = np.asarray(batch.p)[:n_real]

    # Every real node must appear in exactly one degree bucket, else the
    # reference's column-reorder changes the output shape (degree-0 nodes).
    bucket_rows = []
    for b in batch.buckets():
        mask = np.asarray(b.mask)
        bucket_rows.append(
            (
                np.asarray(b.focal_index)[mask],
                np.asarray(b.nei_index)[mask],
                np.asarray(b.nei_edge_attr)[mask],
            )
        )
    assert sum(len(r[0]) for r in bucket_rows) == n_real

    counts = (3, 4, 5, 6)
    rng = np.random.default_rng(77)
    kernels = [
        _random_kernel(rng, L, d + 1) for d, L in enumerate(counts)
    ]

    # Reference model with our kernel tensors.
    ref = ref_kernels.BaseKernelSetConv(
        trainable_kernelconv1=_ref_conv(ref_kernels, kernels[0]),
        trainable_kernelconv2=_ref_conv(ref_kernels, kernels[1]),
        trainable_kernelconv3=_ref_conv(ref_kernels, kernels[2]),
        trainable_kernelconv4=_ref_conv(ref_kernels, kernels[3]),
    )
    kw = {}
    for d, (focal, nei, ea) in enumerate(bucket_rows, start=1):
        kw[f"p_focal_deg{d}"] = torch.tensor(p[focal])
        kw[f"nei_p_deg{d}"] = torch.tensor(p[nei])
        kw[f"nei_edge_attr_deg{d}"] = torch.tensor(ea)
        kw[f"selected_index_deg{d}"] = torch.tensor(focal, dtype=torch.long)
        kw[f"nei_index_deg{d}"] = torch.tensor(
            nei.reshape(-1), dtype=torch.long
        )
    want = ref(
        True,  # is_last_layer: exercises the deg-4 chirality path too
        x=torch.tensor(x),
        edge_index=None,
        edge_attr=None,
        p=torch.tensor(p),
        save_score=False,
        **kw,
    ).detach().numpy()  # [n_real, sum(counts)]

    ours = KernelSetConv(num_kernels=counts, node_dim=F, edge_dim=E)
    params = {
        "params": {
            f"kernelconv{d + 1}": _our_params(k)["params"]
            for d, k in enumerate(kernels)
        }
    }
    got = np.asarray(
        ours.apply(params, batch.x, batch.p, batch.buckets(), True)
    )[:n_real]
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_kernelsetconv_fixed_plus_trainable_matches_reference(ref_kernels):
    """Fixed (frozen, human-designed) kernel sets alongside trainable ones:
    the reference concatenates ``[fixed; trainable]`` score rows per degree
    (kernels.py:701-721); ours bakes the fixed tensors as constants and
    emits the same ``[fixed; trainable]`` column block order."""
    from molkgnn_tpu.data.dataset import GraphLoader, make_synthetic_dataset
    from molkgnn_tpu.graphs import spec_for_graphs

    ds = make_synthetic_dataset(seed=9, num_graphs=8)
    spec = spec_for_graphs(ds.graphs, batch_size=4)
    batch = next(iter(GraphLoader(ds.graphs[:4], spec, 4)))

    node_mask = np.asarray(batch.node_mask)
    n_real = int(node_mask.sum())
    x = np.asarray(batch.x)[:n_real]
    p = np.asarray(batch.p)[:n_real]
    bucket_rows = []
    for b in batch.buckets():
        mask = np.asarray(b.mask)
        bucket_rows.append(
            (
                np.asarray(b.focal_index)[mask],
                np.asarray(b.nei_index)[mask],
                np.asarray(b.nei_edge_attr)[mask],
            )
        )
    assert sum(len(r[0]) for r in bucket_rows) == n_real

    counts = (2, 3, 4, 5)
    rng = np.random.default_rng(31)
    trainable = [_random_kernel(rng, L, d + 1) for d, L in enumerate(counts)]
    # Fixed sets on degrees 2 and 4 only (mixed with fixed-free degrees).
    fixed = (
        None,
        _random_kernel(rng, 3, 2),
        None,
        _random_kernel(rng, 2, 4),
    )

    ref = ref_kernels.BaseKernelSetConv(
        fixed_kernelconv2=_ref_conv(ref_kernels, fixed[1], requires_grad=False),
        fixed_kernelconv4=_ref_conv(ref_kernels, fixed[3], requires_grad=False),
        trainable_kernelconv1=_ref_conv(ref_kernels, trainable[0]),
        trainable_kernelconv2=_ref_conv(ref_kernels, trainable[1]),
        trainable_kernelconv3=_ref_conv(ref_kernels, trainable[2]),
        trainable_kernelconv4=_ref_conv(ref_kernels, trainable[3]),
    )
    kw = {}
    for d, (focal, nei, ea) in enumerate(bucket_rows, start=1):
        kw[f"p_focal_deg{d}"] = torch.tensor(p[focal])
        kw[f"nei_p_deg{d}"] = torch.tensor(p[nei])
        kw[f"nei_edge_attr_deg{d}"] = torch.tensor(ea)
        kw[f"selected_index_deg{d}"] = torch.tensor(focal, dtype=torch.long)
        kw[f"nei_index_deg{d}"] = torch.tensor(
            nei.reshape(-1), dtype=torch.long
        )
    want = ref(
        True,
        x=torch.tensor(x),
        edge_index=None,
        edge_attr=None,
        p=torch.tensor(p),
        save_score=False,
        **kw,
    ).detach().numpy()  # [n_real, sum(counts) + 3 + 2]

    ours = KernelSetConv(
        num_kernels=counts, node_dim=F, edge_dim=E, fixed_kernels=fixed
    )
    assert ours.block_widths() == (2, 6, 4, 7)
    # Fixed convs bake the kernel tensors as constants but keep the five
    # score weights as params (kgnn.py:107-126) — supply those to match the
    # reference fixed convs' init weights.
    weight_only = {
        k: v
        for k, v in _our_params(trainable[0])["params"].items()
        if k.endswith("_sc_weight")
    }
    params = {
        "params": {
            **{
                f"kernelconv{d + 1}": _our_params(k)["params"]
                for d, k in enumerate(trainable)
            },
            "fixed_kernelconv2": dict(weight_only),
            "fixed_kernelconv4": dict(weight_only),
        }
    }
    got = np.asarray(
        ours.apply(params, batch.x, batch.p, batch.buckets(), True)
    )[:n_real]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_polynomial_decay_lr_matches_reference(ref_lr):
    """Step the reference scheduler through a real torch optimizer and
    compare the LR consumed at every iteration with our optax schedule."""
    peak, end, warmup, tot, power = 5e-3, 1e-10, 7, 40, 1.0
    param = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([param], lr=peak)
    sched = ref_lr.PolynomialDecayLR(
        opt,
        warmup_iterations=warmup,
        tot_iterations=tot,
        lr=peak,
        end_lr=end,
        power=power,
    )
    ref_lrs = []
    for _ in range(50):  # past tot_iterations to cover the end_lr clamp
        ref_lrs.append(opt.param_groups[0]["lr"])
        sched.step()

    from molkgnn_tpu.training.schedule import polynomial_warmup_decay

    ours = polynomial_warmup_decay(
        peak_lr=peak,
        end_lr=end,
        warmup_iterations=warmup,
        tot_iterations=tot,
        power=power,
    )
    got = [float(ours(i)) for i in range(50)]
    np.testing.assert_allclose(got, ref_lrs, rtol=1e-6, atol=1e-12)


# ----------------------------------------------- metrics vs evaluation.py


@pytest.fixture(scope="module")
def ref_eval():
    """The reference's own evaluation.py (imports numpy + sklearn only).

    numpy 2 removed the ``np.NAN`` alias the reference uses in its
    zero-division branches (evaluation.py:107, 120); restore the alias for
    the module's lifetime so the reference code runs unmodified.
    """
    if not hasattr(np, "NAN"):
        np.NAN = np.nan
    return _load_ref("/root/reference/evaluation.py", "ref_eval")


def _score_sets():
    rng = np.random.default_rng(1234)
    out = []
    for n, frac_pos, scale in [(500, 0.08, 1.0), (300, 0.5, 3.0)]:
        y = (rng.random(n) < frac_pos).astype(np.int64)
        # correlated scores: positives shifted up so the ROC curve is
        # nontrivial inside the [0.001, 0.1] FPR window
        s = rng.standard_normal(n) * scale + 1.5 * y
        out.append((y, s.astype(np.float64)))
    return out


def test_metrics_match_reference_evaluation(ref_eval):
    """training/metrics.py vs the reference's own evaluation.py on random
    logits — logAUC in both FPR ranges used by the monitors, AUC, PPV,
    accuracy, F1 (evaluation.py:11-127)."""
    from molkgnn_tpu.training import metrics as m

    for y, s in _score_sets():
        for rng_ in [(0.001, 0.1), (0.001, 1)]:
            np.testing.assert_allclose(
                m.calculate_logAUC(y, s, rng_),
                ref_eval.calculate_logAUC(y, s, rng_),
                rtol=1e-12,
            )
        np.testing.assert_allclose(
            m.calculate_auc(y, s), ref_eval.calculate_auc(y, s), rtol=1e-12
        )
        np.testing.assert_allclose(
            m.calculate_ppv(y, s), ref_eval.calculate_ppv(y, s), rtol=1e-12
        )
        np.testing.assert_allclose(
            m.calculate_accuracy(y, s),
            ref_eval.calculate_accuracy(y, s),
            rtol=1e-12,
        )
        np.testing.assert_allclose(
            m.calculate_f1_score(y, s),
            ref_eval.calculate_f1_score(y, s),
            rtol=1e-12,
        )


def test_metrics_failure_branches_match_reference(ref_eval):
    """Degenerate inputs: single-class AUC -> -1 fallback
    (evaluation.py:82-87); no predicted positives -> PPV NaN
    (evaluation.py:104-108)."""
    from molkgnn_tpu.training import metrics as m

    # Single-class y: older sklearn raised (-> the -1 fallback); sklearn
    # >= 1.6 warns and returns NaN instead, on both sides identically. The
    # parity contract is "ours == reference under the installed sklearn".
    y_one_class = np.zeros(20, np.int64)
    s = np.linspace(-1, 1, 20)
    got = m.calculate_auc(y_one_class, s)
    want = ref_eval.calculate_auc(y_one_class, s)
    assert (np.isnan(got) and np.isnan(want)) or got == want == -1

    y = np.array([0, 1] * 10)
    s_all_neg = np.full(20, -10.0)  # sigmoid < 0.5 everywhere: tp + fp == 0
    assert np.isnan(m.calculate_ppv(y, s_all_neg))
    assert np.isnan(ref_eval.calculate_ppv(y, s_all_neg))


def test_sigmoid_stable_at_extreme_logits(ref_eval):
    """VERDICT r2 weak #7: the two-branch sigmoid must be warning-free on
    large-magnitude logits and equal the naive form where both are finite
    (reference sigmoid contract: evaluation.py:90-121)."""
    import warnings

    from molkgnn_tpu.training import metrics as m

    x = np.array([-1e4, -800.0, -30.0, -1.0, 0.0, 1.0, 30.0, 800.0, 1e4])
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any RuntimeWarning fails the test
        got = m.sigmoid(x)
    assert np.all(np.isfinite(got))
    assert np.all((got >= 0.0) & (got <= 1.0))
    # Exact saturation at the extremes, monotone in between.
    assert got[0] == 0.0 and got[-1] == 1.0
    assert np.all(np.diff(got) >= 0)
    # Matches the naive form where exp() cannot overflow.
    mid = np.linspace(-30, 30, 101)
    np.testing.assert_allclose(m.sigmoid(mid), 1.0 / (1.0 + np.exp(-mid)), rtol=1e-15)
    # Cutoff metrics stay parity with the reference on extreme logits (the
    # reference's naive sigmoid underflows to 0.0 for very negative x, which
    # agrees with our saturated value — same confusion matrix).
    y = np.array([0, 1] * 8)
    s = np.concatenate([np.full(8, -500.0), np.full(8, 500.0)])
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # reference side may warn
        want_acc = ref_eval.calculate_accuracy(y, s)
    np.testing.assert_allclose(m.calculate_accuracy(y, s), want_acc, rtol=1e-12)
