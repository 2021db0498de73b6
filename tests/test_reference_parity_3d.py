"""3D-baseline parity against the reference's OWN code.

Extends tests/test_reference_parity.py (KernelConv/metrics/LR) to the
baselines whose reference modules are importable on installed torch-CPU
with only *generic-primitive* stubs:

  * SchNet full forward (/root/reference/models/SchNet/schnet.py) vs
    models/schnet.py — same injected weights, same molecules, end to end
    through the radius graph, Gaussian smearing, all update_e/v/u layers
    and the graph readout.
  * ChIRoNet InternalCoordinateEncoder
    (/root/reference/models/ChIRoNet/alpha_encoder.py:135-258) vs
    models/chironet.py::InternalCoordinateEncoder — bond-length / angle /
    torsion encoders, learned phase-shift sinusoids, sigmoid AND
    scatter-softmax c-normalization, local-structure pooling, z_alpha.
  * DimeNet++ InteractionPPBlock / OutputPPBlock
    (/root/reference/models/ChIRoNet/gnn_3D/dimenet_pp.py:60-190) vs
    models/dimenetpp.py on random basis inputs with injected weights.
  * SphereNet (/root/reference/models/ChIRoNet/gnn_3D/spherenet.py) —
    (a) the sympy-codegen basis embeddings (dist/angle/torsion incl.
    m != 0 harmonics) vs ops/basis.py on random inputs; (b) the full
    network (init/update_e/update_v/update_u, all layers) vs
    models/spherenet.py with injected weights, given shared geometry.

The stubs replace torch_scatter / torch_cluster C++ extensions (absent
here) with their *documented generic contracts* (sum-scatter, segment
softmax, all-pairs radius graph) — a few lines of index_add each, not
reference logic, so the network math under test is genuinely the
reference's. torch_cluster's boundary semantics (dist < r vs <= r) are
measure-zero on real conformer coordinates.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


# --------------------------------------------------------------- stubs


def _ensure_stubs():
    """Install (or augment) torch_geometric / torch_scatter stub modules.

    tests/test_reference_parity.py may already have installed a
    torch_geometric stub that only carries ``.data``; augment it in place
    so both files can run in either order within one pytest session.
    """
    tg = sys.modules.get("torch_geometric")
    if tg is None:
        tg = types.ModuleType("torch_geometric")
        sys.modules["torch_geometric"] = tg
    if not hasattr(tg, "data"):
        tg_data = types.ModuleType("torch_geometric.data")

        class Data:
            def __init__(self, **kwargs):
                for k, v in kwargs.items():
                    setattr(self, k, v)

        tg_data.Data = Data
        tg.data = tg_data
        sys.modules["torch_geometric.data"] = tg_data

    if not hasattr(tg, "nn"):
        tg_nn = types.ModuleType("torch_geometric.nn")

        def radius_graph(pos, r, batch=None, max_num_neighbors=32):
            # Generic contract: directed (j, i) for every same-graph pair
            # with |pos_j - pos_i| < r, j != i (symmetric set, so the
            # row/col direction convention cancels). Boundary differs from
            # torch_cluster by < vs <= (measure-zero on real conformers).
            # torch_cluster also CAPS neighbors per query point at
            # max_num_neighbors=32, dropping the excess in implementation-
            # defined order (ADVICE r2); real molecular conformers never
            # reach 32 in-cutoff neighbors, so instead of emulating an
            # arbitrary truncation order we assert the cap is not binding —
            # making the stub's output provably equal to torch_cluster's.
            n = pos.shape[0]
            d = torch.cdist(pos, pos)
            mask = (d < r) & ~torch.eye(n, dtype=torch.bool)
            if batch is not None:
                mask &= batch[:, None] == batch[None, :]
            per_node = mask.sum(dim=1)
            assert int(per_node.max()) < max_num_neighbors, (
                "radius_graph stub: a node has >= max_num_neighbors "
                f"({int(per_node.max())} >= {max_num_neighbors}) in-cutoff "
                "neighbors; the real torch_cluster would truncate here"
            )
            i_idx, j_idx = mask.nonzero(as_tuple=True)
            return torch.stack([j_idx, i_idx])

        def global_add_pool(x, batch, size=None):
            size = int(batch.max()) + 1 if size is None else size
            out = torch.zeros((size,) + x.shape[1:], dtype=x.dtype)
            return out.index_add(0, batch, x)

        def global_mean_pool(x, batch, size=None):
            s = global_add_pool(x, batch, size)
            cnt = global_add_pool(torch.ones_like(x[:, :1]), batch, size)
            return s / cnt.clamp(min=1)

        tg_nn.radius_graph = radius_graph
        tg_nn.global_add_pool = global_add_pool
        tg_nn.global_mean_pool = global_mean_pool
        tg.nn = tg_nn
        sys.modules["torch_geometric.nn"] = tg_nn

    if not hasattr(tg.nn, "NNConv"):

        class NNConv(torch.nn.Module):
            """PyG NNConv (edge-conditioned conv), documented contract:
            out_i = lin(x_i) + sum_{j->i} x_j @ nn(e_ji).view(F_in, F_out)
            with aggr='add', root_weight=True."""

            def __init__(self, in_channels, out_channels, nn, aggr="add",
                         root_weight=True, bias=True):
                super().__init__()
                assert aggr == "add" and root_weight
                self.in_channels = in_channels
                self.out_channels = out_channels
                self.nn = nn
                self.lin = torch.nn.Linear(
                    in_channels, out_channels, bias=False
                )
                self.bias = (
                    torch.nn.Parameter(torch.zeros(out_channels))
                    if bias
                    else None
                )

            def forward(self, x, edge_index, edge_attr):
                j, i = edge_index
                w = self.nn(edge_attr).view(
                    -1, self.in_channels, self.out_channels
                )
                msgs = torch.bmm(x[j].unsqueeze(1), w).squeeze(1)
                out = torch.zeros(
                    (x.shape[0], self.out_channels), dtype=x.dtype
                ).index_add(0, i, msgs)
                out = out + self.lin(x)
                if self.bias is not None:
                    out = out + self.bias
                return out

        class GATConv(torch.nn.Module):
            """PyG GATConv, documented contract: per-head projections,
            attention logits LeakyReLU(a_src . xh_j + a_dst . xh_i),
            per-target softmax over {incoming edges} U {self-loops},
            concat=False -> head mean, + bias. Attention dropout only in
            train mode (these tests run eval)."""

            def __init__(self, in_channels, out_channels, heads=1,
                         concat=False, negative_slope=0.2, dropout=0.0,
                         add_self_loops=True, bias=True,
                         flow="source_to_target"):
                super().__init__()
                assert not concat and flow == "source_to_target"
                self.H, self.C = heads, out_channels
                self.negative_slope = negative_slope
                self.add_self_loops = add_self_loops
                self.lin = torch.nn.Linear(
                    in_channels, heads * out_channels, bias=False
                )
                self.att_src = torch.nn.Parameter(
                    torch.randn(1, heads, out_channels)
                )
                self.att_dst = torch.nn.Parameter(
                    torch.randn(1, heads, out_channels)
                )
                self.bias = (
                    torch.nn.Parameter(torch.zeros(out_channels))
                    if bias
                    else None
                )

            def forward(self, x, edge_index):
                n = x.shape[0]
                j, i = edge_index
                if self.add_self_loops:
                    loop = torch.arange(n)
                    j = torch.cat([j, loop])
                    i = torch.cat([i, loop])
                xh = self.lin(x).view(n, self.H, self.C)
                a_src = (xh * self.att_src).sum(-1)  # [N, H]
                a_dst = (xh * self.att_dst).sum(-1)
                e = torch.nn.functional.leaky_relu(
                    a_src[j] + a_dst[i], self.negative_slope
                )  # [E+N, H]
                mx = torch.full((n, self.H), float("-inf")).index_reduce(
                    0, i, e, "amax", include_self=False
                )
                ex = torch.exp(e - mx[i])
                den = torch.zeros((n, self.H)).index_add(0, i, ex)
                alpha = ex / den[i]
                out = torch.zeros((n, self.H, self.C)).index_add(
                    0, i, xh[j] * alpha.unsqueeze(-1)
                )
                out = out.mean(dim=1)
                if self.bias is not None:
                    out = out + self.bias
                return out

        tg.nn.NNConv = NNConv
        tg.nn.GATConv = GATConv

    if not hasattr(tg.nn, "resolver"):
        tg_resolver = types.ModuleType("torch_geometric.nn.resolver")

        def activation_resolver(name="relu"):
            # spherenet.py only ever resolves 'swish' (= SiLU).
            assert name == "swish"
            return torch.nn.SiLU()

        tg_resolver.activation_resolver = activation_resolver
        tg.nn.resolver = tg_resolver
        sys.modules["torch_geometric.nn.resolver"] = tg_resolver

        tg_inits = types.ModuleType("torch_geometric.nn.inits")

        def glorot_orthogonal(tensor, scale):
            # Generic Glorot-orthogonal filler (params are injected after
            # construction, so only shape validity matters here).
            torch.nn.init.orthogonal_(tensor.data)
            denom = (tensor.size(-2) + tensor.size(-1)) * tensor.var()
            tensor.data *= (scale / denom).sqrt()

        tg_inits.glorot_orthogonal = glorot_orthogonal
        tg.nn.inits = tg_inits
        sys.modules["torch_geometric.nn.inits"] = tg_inits

    if not hasattr(tg.nn, "acts"):
        tg_acts = types.ModuleType("torch_geometric.nn.acts")
        tg_acts.swish = lambda x: x * torch.sigmoid(x)
        tg.nn.acts = tg_acts
        sys.modules["torch_geometric.nn.acts"] = tg_acts

        # torch_geometric.nn.models.dimenet: only ResidualLayer is actually
        # instantiated by the reference blocks under test (the basis/
        # embedding layers are constructed by DimeNetPlusPlus.__init__,
        # which these tests never call). ResidualLayer implements the
        # documented DimeNet contract x + act(lin2(act(lin1(x)))).
        tg_models = types.ModuleType("torch_geometric.nn.models")
        tg_dimenet = types.ModuleType("torch_geometric.nn.models.dimenet")

        class ResidualLayer(torch.nn.Module):
            def __init__(self, hidden_channels, act):
                super().__init__()
                self.act = act
                self.lin1 = torch.nn.Linear(hidden_channels, hidden_channels)
                self.lin2 = torch.nn.Linear(hidden_channels, hidden_channels)

            def reset_parameters(self):
                # PyG: glorot-orthogonal weights, zero biases; the tests
                # inject exact params afterwards, so only shapes matter.
                glorot_orthogonal(self.lin1.weight, scale=2.0)
                self.lin1.bias.data.fill_(0)
                glorot_orthogonal(self.lin2.weight, scale=2.0)
                self.lin2.bias.data.fill_(0)

            def forward(self, x):
                return x + self.act(self.lin2(self.act(self.lin1(x))))

        # The PyG dimenet basis/embedding layers, implemented to their
        # documented contracts. The symbolic Bessel / real-spherical-
        # harmonic construction is NOT re-derived here: it is lazily
        # borrowed from the REFERENCE'S OWN spherenet.py codegen
        # (bessel_basis / real_sph_harm, spherenet.py:121-255 — the same
        # published DimeNet construction PyG vendors), so the math under
        # test stays the reference's.

        class Envelope(torch.nn.Module):
            # PyG Envelope: smooth-cutoff polynomial u(x) with u(1) = 0,
            # plus the (x < 1) gate PyG applies (radius_graph guarantees
            # x < 1 on real edges, and u(1) = 0 anyway).
            def __init__(self, exponent):
                super().__init__()
                self.p = exponent + 1
                self.a = -(self.p + 1) * (self.p + 2) / 2
                self.b = self.p * (self.p + 2)
                self.c = -self.p * (self.p + 1) / 2

            def forward(self, x):
                p, a, b, c = self.p, self.a, self.b, self.c
                x0 = x.pow(p - 1)
                x1 = x0 * x
                x2 = x1 * x
                return (1.0 / x + a * x0 + b * x1 + c * x2) * (x < 1.0).to(
                    x.dtype
                )

        class BesselBasisLayer(torch.nn.Module):
            def __init__(self, num_radial, cutoff=5.0, envelope_exponent=5):
                super().__init__()
                self.cutoff = cutoff
                self.envelope = Envelope(envelope_exponent)
                self.freq = torch.nn.Parameter(torch.empty(num_radial))
                self.reset_parameters()

            def reset_parameters(self):
                with torch.no_grad():
                    torch.arange(1, self.freq.numel() + 1, out=self.freq)
                    self.freq.mul_(torch.pi)

            def forward(self, dist):
                dist = dist.unsqueeze(-1) / self.cutoff
                return self.envelope(dist) * (self.freq * dist).sin()

        class SphericalBasisLayer(torch.nn.Module):
            def __init__(
                self, num_spherical, num_radial, cutoff=5.0,
                envelope_exponent=5,
            ):
                super().__init__()
                import sympy as sym

                ref_sphere = _ref_spherenet_module()
                self.num_spherical = num_spherical
                self.num_radial = num_radial
                self.cutoff = cutoff
                self.envelope = Envelope(envelope_exponent)
                bessel_forms = ref_sphere.bessel_basis(
                    num_spherical, num_radial
                )
                sph_harm_forms = ref_sphere.real_sph_harm(num_spherical)
                self.sph_funcs = []
                self.bessel_funcs = []
                x, theta = sym.symbols("x theta")
                modules = {"sin": torch.sin, "cos": torch.cos}
                for i in range(num_spherical):
                    if i == 0:
                        sph1 = sym.lambdify(
                            [theta], sph_harm_forms[i][0], modules
                        )(0)
                        self.sph_funcs.append(
                            lambda x, c=sph1: torch.zeros_like(x) + c
                        )
                    else:
                        self.sph_funcs.append(
                            sym.lambdify([theta], sph_harm_forms[i][0], modules)
                        )
                    for j in range(num_radial):
                        self.bessel_funcs.append(
                            sym.lambdify([x], bessel_forms[i][j], modules)
                        )

            def forward(self, dist, angle, idx_kj):
                dist = dist / self.cutoff
                rbf = torch.stack([f(dist) for f in self.bessel_funcs], dim=1)
                # PyG applies the envelope here (unlike the reference's
                # local angle_emb copy, which comments it out).
                rbf = self.envelope(dist).unsqueeze(-1) * rbf
                cbf = torch.stack([f(angle) for f in self.sph_funcs], dim=1)
                n, k = self.num_spherical, self.num_radial
                return (
                    rbf[idx_kj].view(-1, n, k) * cbf.view(-1, n, 1)
                ).view(-1, n * k)

        class EmbeddingBlock(torch.nn.Module):
            # PyG contract: 95-row atom embedding, rbf projection, one
            # linear over cat([x_i, x_j, rbf]) — TARGET embedding first
            # (same family as the reference's init block,
            # spherenet.py:441).
            def __init__(self, num_radial, hidden_channels, act):
                super().__init__()
                import math

                self.act = act
                self.emb = torch.nn.Embedding(95, hidden_channels)
                self.lin_rbf = torch.nn.Linear(num_radial, hidden_channels)
                self.lin = torch.nn.Linear(3 * hidden_channels, hidden_channels)
                with torch.no_grad():
                    self.emb.weight.uniform_(-math.sqrt(3), math.sqrt(3))

            def reset_parameters(self):
                pass  # params are injected by the tests after construction

            def forward(self, x, rbf, i, j):
                x = self.emb(x)
                rbf = self.act(self.lin_rbf(rbf))
                return self.act(
                    self.lin(torch.cat([x[i], x[j], rbf], dim=-1))
                )

        tg_dimenet.ResidualLayer = ResidualLayer
        tg_dimenet.BesselBasisLayer = BesselBasisLayer
        tg_dimenet.SphericalBasisLayer = SphericalBasisLayer
        tg_dimenet.EmbeddingBlock = EmbeddingBlock
        tg_dimenet.Envelope = Envelope
        tg.nn.models = tg_models
        tg_models.dimenet = tg_dimenet
        sys.modules["torch_geometric.nn.models"] = tg_models
        sys.modules["torch_geometric.nn.models.dimenet"] = tg_dimenet

    if "torch_sparse" not in sys.modules or not hasattr(
        sys.modules["torch_sparse"].SparseTensor, "storage"
    ):
        tsp = sys.modules.get("torch_sparse") or types.ModuleType(
            "torch_sparse"
        )

        class _Storage:
            def __init__(self, row, col, value):
                self._row, self._col, self._value = row, col, value

            def row(self):
                return self._row

            def col(self):
                return self._col

            def value(self):
                return self._value

        class SparseTensor:
            """torch_sparse.SparseTensor's documented CSR contract, the
            subset DimeNet's triplets() uses (dimenet_pp.py:304-325):
            construction sorts coordinates by (row, col); ``adj[idx]``
            row-slices (result row k = original row idx[k], preserving
            intra-row order); ``set_value(None).sum(dim=1)`` yields
            per-row nnz counts; ``storage.row/col/value`` expose the
            COO views of the (sliced) tensor."""

            def __init__(self, row=None, col=None, value=None,
                         sparse_sizes=None):
                n_rows, n_cols = sparse_sizes
                perm = torch.argsort(row * n_cols + col)
                self._row = row[perm]
                self._col = col[perm]
                self._value = None if value is None else value[perm]
                self._sizes = tuple(sparse_sizes)
                counts = torch.zeros(n_rows, dtype=torch.long).index_add(
                    0, self._row, torch.ones_like(self._row)
                )
                self._rowptr = torch.zeros(n_rows + 1, dtype=torch.long)
                self._rowptr[1:] = torch.cumsum(counts, 0)

            @classmethod
            def _from_coo(cls, row, col, value, sizes, rowptr):
                new = object.__new__(cls)
                new._row, new._col, new._value = row, col, value
                new._sizes, new._rowptr = sizes, rowptr
                return new

            def __getitem__(self, idx):
                counts = self._rowptr[idx + 1] - self._rowptr[idx]
                total = int(counts.sum())
                out_row = torch.repeat_interleave(
                    torch.arange(len(idx)), counts
                )
                start_of_out_row = torch.cumsum(counts, 0) - counts
                offs = torch.arange(total) - start_of_out_row[out_row]
                pos = self._rowptr[idx][out_row] + offs
                counts = counts.long()
                rowptr = torch.zeros(len(idx) + 1, dtype=torch.long)
                rowptr[1:] = torch.cumsum(counts, 0)
                return SparseTensor._from_coo(
                    out_row,
                    self._col[pos],
                    None if self._value is None else self._value[pos],
                    (len(idx), self._sizes[1]),
                    rowptr,
                )

            def set_value(self, value, layout=None):
                assert value is None
                return SparseTensor._from_coo(
                    self._row, self._col, None, self._sizes, self._rowptr
                )

            def sum(self, dim):
                assert dim == 1 and self._value is None
                return self._rowptr[1:] - self._rowptr[:-1]

            @property
            def storage(self):
                return _Storage(self._row, self._col, self._value)

        tsp.SparseTensor = SparseTensor
        sys.modules["torch_sparse"] = tsp

    if "torch_scatter" not in sys.modules:
        ts = types.ModuleType("torch_scatter")

        def scatter(src, index, dim=0, out=None, dim_size=None, reduce="sum"):
            assert dim == 0 and out is None and reduce in ("sum", "add")
            size = int(index.max()) + 1 if dim_size is None else dim_size
            res = torch.zeros((size,) + src.shape[1:], dtype=src.dtype)
            return res.index_add(0, index, src)

        def scatter_softmax(src, index, dim=0):
            assert dim == 0
            size = int(index.max()) + 1
            mx = torch.full((size,) + src.shape[1:], float("-inf"))
            mx = mx.index_reduce(0, index, src, "amax", include_self=True)
            ex = torch.exp(src - mx[index])
            den = torch.zeros_like(mx).index_add(0, index, ex)
            return ex / den[index]

        composite = types.ModuleType("torch_scatter.composite")
        composite.scatter_softmax = scatter_softmax
        ts.scatter = scatter
        ts.composite = composite
        sys.modules["torch_scatter"] = ts
        sys.modules["torch_scatter.composite"] = composite


def _load_ref(path, name):
    _ensure_stubs()
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


_REF_SPHERENET_CACHE = []


def _ref_spherenet_module():
    """The reference's own spherenet.py, lazily loaded for its symbolic
    bessel_basis / real_sph_harm codegen (spherenet.py:121-255), which the
    SphericalBasisLayer stub borrows (see _ensure_stubs)."""
    if not _REF_SPHERENET_CACHE:
        if not hasattr(np, "math"):
            import math as _math

            np.math = _math
        _REF_SPHERENET_CACHE.append(
            _load_ref(
                "/root/reference/models/ChIRoNet/gnn_3D/spherenet.py",
                "ref_spherenet_codegen",
            )
        )
    return _REF_SPHERENET_CACHE[0]


def _t(a):
    return torch.tensor(np.asarray(a))


def _copy_linear(ref_lin, flax_lin):
    with torch.no_grad():
        ref_lin.weight.copy_(_t(flax_lin["kernel"]).T)
        if getattr(ref_lin, "bias", None) is not None:
            ref_lin.bias.copy_(_t(flax_lin["bias"]))


# --------------------------------------------------------------- SchNet


@pytest.fixture(scope="module")
def ref_schnet():
    return _load_ref("/root/reference/models/SchNet/schnet.py", "ref_schnet")


def test_schnet_forward_matches_reference(ref_schnet):
    """End-to-end SchNet on 4 real (synthetic-conformer) molecules: the
    reference builds its own radius graph from positions; ours arrives as
    masked precomputed edges (graphs/geometric.py). Same injected weights
    => same graph embeddings (schnet.py:105-172)."""
    from torch_geometric.data import Data  # the stub

    from molkgnn_tpu.data.dataset import make_synthetic_dataset
    from molkgnn_tpu.graphs.geometric import batch_points, point_spec_for_graphs
    from molkgnn_tpu.models.schnet import SchNet

    cutoff, layers, H, FLT, G, OUT = 4.0, 3, 16, 12, 25, 8
    ds = make_synthetic_dataset(seed=3, num_graphs=8)
    spec = point_spec_for_graphs(ds.graphs, batch_size=4, cutoff=cutoff)
    batch = batch_points(ds.graphs[:4], spec)

    model = SchNet(
        cutoff=cutoff,
        num_layers=layers,
        hidden_channels=H,
        num_filters=FLT,
        num_gaussians=G,
        out_channels=OUT,
    )
    params = model.init(jax.random.key(0), batch)["params"]

    ref = ref_schnet.SchNet(
        cutoff=cutoff,
        num_layers=layers,
        hidden_channels=H,
        num_filters=FLT,
        num_gaussians=G,
        out_channels=OUT,
    )
    with torch.no_grad():
        ref.init_v.weight.copy_(_t(params["init_v"]))
    for layer in range(layers):
        _copy_linear(ref.update_es[layer].mlp[0], params[f"mlp1_{layer}"])
        _copy_linear(ref.update_es[layer].mlp[2], params[f"mlp2_{layer}"])
        _copy_linear(ref.update_es[layer].lin, params[f"lin_{layer}"])
        _copy_linear(ref.update_vs[layer].lin1, params[f"uv1_{layer}"])
        _copy_linear(ref.update_vs[layer].lin2, params[f"uv2_{layer}"])
    _copy_linear(ref.update_u.lin1, params["uu1"])
    _copy_linear(ref.update_u.lin2, params["uu2"])
    ref.eval()

    node_mask = np.asarray(batch.node_mask)
    n_real = int(node_mask.sum())
    assert node_mask[:n_real].all(), "real nodes must be a prefix"
    want = ref(
        Data(
            z=torch.tensor(
                np.asarray(batch.z)[:n_real], dtype=torch.long
            ),
            pos=_t(np.asarray(batch.pos)[:n_real]),
            batch=torch.tensor(
                np.asarray(batch.node_graph_id)[:n_real], dtype=torch.long
            ),
        )
    ).detach().numpy()

    got = np.asarray(model.apply({"params": params}, batch))
    assert got.shape == want.shape == (4, OUT)
    # Scatter summation order differs between the two radius-edge
    # enumerations — tolerance, not bitwise.
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_schnet_checkpoint_import_round_trip(ref_schnet, tmp_path):
    """SchNet family through the reference-checkpoint importer: train the
    reference's own SchNet on torch-CPU (wrapped as model.py wires it:
    gnn_model + ffn), import the state_dict via from_torch_state_dict
    (family-dispatched from the template), and require our forward to
    reproduce its eval logits at fp64 precision. Then the non-kgnn CLI
    chain (r5 regressions: the argv peek missed '--gnn_type=X', and the
    export template crashed on PointBatchSpec): torch.save ->
    molkgnn-import --gnn_type=schnet -> molkgnn-screen, scores matching
    the in-process fp32 import."""
    from torch_geometric.data import Data  # the stub

    from molkgnn_tpu.data.dataset import make_synthetic_dataset
    from molkgnn_tpu.graphs.geometric import (
        batch_points,
        point_spec_for_graphs,
    )
    from molkgnn_tpu.models.schnet import SchNet
    from molkgnn_tpu.training import GNNModel, from_torch_state_dict

    # seed 3 / cutoff 4.0 = the forward-parity test's known-good geometry:
    # every node needs an in-cutoff neighbor (the reference's scatter —
    # real torch_scatter too — sizes its output by max index, so a batch
    # whose LAST node is isolated crashes its own forward) and no node may
    # exceed the stub's max_num_neighbors.
    cutoff, layers, H, FLT, G, OUT = 4.0, 2, 16, 12, 25, 8
    ds = make_synthetic_dataset(seed=3, num_graphs=8)
    spec = point_spec_for_graphs(ds.graphs, batch_size=4, cutoff=cutoff)
    batch = batch_points(ds.graphs[:4], spec)
    node_mask = np.asarray(batch.node_mask)
    n_real = int(node_mask.sum())
    assert node_mask[:n_real].all()

    prev_default = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:

        class RefGNNModel(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.gnn_model = ref_schnet.SchNet(
                    cutoff=cutoff, num_layers=layers, hidden_channels=H,
                    num_filters=FLT, num_gaussians=G, out_channels=OUT,
                )
                self.ffn = torch.nn.Linear(OUT, 1)

            def forward(self, data):
                return self.ffn(self.gnn_model(data))

        wrapper = RefGNNModel().double()
        data = Data(
            z=torch.tensor(np.asarray(batch.z)[:n_real], dtype=torch.long),
            pos=torch.tensor(np.asarray(batch.pos, np.float64)[:n_real]),
            batch=torch.tensor(
                np.asarray(batch.node_graph_id)[:n_real], dtype=torch.long
            ),
        )
        y = torch.tensor([0.0, 1.0, 0.0, 1.0], dtype=torch.float64)
        opt = torch.optim.AdamW(wrapper.parameters(), lr=1e-3)
        loss_fn = torch.nn.BCEWithLogitsLoss()
        wrapper.train()
        losses = []
        for _ in range(4):
            opt.zero_grad()
            loss = loss_fn(wrapper(data)[:, 0], y)
            loss.backward()
            opt.step()
            losses.append(float(loss.detach()))
        assert losses[-1] < losses[0]
        wrapper.eval()
        want = wrapper(data).detach().numpy()[:, 0]
        sd = wrapper.state_dict()
    finally:
        torch.set_default_dtype(prev_default)

    model = GNNModel(
        encoder=SchNet(
            cutoff=cutoff, num_layers=layers, hidden_channels=H,
            num_filters=FLT, num_gaussians=G, out_channels=OUT,
        ),
        ffn_dropout_rate=0.0,
    )
    template = jax.device_get(model.init(jax.random.key(0), batch))
    as64 = lambda a: (
        np.asarray(a, np.float64)
        if np.issubdtype(np.asarray(a).dtype, np.floating)
        else np.asarray(a)
    )
    imported = from_torch_state_dict(jax.tree.map(as64, template), sd)
    batch64 = jax.tree.map(as64, batch)
    jax.config.update("jax_enable_x64", True)
    try:
        got, _emb = model.apply(imported, batch64, train=False)
        got = np.asarray(got)
    finally:
        jax.config.update("jax_enable_x64", False)
    # The two radius-edge enumerations differ at the cutoff boundary
    # (ours precomputed on the host in fp32, the reference's built in
    # fp64) — same tolerance rationale as the forward-parity test. An
    # importer-mapping error would be wrong by O(1), not O(1e-6).
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # ---- CLI chain: import (equals-form flag) -> export -> screen.
    import os
    import subprocess

    from molkgnn_tpu.chem.embed import embed_molecule
    from molkgnn_tpu.chem.features import mol_to_graph
    from molkgnn_tpu.chem.sdf import write_sdf
    from molkgnn_tpu.chem.smiles import parse_smiles
    from molkgnn_tpu.graphs.geometric import point_spec_for_graphs
    from molkgnn_tpu.serving.predictor import Predictor

    def mk(smi, i):
        m = parse_smiles(smi, add_hs=True)
        pos = embed_molecule(m, seed=i, iterations=40)
        for k, a in enumerate(m.atoms):
            a.x, a.y, a.z = map(float, pos[k])
        return m

    mols = [mk(s, i) for i, s in enumerate(["CCO", "CCN", "CCC"])]
    sdf = tmp_path / "lib.sdf"
    write_sdf(str(sdf), mols)
    ckpt = tmp_path / "schnet_sd.pt"
    torch.save({"state_dict": sd}, str(ckpt))
    art = tmp_path / "schnet.mkx"
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "molkgnn_tpu.cli.import_ckpt",
         "--torch_ckpt", str(ckpt), "--sdf", str(sdf), "--out", str(art),
         "--gnn_type=schnet", "--batch_size", "4",
         "--num_layers", str(layers), "--hidden_channels", str(H),
         "--num_filters", str(FLT), "--num_gaussians", str(G),
         "--cutoff", str(cutoff), "--out_channels", str(OUT)],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out_csv = tmp_path / "scores.csv"
    r = subprocess.run(
        [sys.executable, "-m", "molkgnn_tpu.cli.screen",
         "--exported", str(art), "--sdf", str(sdf), "--out", str(out_csv)],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    got_cli = np.array(
        [float(ln.split(",")[1])
         for ln in out_csv.read_text().strip().splitlines()[1:]]
    )
    sgraphs = [mol_to_graph(m, y=0.0, idx=i) for i, m in enumerate(mols)]
    sspec = point_spec_for_graphs(sgraphs, batch_size=4, cutoff=cutoff)
    f32 = lambda a: (
        np.asarray(a, np.float32)
        if np.issubdtype(np.asarray(a).dtype, np.floating)
        else np.asarray(a)
    )
    pred = Predictor(
        model,
        jax.tree.map(f32, imported["params"]),
        jax.tree.map(f32, imported.get("batch_stats", {})),
        sspec,
    )
    want_cli = pred.predict_graphs(sgraphs)
    assert got_cli.shape == want_cli.shape == (3,)
    np.testing.assert_allclose(got_cli, want_cli, rtol=1e-4, atol=1e-5)


# -------------------------------------- ChIRoNet InternalCoordinateEncoder


@pytest.fixture(scope="module")
def ref_alpha():
    return _load_ref(
        "/root/reference/models/ChIRoNet/alpha_encoder.py", "ref_alpha"
    )


F_Z, F_H = (4, 5, 6), 16
HID = {
    "d": (8,),
    "phi": (8, 8),
    "c": (8,),
    "shift": (8,),
    "alpha": (8,),
}


@pytest.fixture(scope="module")
def chiro_batch():
    from molkgnn_tpu.chem.embed import embed_molecule
    from molkgnn_tpu.chem.smiles import parse_smiles
    from molkgnn_tpu.graphs.chiro import (
        batch_chiro,
        chiro_spec_for_graphs,
        mol_to_chiro_graph,
    )

    smiles = ["CCO", "CC(=O)O", "CCN(C)C", "CCCC"]
    graphs = []
    for i, smi in enumerate(smiles):
        m = parse_smiles(smi, add_hs=True)
        pos = embed_molecule(m, seed=i, iterations=60)
        for k, a in enumerate(m.atoms):
            a.x, a.y, a.z = map(float, pos[k])
        g = mol_to_chiro_graph(m, y=float(i % 2), idx=i, smiles=smi)
        assert g is not None
        graphs.append(g)
    spec = chiro_spec_for_graphs(graphs, batch_size=4)
    return batch_chiro(graphs, spec)


def _strip(mask, *arrays):
    m = np.asarray(mask)
    n = int(m.sum())
    assert m[:n].all(), "real rows must be a prefix"
    return [np.asarray(a)[:n] for a in arrays]


@pytest.mark.parametrize("c_norm", ["sigmoid", "softmax"])
def test_internal_coordinate_encoder_matches_reference(
    ref_alpha, chiro_batch, c_norm
):
    """alpha_encoder.py:135-258 on the same random node embeddings and the
    same internal-coordinate index arrays: compare the pooled latent z AND
    the per-local-structure z_alpha. Covers both c-normalization branches
    (sigmoid = main-path default, softmax = scatter_softmax path)."""
    from molkgnn_tpu.models.chironet import InternalCoordinateEncoder

    batch = chiro_batch
    rng = np.random.default_rng(11)
    h_full = rng.standard_normal(
        (batch.x.shape[0], F_H)
    ).astype(np.float32)

    module = InternalCoordinateEncoder(
        f_z=F_Z,
        f_h=F_H,
        hidden_d=HID["d"],
        hidden_phi=HID["phi"],
        hidden_c=HID["c"],
        hidden_shift=HID["shift"],
        hidden_alpha=HID["alpha"],
        c_normalization=c_norm,
        reduction="sum",
    )
    variables = module.init(jax.random.key(1), jnp.asarray(h_full), batch)
    got_z, got_z_alpha = module.apply(
        variables, jnp.asarray(h_full), batch
    )

    act = {}
    for enc in ("D", "phi", "c", "sinusoidal_shift", "alpha"):
        act[f"encoder_hidden_activation_{enc}"] = torch.nn.LeakyReLU(0.01)
        act[f"encoder_output_activation_{enc}"] = torch.nn.Identity()
    ref = ref_alpha.InternalCoordinateEncoder(
        F_z_list=list(F_Z),
        F_H=F_H,
        hidden_sizes_D=list(HID["d"]),
        hidden_sizes_phi=list(HID["phi"]),
        hidden_sizes_c=list(HID["c"]),
        hidden_sizes_sinusoidal_shift=list(HID["shift"]),
        hidden_sizes_alpha=list(HID["alpha"]),
        activation_dict=act,
        biases=True,
        dropout=0.0,
        c_coefficient_normalization=c_norm,
        reduction="sum",
    )
    params = variables["params"]
    for ref_name, our_name in [
        ("Encoder_D", "Encoder_D"),
        ("Encoder_phi", "Encoder_phi"),
        ("Encoder_c", "Encoder_c"),
        ("Encoder_sinusoidal_shift", "Encoder_sinusoidal_shift"),
        ("Encoder_alpha", "Encoder_alpha"),
    ]:
        ref_mlp = getattr(ref, ref_name)
        for k, lin in enumerate(ref_mlp.linear_layers):
            _copy_linear(lin, params[our_name][f"lin{k}"])
    ref.eval()

    node_mask = np.asarray(batch.node_mask)
    n_real = int(node_mask.sum())
    (di, dj, dists) = _strip(
        batch.dist_mask, batch.dist_i, batch.dist_j, batch.distances
    )
    (ai, aj, ak, angs) = _strip(
        batch.ang_mask, batch.ang_i, batch.ang_j, batch.ang_k, batch.angles
    )
    (si, sj, sk, sl, dihs, ls) = _strip(
        batch.dih_mask,
        batch.dih_i,
        batch.dih_j,
        batch.dih_k,
        batch.dih_l,
        batch.dihedrals,
        batch.ls_map,
    )
    (ax, ay) = _strip(batch.alpha_mask, batch.alpha_x, batch.alpha_y)
    n_alpha = len(ax)
    long = lambda a: torch.tensor(a, dtype=torch.long)

    want = ref(
        H_embeddings=_t(h_full[:n_real]),
        distances=_t(dists),
        distance_indices=torch.stack([long(di), long(dj)]),
        phis=_t(angs),
        phi_indices=torch.stack([long(ai), long(aj), long(ak)]),
        psis=_t(dihs),
        psi_indices=torch.stack(
            [long(si), long(sj), long(sk), long(sl)]
        ),
        node_map=torch.tensor(
            np.asarray(batch.node_graph_id)[:n_real], dtype=torch.long
        ),
        LS_map=long(ls),
        alpha_indices=torch.stack([long(ax), long(ay)]),
    )
    want_z = want[0].detach().numpy()
    want_z_alpha = want[2].detach().numpy()

    got_z = np.asarray(got_z)
    assert got_z.shape == want_z.shape == (4, sum(F_Z))
    np.testing.assert_allclose(got_z, want_z, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got_z_alpha)[:n_alpha],
        want_z_alpha,
        rtol=2e-4,
        atol=1e-5,
    )


# ------------------------------------------------------------- SphereNet


@pytest.fixture(scope="module")
def ref_spherenet():
    # numpy 2 removed the ``np.math`` alias the reference's spherical-
    # harmonic prefactor uses (spherenet.py:177); restore it so the
    # reference code runs unmodified.
    if not hasattr(np, "math"):
        import math as _math

        np.math = _math
    return _load_ref(
        "/root/reference/models/ChIRoNet/gnn_3D/spherenet.py", "ref_spherenet"
    )


def test_spherenet_basis_embeddings_match_reference(ref_spherenet):
    """The symbolic Bessel / real-spherical-harmonic embeddings
    (spherenet.py:272-345, sympy-codegen) vs ops/basis.py on random
    dist/angle/torsion — covers the m != 0 torsion harmonics and the
    reference's no-envelope quirk on the angle/torsion radial parts."""
    from molkgnn_tpu.models.spherenet import _angle_emb, _torsion_emb
    from molkgnn_tpu.ops.basis import bessel_rbf

    n_sph, n_rad, cutoff = 4, 5, 5.0
    rng = np.random.default_rng(21)
    E, T = 14, 30
    # Physical interatomic distances (>= ~0.9 A): the sympy Bessel forms
    # have 1/x^l terms that are catastrophically ill-conditioned in fp32 as
    # x -> 0 on BOTH sides (unreachable for real conformers).
    dist = rng.uniform(0.9, 0.98 * cutoff, E).astype(np.float32)
    angle = (rng.random(T) * np.pi).astype(np.float32)
    phi = (rng.random(T) * 2 * np.pi).astype(np.float32)
    idx_kj = rng.integers(0, E, size=T).astype(np.int32)

    ref = ref_spherenet.emb(n_sph, n_rad, cutoff, envelope_exponent=5)
    want_rbf, want_sbf, want_tbf = ref(
        _t(dist), _t(angle), _t(phi), torch.tensor(idx_kj, dtype=torch.long)
    )

    freq = jnp.arange(1, n_rad + 1, dtype=jnp.float32) * jnp.pi
    got_rbf = np.asarray(bessel_rbf(jnp.asarray(dist), freq, cutoff, 5))
    got_sbf = np.asarray(
        _angle_emb(jnp.asarray(dist)[idx_kj], jnp.asarray(angle), n_sph, n_rad, cutoff)
    )
    got_tbf = np.asarray(
        _torsion_emb(
            jnp.asarray(dist)[idx_kj], jnp.asarray(angle), jnp.asarray(phi),
            n_sph, n_rad, cutoff,
        )
    )
    np.testing.assert_allclose(got_rbf, want_rbf.detach().numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got_sbf, want_sbf.detach().numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got_tbf, want_tbf.detach().numpy(), rtol=1e-5, atol=1e-6)


def _spherenet_geometry(batch):
    """Strip padding and mirror the in-model geometry of models/spherenet.py
    (dist / angle / min-torsion with the documented |sin|-snap) in numpy, to
    feed the reference network the same values our network computes. The
    radius/triplet/quad index construction itself is oracle-tested in
    test_geometric_models.py; this parity test targets the NETWORK blocks."""
    em = np.asarray(batch.edge_mask)
    e_real = int(em.sum())
    tm = np.asarray(batch.tri_mask)
    t_real = int(tm.sum())
    qm = np.asarray(batch.quad_mask)
    q_real = int(qm.sum())
    assert em[:e_real].all() and tm[:t_real].all() and qm[:q_real].all()
    pos = np.asarray(batch.pos)

    j = np.asarray(batch.edge_src)[:e_real]
    i = np.asarray(batch.edge_dst)[:e_real]
    dist = np.linalg.norm(pos[i] - pos[j], axis=-1).astype(np.float32)

    idx_kj = np.asarray(batch.tri_edge_kj)[:t_real]
    idx_ji = np.asarray(batch.tri_edge_ji)[:t_real]
    t_k = np.asarray(batch.tri_k)[:t_real]
    t_j, t_i = j[idx_ji], i[idx_ji]
    v_ji = pos[t_i] - pos[t_j]
    v_jk = pos[t_k] - pos[t_j]
    a = np.sum(v_ji * v_jk, axis=-1)
    b = np.linalg.norm(np.cross(v_ji, v_jk), axis=-1)
    angle = np.arctan2(b, a).astype(np.float32)

    q_t = np.asarray(batch.quad_t)[:q_real]
    q_kn = np.asarray(batch.quad_kn)[:q_real]
    qj = t_j[q_t]
    p_j0 = pos[t_k[q_t]] - pos[qj]
    p_ji = pos[t_i[q_t]] - pos[qj]
    p_jk = pos[q_kn] - pos[qj]
    dist_ji = np.linalg.norm(p_ji, axis=-1)
    plane1 = np.cross(p_ji, p_j0)
    plane2 = np.cross(p_ji, p_jk)
    ta = np.sum(plane1 * plane2, axis=-1)
    tb = np.sum(np.cross(plane1, plane2) * p_ji, axis=-1) / np.maximum(
        dist_ji, 1e-9
    )
    hyp = np.sqrt(ta * ta + tb * tb)
    tb = np.where((np.abs(tb) < 1e-4 * hyp) & (ta > 0), 0.0, tb)
    torsion1 = np.arctan2(tb, ta)
    torsion1 = np.where(torsion1 <= 0, torsion1 + 2 * np.pi, torsion1)
    torsion = np.full(t_real, np.inf, np.float64)
    np.minimum.at(torsion, q_t, torsion1)
    torsion = np.where(np.isfinite(torsion), torsion, 0.0).astype(np.float32)
    return dist, angle, torsion, i, j, idx_kj, idx_ji


def test_spherenet_forward_matches_reference(ref_spherenet, capsys):
    """Full SphereNet (init_e, init_v, update_e/v/u for every layer,
    spherenet.py:411-675) vs models/spherenet.py, same injected weights and
    shared geometry. Two reference quirks handled explicitly: xyz_to_dat
    needs torch_sparse (patched to return the shared geometry), and the
    local copy passes the *string* 'swish' as update_v's act (a latent
    reference bug — its standalone path would crash; we restore the
    obviously-intended SiLU on each update_v instance)."""
    from molkgnn_tpu.data.dataset import make_synthetic_dataset
    from molkgnn_tpu.graphs.geometric import batch_points, point_spec_for_graphs
    from molkgnn_tpu.models.spherenet import SphereNet

    cfg = dict(
        cutoff=4.0,
        num_layers=2,
        hidden_channels=16,
        out_channels=4,
        int_emb_size=8,
        basis_emb_size_dist=4,
        basis_emb_size_angle=4,
        basis_emb_size_torsion=4,
        out_emb_channels=12,
        num_spherical=3,
        num_radial=4,
        num_before_skip=1,
        num_after_skip=1,
        num_output_layers=2,
    )
    ds = make_synthetic_dataset(seed=7, num_graphs=8)
    spec = point_spec_for_graphs(
        ds.graphs, batch_size=4, cutoff=cfg["cutoff"], with_torsion=True
    )
    batch = batch_points(ds.graphs[:4], spec)

    model = SphereNet(**cfg)
    params = model.init(jax.random.key(2), batch)["params"]
    got = np.asarray(model.apply({"params": params}, batch))

    ref = ref_spherenet.SphereNet(
        cutoff=cfg["cutoff"],
        num_layers=cfg["num_layers"],
        hidden_channels=cfg["hidden_channels"],
        out_channels=cfg["out_channels"],
        int_emb_size=cfg["int_emb_size"],
        basis_emb_size_dist=cfg["basis_emb_size_dist"],
        basis_emb_size_angle=cfg["basis_emb_size_angle"],
        basis_emb_size_torsion=cfg["basis_emb_size_torsion"],
        out_emb_channels=cfg["out_emb_channels"],
        num_spherical=cfg["num_spherical"],
        num_radial=cfg["num_radial"],
        num_before_skip=cfg["num_before_skip"],
        num_after_skip=cfg["num_after_skip"],
        num_output_layers=cfg["num_output_layers"],
    )
    for uv in [ref.init_v, *ref.update_vs]:
        uv.act = torch.nn.SiLU()  # the reference stores the string 'swish'
    ref.eval()

    def _copy_update_v(ref_v, p):
        _copy_linear(ref_v.lin_up, p["lin_up"])
        for k, lin in enumerate(ref_v.lins):
            _copy_linear(lin, p[f"lin{k}"])
        _copy_linear(ref_v.lin, p["lin"])

    def _copy_residual(ref_r, p):
        _copy_linear(ref_r.lin1, p["lin1"])
        _copy_linear(ref_r.lin2, p["lin2"])

    with torch.no_grad():
        ref.emb.dist_emb.freq.copy_(_t(params["rbf_freq"]))
        ref.init_e.emb.weight.copy_(_t(params["init_e"]["emb"]))
    _copy_linear(ref.init_e.lin_rbf_0, params["init_e"]["lin_rbf_0"])
    _copy_linear(ref.init_e.lin, params["init_e"]["lin"])
    _copy_linear(ref.init_e.lin_rbf_1, params["init_e"]["lin_rbf_1"])
    _copy_update_v(ref.init_v, params["init_v"])
    for layer in range(cfg["num_layers"]):
        pe = params[f"update_e{layer}"]
        re_ = ref.update_es[layer]
        for name in (
            "lin_ji", "lin_kj", "lin_rbf1", "lin_rbf2", "lin_sbf1",
            "lin_sbf2", "lin_t1", "lin_t2", "lin_down", "lin_up",
            "lin", "lin_rbf",
        ):
            _copy_linear(getattr(re_, name), pe[name])
        for k in range(cfg["num_before_skip"]):
            _copy_residual(re_.layers_before_skip[k], pe[f"before_skip{k}"])
        for k in range(cfg["num_after_skip"]):
            _copy_residual(re_.layers_after_skip[k], pe[f"after_skip{k}"])
        _copy_update_v(ref.update_vs[layer], params[f"update_v{layer}"])

    dist, angle, torsion, i, j, idx_kj, idx_ji = _spherenet_geometry(batch)
    geom = (
        _t(dist),
        _t(angle),
        _t(torsion),
        torch.tensor(i, dtype=torch.long),
        torch.tensor(j, dtype=torch.long),
        torch.tensor(idx_kj, dtype=torch.long),
        torch.tensor(idx_ji, dtype=torch.long),
    )
    ref_spherenet.xyz_to_dat = lambda *a, **kw: geom

    node_mask = np.asarray(batch.node_mask)
    n_real = int(node_mask.sum())
    want = ref(
        z=torch.tensor(np.asarray(batch.z)[:n_real], dtype=torch.long),
        pos=_t(np.asarray(batch.pos)[:n_real]),
        batch=torch.tensor(
            np.asarray(batch.node_graph_id)[:n_real], dtype=torch.long
        ),
    ).detach().numpy()
    capsys.readouterr()  # swallow the reference's debug prints

    assert got.shape == want.shape == (4, cfg["out_channels"])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=2e-5)


# ------------------------------------------------------------- DimeNet++


@pytest.fixture(scope="module")
def ref_dimenet():
    return _load_ref(
        "/root/reference/models/ChIRoNet/gnn_3D/dimenet_pp.py", "ref_dimenet"
    )


def test_dimenetpp_interaction_block_matches_reference(ref_dimenet):
    """InteractionPPBlock (dimenet_pp.py:60-150): rbf/sbf basis projections,
    triplet down/up projection, residual stacks around the skip — random
    edge states and basis inputs, injected weights."""
    from molkgnn_tpu.models.dimenetpp import InteractionPPBlock

    h, int_emb, basis_emb, n_rad, n_sph = 16, 8, 4, 5, 3
    nbs, nas = 1, 2
    E, T = 20, 40
    rng = np.random.default_rng(33)
    x = rng.standard_normal((E, h)).astype(np.float32)
    rbf = rng.standard_normal((E, n_rad)).astype(np.float32)
    sbf = rng.standard_normal((T, n_sph * n_rad)).astype(np.float32)
    idx_kj = rng.integers(0, E, T).astype(np.int32)
    idx_ji = rng.integers(0, E, T).astype(np.int32)

    ours = InteractionPPBlock(
        hidden_channels=h, int_emb_size=int_emb, basis_emb_size=basis_emb,
        num_before_skip=nbs, num_after_skip=nas,
    )
    variables = ours.init(
        jax.random.key(3), jnp.asarray(x), jnp.asarray(rbf), jnp.asarray(sbf),
        jnp.asarray(idx_kj), jnp.asarray(idx_ji), np.ones(T, bool),
    )
    got = np.asarray(
        ours.apply(
            variables, jnp.asarray(x), jnp.asarray(rbf), jnp.asarray(sbf),
            jnp.asarray(idx_kj), jnp.asarray(idx_ji), np.ones(T, bool),
        )
    )

    ref = ref_dimenet.InteractionPPBlock(
        hidden_channels=h, int_emb_size=int_emb, basis_emb_size=basis_emb,
        num_spherical=n_sph, num_radial=n_rad,
        num_before_skip=nbs, num_after_skip=nas,
    )
    p = variables["params"]
    for name in (
        "lin_ji", "lin_kj", "lin_rbf1", "lin_rbf2", "lin_sbf1", "lin_sbf2",
        "lin_down", "lin_up", "lin",
    ):
        _copy_linear(getattr(ref, name), p[name])
    for k in range(nbs):
        _copy_linear(ref.layers_before_skip[k].lin1, p[f"before_skip{k}"]["lin1"])
        _copy_linear(ref.layers_before_skip[k].lin2, p[f"before_skip{k}"]["lin2"])
    for k in range(nas):
        _copy_linear(ref.layers_after_skip[k].lin1, p[f"after_skip{k}"]["lin1"])
        _copy_linear(ref.layers_after_skip[k].lin2, p[f"after_skip{k}"]["lin2"])
    ref.eval()
    want = ref(
        _t(x), _t(rbf), _t(sbf),
        torch.tensor(idx_kj, dtype=torch.long),
        torch.tensor(idx_ji, dtype=torch.long),
    ).detach().numpy()
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_dimenetpp_output_block_matches_reference(ref_dimenet):
    """OutputPPBlock (dimenet_pp.py:153-190): rbf gate, edge->node scatter,
    up-projection + output MLP. The reference never calls its
    reset_parameters (dimenet_pp.py:176 commented out), so torch-default
    Linear inits apply — mirrored by our TorchLinear layers."""
    from molkgnn_tpu.models.dimenetpp import OutputPPBlock

    h, out_emb, out_ch, n_rad, n_lay = 16, 12, 4, 5, 2
    E, N = 20, 9
    rng = np.random.default_rng(34)
    x = rng.standard_normal((E, h)).astype(np.float32)
    rbf = rng.standard_normal((E, n_rad)).astype(np.float32)
    i = rng.integers(0, N, E).astype(np.int32)

    ours = OutputPPBlock(
        hidden_channels=h, out_emb_channels=out_emb, out_channels=out_ch,
        num_layers=n_lay,
    )
    variables = ours.init(
        jax.random.key(4), jnp.asarray(x), jnp.asarray(rbf), jnp.asarray(i),
        N, np.ones(E, bool),
    )
    got = np.asarray(
        ours.apply(
            variables, jnp.asarray(x), jnp.asarray(rbf), jnp.asarray(i), N,
            np.ones(E, bool),
        )
    )

    ref = ref_dimenet.OutputPPBlock(
        num_radial=n_rad, hidden_channels=h, out_emb_channels=out_emb,
        out_channels=out_ch, num_layers=n_lay,
    )
    p = variables["params"]
    _copy_linear(ref.lin_rbf, p["lin_rbf"])
    _copy_linear(ref.lin_up, p["lin_up"])
    for k in range(n_lay):
        _copy_linear(ref.lins[k], p[f"lin{k}"])
    _copy_linear(ref.lin, p["lin"])
    ref.eval()
    want = ref(
        _t(x), _t(rbf), torch.tensor(i, dtype=torch.long), num_nodes=N
    ).detach().numpy()
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_dimenetpp_forward_matches_reference(ref_dimenet):
    """END-TO-END DimeNet++ (VERDICT r2 item 4): the reference's own
    DimeNetPlusPlus.forward (dimenet_pp.py:192-369) — its own radius graph,
    its own SparseTensor-row-slicing triplet enumeration, atan2 angles,
    Bessel/spherical bases, embedding block, interaction blocks, and
    per-block output summation — vs models/dimenetpp.py with injected
    weights on shared synthetic conformers. The SparseTensor / basis-layer
    stubs implement only documented generic contracts (the symbolic basis
    codegen is the reference spherenet.py's own)."""
    from torch_geometric.data import Data  # noqa: F401 (stub sanity)

    from molkgnn_tpu.data.dataset import make_synthetic_dataset
    from molkgnn_tpu.graphs.geometric import batch_points, point_spec_for_graphs
    from molkgnn_tpu.models.dimenetpp import DimeNetPP

    cfg = dict(
        hidden_channels=16,
        out_channels=4,
        num_blocks=2,
        int_emb_size=8,
        basis_emb_size=4,
        out_emb_channels=12,
        num_spherical=3,
        num_radial=4,
        cutoff=4.0,
        envelope_exponent=5,
        num_before_skip=1,
        num_after_skip=1,
        num_output_layers=2,
    )
    ds = make_synthetic_dataset(seed=13, num_graphs=8)
    spec = point_spec_for_graphs(
        ds.graphs, batch_size=4, cutoff=cfg["cutoff"], with_triplets=True
    )
    batch = batch_points(ds.graphs[:4], spec)
    assert int(np.asarray(batch.tri_mask).sum()) > 0

    model = DimeNetPP(**cfg)
    params = model.init(jax.random.key(5), batch)["params"]
    got = np.asarray(model.apply({"params": params}, batch))

    ref = ref_dimenet.DimeNetPlusPlus(
        hidden_channels=cfg["hidden_channels"],
        out_channels=cfg["out_channels"],
        num_blocks=cfg["num_blocks"],
        int_emb_size=cfg["int_emb_size"],
        basis_emb_size=cfg["basis_emb_size"],
        out_emb_channels=cfg["out_emb_channels"],
        num_spherical=cfg["num_spherical"],
        num_radial=cfg["num_radial"],
        cutoff=cfg["cutoff"],
        envelope_exponent=cfg["envelope_exponent"],
        num_before_skip=cfg["num_before_skip"],
        num_after_skip=cfg["num_after_skip"],
        num_output_layers=cfg["num_output_layers"],
    )
    with torch.no_grad():
        ref.rbf.freq.copy_(_t(params["rbf_freq"]))
        ref.emb.emb.weight.copy_(_t(params["emb"]))
    _copy_linear(ref.emb.lin_rbf, params["emb_lin_rbf"])
    _copy_linear(ref.emb.lin, params["emb_lin"])
    for blk in range(cfg["num_blocks"] + 1):
        po = params[f"output{blk}"]
        ro = ref.output_blocks[blk]
        _copy_linear(ro.lin_rbf, po["lin_rbf"])
        _copy_linear(ro.lin_up, po["lin_up"])
        for k in range(cfg["num_output_layers"]):
            _copy_linear(ro.lins[k], po[f"lin{k}"])
        _copy_linear(ro.lin, po["lin"])
    for blk in range(cfg["num_blocks"]):
        pi = params[f"interaction{blk}"]
        ri = ref.interaction_blocks[blk]
        for name in (
            "lin_ji", "lin_kj", "lin_rbf1", "lin_rbf2", "lin_sbf1",
            "lin_sbf2", "lin_down", "lin_up", "lin",
        ):
            _copy_linear(getattr(ri, name), pi[name])
        for k in range(cfg["num_before_skip"]):
            _copy_linear(ri.layers_before_skip[k].lin1, pi[f"before_skip{k}"]["lin1"])
            _copy_linear(ri.layers_before_skip[k].lin2, pi[f"before_skip{k}"]["lin2"])
        for k in range(cfg["num_after_skip"]):
            _copy_linear(ri.layers_after_skip[k].lin1, pi[f"after_skip{k}"]["lin1"])
            _copy_linear(ri.layers_after_skip[k].lin2, pi[f"after_skip{k}"]["lin2"])
    ref.eval()

    node_mask = np.asarray(batch.node_mask)
    n_real = int(node_mask.sum())
    assert node_mask[:n_real].all(), "real nodes must be a prefix"
    want = ref(
        z=torch.tensor(np.asarray(batch.z)[:n_real], dtype=torch.long),
        pos=_t(np.asarray(batch.pos)[:n_real]),
        batch=torch.tensor(
            np.asarray(batch.node_graph_id)[:n_real], dtype=torch.long
        ),
    ).detach().numpy()

    assert got.shape == want.shape == (4, cfg["out_channels"])
    # Triplet/edge enumeration ORDERS differ (host precompute vs
    # SparseTensor slicing) — scatter-sum fp tolerance, not bitwise.
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=2e-5)


def test_dimenetpp_checkpoint_import_round_trip(ref_dimenet):
    """DimeNet++ family through the reference-checkpoint importer: train
    the reference's own DimeNetPlusPlus on torch-CPU (wrapped as
    model.py:73 wires it), import via from_torch_state_dict, match its
    eval logits (same enumeration-order tolerance as the forward-parity
    test — a mapping error would be O(1) wrong)."""
    from molkgnn_tpu.data.dataset import make_synthetic_dataset
    from molkgnn_tpu.graphs.geometric import (
        batch_points,
        point_spec_for_graphs,
    )
    from molkgnn_tpu.models.dimenetpp import DimeNetPP
    from molkgnn_tpu.training import GNNModel, from_torch_state_dict

    cfg = dict(
        hidden_channels=16, out_channels=4, num_blocks=2, int_emb_size=8,
        basis_emb_size=4, out_emb_channels=12, num_spherical=3,
        num_radial=4, cutoff=4.0, envelope_exponent=5, num_before_skip=1,
        num_after_skip=1, num_output_layers=2,
    )
    ds = make_synthetic_dataset(seed=13, num_graphs=8)
    spec = point_spec_for_graphs(
        ds.graphs, batch_size=4, cutoff=cfg["cutoff"], with_triplets=True
    )
    batch = batch_points(ds.graphs[:4], spec)
    node_mask = np.asarray(batch.node_mask)
    n_real = int(node_mask.sum())

    class RefGNNModel(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.gnn_model = ref_dimenet.DimeNetPlusPlus(**cfg)
            self.ffn = torch.nn.Linear(cfg["out_channels"], 1)

        def forward(self, z, pos, b):
            return self.ffn(self.gnn_model(z=z, pos=pos, batch=b))

    wrapper = RefGNNModel()
    z = torch.tensor(np.asarray(batch.z)[:n_real], dtype=torch.long)
    pos = _t(np.asarray(batch.pos)[:n_real])
    bvec = torch.tensor(
        np.asarray(batch.node_graph_id)[:n_real], dtype=torch.long
    )
    y = torch.tensor([0.0, 1.0, 0.0, 1.0])
    opt = torch.optim.AdamW(wrapper.parameters(), lr=1e-3)
    loss_fn = torch.nn.BCEWithLogitsLoss()
    wrapper.train()
    losses = []
    for _ in range(4):
        opt.zero_grad()
        loss = loss_fn(wrapper(z, pos, bvec)[:, 0], y)
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    assert losses[-1] < losses[0]
    wrapper.eval()
    with torch.no_grad():
        want = wrapper(z, pos, bvec).numpy()[:, 0]

    model = GNNModel(encoder=DimeNetPP(**cfg), ffn_dropout_rate=0.0)
    template = jax.device_get(model.init(jax.random.key(0), batch))
    imported = from_torch_state_dict(template, wrapper.state_dict())
    got, _emb = model.apply(imported, batch, train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=2e-5)


def test_spherenet_checkpoint_import_round_trip(ref_spherenet, capsys):
    """SphereNet family through the reference-checkpoint importer (same
    contract as the DimeNet++/SchNet round trips; the reference's
    parameterless update_u needs no mapping)."""
    from molkgnn_tpu.data.dataset import make_synthetic_dataset
    from molkgnn_tpu.graphs.geometric import (
        batch_points,
        point_spec_for_graphs,
    )
    from molkgnn_tpu.models.spherenet import SphereNet
    from molkgnn_tpu.training import GNNModel, from_torch_state_dict

    cfg = dict(
        cutoff=4.0, num_layers=2, hidden_channels=16, out_channels=4,
        int_emb_size=8, basis_emb_size_dist=4, basis_emb_size_angle=4,
        basis_emb_size_torsion=4, out_emb_channels=12, num_spherical=3,
        num_radial=4, num_before_skip=1, num_after_skip=1,
        num_output_layers=2,
    )
    ds = make_synthetic_dataset(seed=7, num_graphs=8)
    spec = point_spec_for_graphs(
        ds.graphs, batch_size=4, cutoff=cfg["cutoff"], with_torsion=True
    )
    batch = batch_points(ds.graphs[:4], spec)
    node_mask = np.asarray(batch.node_mask)
    n_real = int(node_mask.sum())

    dist, angle, torsion, i, j, idx_kj, idx_ji = _spherenet_geometry(batch)
    geom = (
        _t(dist), _t(angle), _t(torsion),
        torch.tensor(i, dtype=torch.long),
        torch.tensor(j, dtype=torch.long),
        torch.tensor(idx_kj, dtype=torch.long),
        torch.tensor(idx_ji, dtype=torch.long),
    )
    ref_spherenet.xyz_to_dat = lambda *a, **kw: geom

    class RefGNNModel(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.gnn_model = ref_spherenet.SphereNet(**cfg)
            for uv in [self.gnn_model.init_v, *self.gnn_model.update_vs]:
                uv.act = torch.nn.SiLU()  # reference stores the string
            self.ffn = torch.nn.Linear(cfg["out_channels"], 1)

        def forward(self, z, pos, b):
            return self.ffn(self.gnn_model(z=z, pos=pos, batch=b))

    wrapper = RefGNNModel()
    z = torch.tensor(np.asarray(batch.z)[:n_real], dtype=torch.long)
    pos = _t(np.asarray(batch.pos)[:n_real])
    bvec = torch.tensor(
        np.asarray(batch.node_graph_id)[:n_real], dtype=torch.long
    )
    y = torch.tensor([0.0, 1.0, 0.0, 1.0])
    opt = torch.optim.AdamW(wrapper.parameters(), lr=1e-3)
    loss_fn = torch.nn.BCEWithLogitsLoss()
    wrapper.train()
    losses = []
    for _ in range(4):
        opt.zero_grad()
        loss = loss_fn(wrapper(z, pos, bvec)[:, 0], y)
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    assert losses[-1] < losses[0]
    wrapper.eval()
    with torch.no_grad():
        want = wrapper(z, pos, bvec).numpy()[:, 0]
    capsys.readouterr()  # swallow the reference's debug prints

    model = GNNModel(encoder=SphereNet(**cfg), ffn_dropout_rate=0.0)
    template = jax.device_get(model.init(jax.random.key(0), batch))
    imported = from_torch_state_dict(template, wrapper.state_dict())
    got, _emb = model.apply(imported, batch, train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-4, atol=2e-5)


def test_chironet_checkpoint_import_round_trip(ref_alpha, chiro_batch):
    """ChIRoNet family through the reference-checkpoint importer — the
    fifth and last family: train the reference's own Encoder on torch-CPU
    (wrapped as ChIRoNet.py:21 + model.py:45 nest it: gnn_model.encoder),
    CMP on, import via from_torch_state_dict, match its eval logits on
    the pooled molecule embedding."""
    from molkgnn_tpu.models.chironet import ChIRoNet
    from molkgnn_tpu.training import GNNModel, from_torch_state_dict

    batch = chiro_batch
    f_in = int(np.asarray(batch.x).shape[-1])
    f_e = int(np.asarray(batch.edge_attr).shape[-1])
    F_HH, F_ECONV = 10, 12

    act = {
        "EConv_mlp_hidden_activation": torch.nn.LeakyReLU(0.01),
        "EConv_mlp_output_activation": torch.nn.Identity(),
    }
    for enc in ("D", "phi", "c", "sinusoidal_shift", "alpha"):
        act[f"encoder_hidden_activation_{enc}"] = torch.nn.LeakyReLU(0.01)
        act[f"encoder_output_activation_{enc}"] = torch.nn.Identity()
    layers = {
        "EConv_mlp_hidden_sizes": [8],
        "GAT_hidden_node_sizes": [12],
        "encoder_hidden_sizes_D": list(HID["d"]),
        "encoder_hidden_sizes_phi": list(HID["phi"]),
        "encoder_hidden_sizes_c": list(HID["c"]),
        "encoder_hidden_sizes_sinusoidal_shift": list(HID["shift"]),
        "encoder_hidden_sizes_alpha": list(HID["alpha"]),
        "output_mlp_hidden_sizes": [],
    }

    class _ChiroWrap(torch.nn.Module):
        """Reference ChIRoNet.py:15-43: holds the Encoder as
        ``self.encoder`` (the state_dict nesting the importer maps)."""

        def __init__(self):
            super().__init__()
            self.encoder = ref_alpha.Encoder(
                F_z_list=list(F_Z), F_H=F_HH, F_H_embed=f_in,
                F_E_embed=f_e, F_H_EConv=F_ECONV, layers_dict=layers,
                activation_dict=act, GAT_N_heads=2,
                chiral_message_passing=True,
                CMP_EConv_MLP_hidden_sizes=[8], CMP_GAT_N_layers=2,
                CMP_GAT_N_heads=1, c_coefficient_normalization="sigmoid",
                encoder_reduction="sum", output_concatenation_mode="none",
                EConv_bias=True, GAT_bias=True, encoder_biases=True,
                dropout=0.0,
            )

    class RefGNNModel(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.gnn_model = _ChiroWrap()
            self.ffn = torch.nn.Linear(F_HH, 1)

        def forward(self, data, ls, alpha_idx):
            out = self.gnn_model.encoder(
                data, LS_map=ls, alpha_indices=alpha_idx
            )
            return self.ffn(out[3])  # pooled molecule embedding

    node_mask = np.asarray(batch.node_mask)
    n_real = int(node_mask.sum())
    (esrc, edst, eattr) = _strip(
        batch.edge_mask, batch.edge_src, batch.edge_dst, batch.edge_attr
    )
    (di, dj, dists) = _strip(
        batch.dist_mask, batch.dist_i, batch.dist_j, batch.distances
    )
    (ai, aj, ak, angs) = _strip(
        batch.ang_mask, batch.ang_i, batch.ang_j, batch.ang_k, batch.angles
    )
    (si, sj, sk, sl, dihs, ls) = _strip(
        batch.dih_mask, batch.dih_i, batch.dih_j, batch.dih_k, batch.dih_l,
        batch.dihedrals, batch.ls_map,
    )
    (ax, ay) = _strip(batch.alpha_mask, batch.alpha_x, batch.alpha_y)
    long = lambda a: torch.tensor(np.asarray(a), dtype=torch.long)

    class _Data:
        pass

    data = _Data()
    data.x = _t(np.asarray(batch.x)[:n_real])
    data.edge_index = torch.stack([long(esrc), long(edst)])
    data.edge_attr = _t(eattr)
    data.bond_distances = _t(dists)
    data.bond_distance_index = torch.stack([long(di), long(dj)])
    data.bond_angles = _t(angs)
    data.bond_angle_index = torch.stack([long(ai), long(aj), long(ak)])
    data.dihedral_angles = _t(dihs)
    data.dihedral_angle_index = torch.stack(
        [long(si), long(sj), long(sk), long(sl)]
    )
    data.batch = long(np.asarray(batch.node_graph_id)[:n_real])
    ls_t = long(ls)
    alpha_t = torch.stack([long(ax), long(ay)])

    wrapper = RefGNNModel()
    y = torch.tensor([0.0, 1.0, 0.0, 1.0])
    opt = torch.optim.AdamW(wrapper.parameters(), lr=1e-3)
    loss_fn = torch.nn.BCEWithLogitsLoss()
    wrapper.train()
    losses = []
    for _ in range(4):
        opt.zero_grad()
        loss = loss_fn(wrapper(data, ls_t, alpha_t)[:, 0], y)
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    assert losses[-1] < losses[0]
    wrapper.eval()
    with torch.no_grad():
        want = wrapper(data, ls_t, alpha_t).numpy()[:, 0]

    model = GNNModel(
        encoder=ChIRoNet(
            f_z=F_Z, f_h=F_HH, f_h_econv=F_ECONV, econv_mlp_hidden=(8,),
            gat_hidden=(12,), gat_heads=2, hidden_d=HID["d"],
            hidden_phi=HID["phi"], hidden_c=HID["c"],
            hidden_shift=HID["shift"], hidden_alpha=HID["alpha"],
            c_normalization="sigmoid", reduction="sum",
            chiral_message_passing=True, cmp_econv_hidden=(8,),
            cmp_gat_layers=2, cmp_gat_heads=1, output_mode="molecule",
        ),
        ffn_dropout_rate=0.0,
    )
    template = jax.device_get(model.init(jax.random.key(0), batch))
    imported = from_torch_state_dict(template, wrapper.state_dict())
    got, _emb = model.apply(imported, batch, train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


# --------------------------------- ChIRo losses / local-structure grouping


@pytest.fixture(scope="module")
def ref_chiro_fns():
    """train_functions.py + optimization_functions.py as a package (the
    relative import needs a parent package module)."""
    _ensure_stubs()
    pkg = types.ModuleType("ref_chiro")
    pkg.__path__ = ["/root/reference/models/ChIRoNet"]
    sys.modules["ref_chiro"] = pkg
    mods = {}
    for sub in ("optimization_functions", "train_functions"):
        spec = importlib.util.spec_from_file_location(
            f"ref_chiro.{sub}", f"/root/reference/models/ChIRoNet/{sub}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"ref_chiro.{sub}"] = mod
        spec.loader.exec_module(mod)
        mods[sub] = mod
    return mods


def test_local_structure_map_matches_reference(ref_chiro_fns):
    """get_local_structure_map (train_functions.py:22-37) vs
    chem/chiro_features.py::local_structure_map on random dihedral indices
    with repeated central bonds (first-appearance group numbering)."""
    from molkgnn_tpu.chem.chiro_features import local_structure_map

    tf = ref_chiro_fns["train_functions"]
    rng = np.random.default_rng(55)
    # 30 dihedrals over 6 distinct central bonds, shuffled.
    bonds = rng.integers(0, 12, size=(6, 2))
    rows = []
    for _ in range(30):
        b = bonds[rng.integers(0, 6)]
        rows.append([rng.integers(0, 12), b[0], b[1], rng.integers(0, 12)])
    idx = np.array(rows, np.int64)

    want_ls, want_alpha = tf.get_local_structure_map(
        torch.tensor(idx.T, dtype=torch.long)
    )
    got_ls, got_alpha = local_structure_map(idx)
    np.testing.assert_array_equal(got_ls, want_ls.numpy())
    np.testing.assert_array_equal(got_alpha, want_alpha.numpy())


@pytest.mark.parametrize(
    "metric", ["euclidean", "euclidean_normalized", "manhattan", "cosine"]
)
def test_triplet_loss_matches_reference(ref_chiro_fns, metric):
    """tripletLoss (optimization_functions.py:15-45) vs
    training/contrastive.py::triplet_loss, all 4 distance metrics."""
    from molkgnn_tpu.training.contrastive import triplet_loss

    of = ref_chiro_fns["optimization_functions"]
    rng = np.random.default_rng(56)
    a, p, n = (
        rng.standard_normal((12, 8)).astype(np.float32) for _ in range(3)
    )
    for margin in (0.5, 1.0):
        want = of.tripletLoss(
            _t(a), _t(p), _t(n), margin=margin, distance_metric=metric
        ).item()
        got = float(
            triplet_loss(
                jnp.asarray(a), jnp.asarray(p), jnp.asarray(n),
                margin=margin, distance_metric=metric,
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


# -------------------------- MolKGNN full model (BN + MolGCN + readout)


@pytest.fixture(scope="module")
def ref_molkgnn_pkg():
    """kernels.py + KernelLayer.py + MolKGNNNet.py as a package (relative
    imports). MessagePassing is stubbed to its generic contract: gather
    ``*_j`` message args at edge_index[0], scatter-add at edge_index[1]."""
    _ensure_stubs()
    tg_nn = sys.modules["torch_geometric.nn"]
    if not hasattr(tg_nn, "MessagePassing"):
        import inspect

        class MessagePassing(torch.nn.Module):
            def __init__(self, aggr="add"):
                super().__init__()
                assert aggr == "add"

            def propagate(self, edge_index, **kwargs):
                src, dst = edge_index[0], edge_index[1]
                msg_kwargs, dim_size = {}, None
                for name in inspect.signature(self.message).parameters:
                    assert name.endswith("_j")
                    base = kwargs[name[:-2]]
                    dim_size = base.size(0)
                    msg_kwargs[name] = base[src]
                out = self.message(**msg_kwargs)
                res = torch.zeros(
                    (dim_size,) + out.shape[1:], dtype=out.dtype
                )
                return res.index_add(0, dst, out)

        tg_nn.MessagePassing = MessagePassing

    pkg = types.ModuleType("ref_molkgnn")
    pkg.__path__ = ["/root/reference/models/MolKGNN"]
    sys.modules["ref_molkgnn"] = pkg
    mods = {}
    for sub in ("kernels", "KernelLayer", "MolKGNNNet"):
        spec = importlib.util.spec_from_file_location(
            f"ref_molkgnn.{sub}", f"/root/reference/models/MolKGNN/{sub}.py"
        )
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"ref_molkgnn.{sub}"] = mod
        spec.loader.exec_module(mod)
        mods[sub] = mod
    return mods


def _tie_free_molecule(rng):
    """Caterpillar tree, max one leaf child per node: spine s0..s_{m-1};
    interior spine nodes optionally gain one leaf and/or one pendant
    2-chain (internal child + its own single leaf) => degrees 1-4.
    Tie-free by construction: no node has two neighbors with identical
    neighbor sets, the generic source of bitwise-equal aggregated
    features that make permutation-argmax order arbitrary (fp-tie
    caveat, CLAUDE.md)."""
    from molkgnn_tpu.graphs.molgraph import MolGraph

    edges = []
    m = int(rng.integers(5, 7))
    nodes = m
    for u in range(m - 1):
        edges.append((u, u + 1))
    for si in range(2, m - 2):
        kind = int(rng.integers(0, 3))
        if kind >= 1:  # one leaf child
            edges.append((si, nodes))
            nodes += 1
        if kind == 2:  # plus one pendant chain: deg-4 spine node
            t, u = nodes, nodes + 1
            edges.append((si, t))
            edges.append((t, u))
            nodes += 2
    ei, ea = [], []
    for u, v in edges:
        attr = rng.standard_normal(7).astype(np.float32)
        ei += [(u, v), (v, u)]
        ea += [attr, attr]
    return MolGraph(
        x=rng.standard_normal((nodes, 28)).astype(np.float32),
        p=rng.standard_normal((nodes, 3)).astype(np.float32),
        edge_index=np.array(ei, np.int32).T,
        edge_attr=np.array(ea, np.float32),
        y=0.0,
        atomic_num=rng.integers(1, 10, size=nodes).astype(np.int32),
    ).with_fields()


def _ref_data_kwargs(batch):
    """Feed kwargs for the reference MolKGNNNet forward from our packed
    batch: float64 views of the REAL rows only, plus the per-degree
    receptive-field tensors its MolGCN expects (KernelLayer.py:64-106)."""
    node_mask = np.asarray(batch.node_mask)
    n_real = int(node_mask.sum())
    assert node_mask[:n_real].all()
    emask = np.asarray(batch.edge_mask)
    e_real = int(emask.sum())
    assert emask[:e_real].all()
    long = lambda a: torch.tensor(np.asarray(a), dtype=torch.long)
    td = lambda a: torch.tensor(np.asarray(a, np.float64))

    kw = dict(
        x=td(np.asarray(batch.x)[:n_real]),
        p=td(np.asarray(batch.p)[:n_real]),
        edge_index=torch.stack(
            [long(batch.edge_src[:e_real]), long(batch.edge_dst[:e_real])]
        ),
        edge_attr=td(np.asarray(batch.edge_attr)[:e_real]),
        batch=long(np.asarray(batch.node_graph_id)[:n_real]),
    )
    total_bucket_rows = 0
    for d, b in enumerate(batch.buckets(), start=1):
        mask = np.asarray(b.mask)
        focal = np.asarray(b.focal_index)[mask]
        nei = np.asarray(b.nei_index)[mask]
        total_bucket_rows += len(focal)
        kw[f"p_focal_deg{d}"] = td(np.asarray(batch.p)[focal])
        kw[f"nei_p_deg{d}"] = td(np.asarray(batch.p)[nei])
        kw[f"nei_edge_attr_deg{d}"] = td(np.asarray(b.nei_edge_attr)[mask])
        kw[f"selected_index_deg{d}"] = long(focal)
        kw[f"nei_index_deg{d}"] = long(nei.reshape(-1))
    # Reference's column-reorder assumes every real node sits in exactly
    # one degree bucket (degree 1..4).
    assert total_bucket_rows == n_real
    return kw


def test_molkgnn_full_model_matches_reference(ref_molkgnn_pkg):
    """End-to-end MolKGNNNet (eval): node BatchNorm (randomized running
    stats + affine), 2 chained KernelSetConv layers with sum message
    passing (deg-4 chirality on the last layer), per-node MLP readout and
    global add pool — vs the reference's MolKGNNNet/MolGCN on the same
    packed batch with injected parameters.

    Tie control (the fp-tie caveat, CLAUDE.md): two LEAF siblings of the
    same center aggregate bitwise-identical features at layer >= 1, making
    permutation scores tie at ulp level; which permutation the argmax then
    gathers is summation-order-arbitrary *in the reference itself*. The
    test therefore (a) uses tree molecules in which no node has two leaf
    children (all degrees 1-4 still present, _tie_free_molecule), and
    (b) runs both sides in float64 so the remaining near-ties resolve
    identically."""
    from torch_geometric.data import Data  # the stub

    from molkgnn_tpu.graphs import spec_for_graphs
    from molkgnn_tpu.graphs.batch import batch_graphs
    from molkgnn_tpu.models.kgnn import MolKGNNNet

    rng0 = np.random.default_rng(61)
    graphs = [_tie_free_molecule(rng0) for _ in range(4)]
    spec = spec_for_graphs(graphs, batch_size=4)
    batch = batch_graphs(graphs, spec)
    degs_present = {
        d
        for d, b in enumerate(batch.buckets(), start=1)
        if np.asarray(b.mask).any()
    }
    assert degs_present == {1, 2, 3, 4}, degs_present
    # Tie-freeness: no node has two neighbors with identical neighbor SETS
    # (the only generic source of bitwise-equal aggregated features).
    for g in graphs:
        nbrs = {}
        src, dst = g.edge_index
        for a, b_ in zip(src.tolist(), dst.tolist()):
            nbrs.setdefault(b_, set()).add(a)
        for v, vn in nbrs.items():
            sets = [frozenset(nbrs[u]) for u in vn]
            assert len(sets) == len(set(sets)), f"tied siblings at node {v}"

    counts_1hop, counts_nhop, emb_dim = (2, 3, 4, 5), (3, 4, 2, 5), 8
    model = MolKGNNNet(
        num_layers=2,
        kernels_1hop=counts_1hop,
        kernels_nhop=counts_nhop,
        graph_embedding_dim=emb_dim,
        drop_ratio=0.0,
    )
    variables = jax.device_get(model.init(jax.random.key(5), batch))

    # Randomize every parameter and the BN running stats so no term can
    # hide behind a default (BN weight=1/bias=0, equal score weights, ...).
    rng = np.random.default_rng(99)
    rand = lambda leaf: (
        rng.standard_normal(np.shape(leaf)).astype(np.float64) * 0.5
    )
    variables["params"] = jax.tree.map(rand, variables["params"])
    variables["batch_stats"] = {
        k: {
            "mean": rng.standard_normal(v["mean"].shape),
            "var": rng.uniform(0.5, 1.5, v["var"].shape),
        }
        for k, v in variables["batch_stats"].items()
    }

    to64 = lambda a: (
        np.asarray(a, np.float64)
        if np.issubdtype(np.asarray(a).dtype, np.floating)
        else np.asarray(a)
    )
    batch64 = jax.tree.map(to64, batch)
    jax.config.update("jax_enable_x64", True)
    try:
        got = np.asarray(model.apply(variables, batch64, train=False))
        assert got.dtype == np.float64
    finally:
        jax.config.update("jax_enable_x64", False)

    # The reference creates intermediates with torch.zeros/FloatTensor at
    # default dtype (kernels.py score assembly) — run its whole side at a
    # float64 default so they match the injected double params.
    prev_default = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    ref_net_mod = ref_molkgnn_pkg["MolKGNNNet"]
    ref = ref_net_mod.MolKGNNNet(
        num_layers=2,
        num_kernel1_1hop=counts_1hop[0], num_kernel2_1hop=counts_1hop[1],
        num_kernel3_1hop=counts_1hop[2], num_kernel4_1hop=counts_1hop[3],
        num_kernel1_Nhop=counts_nhop[0], num_kernel2_Nhop=counts_nhop[1],
        num_kernel3_Nhop=counts_nhop[2], num_kernel4_Nhop=counts_nhop[3],
        x_dim=28, p_dim=3, edge_attr_dim=7,
        drop_ratio=0.0, graph_embedding_dim=emb_dim,
    )
    ref.double()
    p = variables["params"]
    s = variables["batch_stats"]
    with torch.no_grad():
        for bn_name in ("node_batch_norm", "edge_batch_norm"):
            bn = getattr(ref, bn_name)
            bn.weight.copy_(_t(p[bn_name]["weight"]))
            bn.bias.copy_(_t(p[bn_name]["bias"]))
            bn.running_mean.copy_(_t(s[bn_name]["mean"]))
            bn.running_var.copy_(_t(s[bn_name]["var"]))
        for i in range(2):
            for d in range(1, 5):
                conv = ref.gnn.layers[i].trainable_kernelconv_set[d - 1]
                ours = p["gnn"][f"layer{i}"][f"kernelconv{d}"]
                for name in (
                    "x_center", "x_support", "edge_attr_support",
                    "p_support", "support_attr_sc_weight",
                    "center_attr_sc_weight", "edge_attr_support_sc_weight",
                    "length_sc_weight", "angle_sc_weight",
                ):
                    getattr(conv, name).copy_(_t(ours[name]))
        _copy_linear(ref.graph_embedding_lin1, p["graph_embedding_lin1"])
        _copy_linear(ref.graph_embedding_lin2, p["graph_embedding_lin2"])
    ref.eval()

    kw = _ref_data_kwargs(batch)

    try:
        want = ref(Data(**kw)).detach().numpy()
    finally:
        torch.set_default_dtype(prev_default)
    assert got.shape == want.shape == (4, emb_dim)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-10)


def test_reference_checkpoint_import_round_trip(ref_molkgnn_pkg, tmp_path):
    """Reference-checkpoint importer round trip (the deployment path for
    already-trained reference models, entry.py:134-162 best-ckpt loading):
    TRAIN the reference's own MolKGNNNet on torch-CPU — wrapped exactly as
    model.py::GNNModel wires it (self.gnn_model + dropout + self.ffn,
    model.py:128-171) so the state_dict keys are the real checkpoint
    keys — for several AdamW steps, import the state_dict with
    training.checkpoint.from_torch_state_dict, and require our forward to
    reproduce its eval logits at fp64 precision (trained BN running stats
    and all). Then AOT-export the imported weights and score an SDF
    through the `molkgnn-screen` CLI: a reference user's trained model
    ports straight into this framework's serving path."""
    import os
    import subprocess

    from torch_geometric.data import Data  # the stub

    from molkgnn_tpu.graphs import spec_for_graphs
    from molkgnn_tpu.graphs.batch import batch_graphs
    from molkgnn_tpu.models.kgnn import MolKGNNNet
    from molkgnn_tpu.training import GNNModel, from_torch_state_dict

    rng0 = np.random.default_rng(17)
    graphs = [_tie_free_molecule(rng0) for _ in range(4)]
    spec = spec_for_graphs(graphs, batch_size=4)
    batch = batch_graphs(graphs, spec)

    counts_1hop, counts_nhop, emb_dim = (2, 3, 4, 5), (3, 4, 2, 5), 8
    prev_default = torch.get_default_dtype()
    torch.set_default_dtype(torch.float64)
    try:
        ref_net_mod = ref_molkgnn_pkg["MolKGNNNet"]

        class RefGNNModel(torch.nn.Module):
            """model.py::GNNModel's trained surface: gnn_model + ffn
            (lin1/lin2 exist there but are dead in forward — the importer
            ignores them, so omitting them here keeps the leftovers check
            honest for the live keys)."""

            def __init__(self):
                super().__init__()
                self.gnn_model = ref_net_mod.MolKGNNNet(
                    num_layers=2,
                    num_kernel1_1hop=counts_1hop[0],
                    num_kernel2_1hop=counts_1hop[1],
                    num_kernel3_1hop=counts_1hop[2],
                    num_kernel4_1hop=counts_1hop[3],
                    num_kernel1_Nhop=counts_nhop[0],
                    num_kernel2_Nhop=counts_nhop[1],
                    num_kernel3_Nhop=counts_nhop[2],
                    num_kernel4_Nhop=counts_nhop[3],
                    x_dim=28, p_dim=3, edge_attr_dim=7,
                    drop_ratio=0.0, graph_embedding_dim=emb_dim,
                )
                self.ffn = torch.nn.Linear(emb_dim, 1)

            def forward(self, data):
                return self.ffn(self.gnn_model(data))

        wrapper = RefGNNModel().double()
        kw = _ref_data_kwargs(batch)
        y = torch.tensor([0.0, 1.0, 0.0, 1.0], dtype=torch.float64)
        opt = torch.optim.AdamW(wrapper.parameters(), lr=1e-3)
        loss_fn = torch.nn.BCEWithLogitsLoss()
        wrapper.train()
        losses = []
        for _ in range(5):
            opt.zero_grad()
            loss = loss_fn(wrapper(Data(**kw))[:, 0], y)
            loss.backward()
            opt.step()
            losses.append(float(loss.detach()))
        assert losses[-1] < losses[0]  # it actually trained
        wrapper.eval()
        want = wrapper(Data(**kw)).detach().numpy()[:, 0]
        sd = wrapper.state_dict()
    finally:
        torch.set_default_dtype(prev_default)

    model = GNNModel(
        encoder=MolKGNNNet(
            num_layers=2,
            kernels_1hop=counts_1hop,
            kernels_nhop=counts_nhop,
            graph_embedding_dim=emb_dim,
            drop_ratio=0.0,
        ),
        ffn_dropout_rate=0.0,
    )
    template = jax.device_get(model.init(jax.random.key(0), batch))
    # fp64 template -> the importer keeps the checkpoint's full precision
    # for the fp64 comparison (production imports use the fp32 template).
    as64 = lambda a: (
        np.asarray(a, np.float64)
        if np.issubdtype(np.asarray(a).dtype, np.floating)
        else np.asarray(a)
    )
    imported = from_torch_state_dict(jax.tree.map(as64, template), sd)

    to64 = lambda a: (
        np.asarray(a, np.float64)
        if np.issubdtype(np.asarray(a).dtype, np.floating)
        else np.asarray(a)
    )
    batch64 = jax.tree.map(to64, batch)
    jax.config.update("jax_enable_x64", True)
    try:
        got, _emb = model.apply(imported, batch64, train=False)
        got = np.asarray(got)
    finally:
        jax.config.update("jax_enable_x64", False)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-10)

    # Imported weights -> serving: AOT export + molkgnn-screen on an SDF.
    from molkgnn_tpu.chem.embed import embed_molecule
    from molkgnn_tpu.chem.features import mol_to_graph
    from molkgnn_tpu.chem.sdf import write_sdf
    from molkgnn_tpu.chem.smiles import parse_smiles
    from molkgnn_tpu.serving.predictor import Predictor

    def mk(smi, i):
        m = parse_smiles(smi, add_hs=True)
        pos = embed_molecule(m, seed=i, iterations=40)
        for k, a in enumerate(m.atoms):
            a.x, a.y, a.z = map(float, pos[k])
        return m

    mols = [mk(s, i) for i, s in enumerate(["CCO", "CCN", "CCC"])]
    mol_graphs = [mol_to_graph(m, y=0.0, idx=i) for i, m in enumerate(mols)]
    screen_spec = spec_for_graphs(mol_graphs, batch_size=4)
    f32 = lambda a: np.asarray(a, np.float32) if np.issubdtype(
        np.asarray(a).dtype, np.floating
    ) else np.asarray(a)
    pred = Predictor(
        model,
        jax.tree.map(f32, imported["params"]),
        jax.tree.map(f32, imported["batch_stats"]),
        screen_spec,
    )
    art = tmp_path / "imported.mkx"
    pred.export(str(art))
    sdf = tmp_path / "lib.sdf"
    write_sdf(str(sdf), mols)
    out = tmp_path / "scores.csv"
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "molkgnn_tpu.cli.screen",
         "--exported", str(art), "--sdf", str(sdf), "--out", str(out)],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = out.read_text().strip().splitlines()
    assert lines[0] == "record_index,score"
    scores = [float(ln.split(",")[1]) for ln in lines[1:]]
    assert len(scores) == 3 and all(np.isfinite(scores))

    # Same port via the one-step CLI chain: torch.save -> molkgnn-import
    # -> molkgnn-screen. Scores must match the in-process export's.
    ckpt = tmp_path / "ref_state_dict.pt"
    torch.save({"state_dict": sd}, str(ckpt))
    art2 = tmp_path / "imported_cli.mkx"
    r = subprocess.run(
        [sys.executable, "-m", "molkgnn_tpu.cli.import_ckpt",
         "--torch_ckpt", str(ckpt), "--sdf", str(sdf),
         "--out", str(art2), "--batch_size", "4",
         "--num_layers", "2",
         "--num_kernel1_1hop", "2", "--num_kernel2_1hop", "3",
         "--num_kernel3_1hop", "4", "--num_kernel4_1hop", "5",
         "--num_kernel1_Nhop", "3", "--num_kernel2_Nhop", "4",
         "--num_kernel3_Nhop", "2", "--num_kernel4_Nhop", "5",
         "--hidden_dim", str(emb_dim)],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    out2 = tmp_path / "scores_cli.csv"
    r = subprocess.run(
        [sys.executable, "-m", "molkgnn_tpu.cli.screen",
         "--exported", str(art2), "--sdf", str(sdf), "--out", str(out2)],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    scores2 = [
        float(ln.split(",")[1])
        for ln in out2.read_text().strip().splitlines()[1:]
    ]
    np.testing.assert_allclose(scores2, scores, rtol=1e-5, atol=1e-6)


# ------------------------------------------- ChIRoNet full Encoder forward


@pytest.mark.parametrize("cmp_on", [False, True])
def test_chironet_encoder_forward_matches_reference(
    ref_alpha, chiro_batch, cmp_on
):
    """END-TO-END ChIRoNet Encoder (VERDICT r2 item 5): the reference's own
    Encoder.forward (alpha_encoder.py:261-368) — GraphNodeEmbedder =
    NNConv(edge-MLP) + GAT stack (alpha_encoder.py:40-87), the
    InternalCoordinateEncoder, and (parametrized) ChiralMessagePassing
    (alpha_encoder.py:89-133) — vs models/chironet.py::ChIRoNet with
    injected weights on real embedded molecules. Compares BOTH outputs the
    main paths consume: mol_embedding (ChIRoNet.py:54) and the pooled
    internal-coordinate latent. The NNConv/GATConv stubs implement only
    PyG's documented contracts (edge-conditioned conv with root weight;
    per-target attention softmax with self-loops, head-mean)."""
    from molkgnn_tpu.models.chironet import ChIRoNet

    batch = chiro_batch
    f_in = int(np.asarray(batch.x).shape[-1])
    f_e = int(np.asarray(batch.edge_attr).shape[-1])
    F_HH, F_ECONV = 10, 12

    model = ChIRoNet(
        f_z=F_Z,
        f_h=F_HH,
        f_h_econv=F_ECONV,
        econv_mlp_hidden=(8,),
        gat_hidden=(12,),
        gat_heads=2,
        hidden_d=HID["d"],
        hidden_phi=HID["phi"],
        hidden_c=HID["c"],
        hidden_shift=HID["shift"],
        hidden_alpha=HID["alpha"],
        c_normalization="sigmoid",
        reduction="sum",
        chiral_message_passing=cmp_on,
        cmp_econv_hidden=(8,),
        cmp_gat_layers=2,
        cmp_gat_heads=1,
        output_mode="both",
    )
    variables = model.init(jax.random.key(7), batch)
    got = np.asarray(model.apply(variables, batch))
    got_mol, got_latent = got[:, :F_HH], got[:, F_HH:]

    act = {
        "EConv_mlp_hidden_activation": torch.nn.LeakyReLU(0.01),
        "EConv_mlp_output_activation": torch.nn.Identity(),
    }
    for enc in ("D", "phi", "c", "sinusoidal_shift", "alpha"):
        act[f"encoder_hidden_activation_{enc}"] = torch.nn.LeakyReLU(0.01)
        act[f"encoder_output_activation_{enc}"] = torch.nn.Identity()
    layers = {
        "EConv_mlp_hidden_sizes": [8],
        "GAT_hidden_node_sizes": [12],
        "encoder_hidden_sizes_D": list(HID["d"]),
        "encoder_hidden_sizes_phi": list(HID["phi"]),
        "encoder_hidden_sizes_c": list(HID["c"]),
        "encoder_hidden_sizes_sinusoidal_shift": list(HID["shift"]),
        "encoder_hidden_sizes_alpha": list(HID["alpha"]),
        "output_mlp_hidden_sizes": [],
    }
    ref = ref_alpha.Encoder(
        F_z_list=list(F_Z),
        F_H=F_HH,
        F_H_embed=f_in,
        F_E_embed=f_e,
        F_H_EConv=F_ECONV,
        layers_dict=layers,
        activation_dict=act,
        GAT_N_heads=2,
        chiral_message_passing=cmp_on,
        CMP_EConv_MLP_hidden_sizes=[8],
        CMP_GAT_N_layers=2,
        CMP_GAT_N_heads=1,
        c_coefficient_normalization="sigmoid",
        encoder_reduction="sum",
        output_concatenation_mode="none",
        EConv_bias=True,
        GAT_bias=True,
        encoder_biases=True,
        dropout=0.0,
    )
    p = variables["params"]

    def copy_nnconv(ref_conv, pc):
        for k, lin in enumerate(ref_conv.nn.linear_layers):
            _copy_linear(lin, pc["nn"][f"lin{k}"])
        with torch.no_grad():
            ref_conv.lin.weight.copy_(_t(pc["root"]).T)
            ref_conv.bias.copy_(_t(pc["bias"]))

    def copy_gat(ref_gat, pg):
        with torch.no_grad():
            ref_gat.lin.weight.copy_(_t(pg["lin"]).T)
            ref_gat.att_src.copy_(_t(pg["att_src"]))
            ref_gat.att_dst.copy_(_t(pg["att_dst"]))
            ref_gat.bias.copy_(_t(pg["bias"]))

    copy_nnconv(ref.Graph_Embedder.EConv, p["EConv"])
    for gi in range(2):  # gat_hidden (12,) + final F_H layer
        copy_gat(ref.Graph_Embedder.GAT_layers[gi], p[f"GAT{gi}"])
    for name in (
        "Encoder_D", "Encoder_phi", "Encoder_c",
        "Encoder_sinusoidal_shift", "Encoder_alpha",
    ):
        ref_mlp = getattr(ref.InternalCoordinateEncoder, name)
        for k, lin in enumerate(ref_mlp.linear_layers):
            _copy_linear(lin, p["InternalCoordinateEncoder"][name][f"lin{k}"])
    if cmp_on:
        copy_nnconv(ref.ChiralMessagePassingEncoder.ChiralEConv, p["ChiralEConv"])
        for gi in range(2):
            copy_gat(
                ref.ChiralMessagePassingEncoder.ChiralGATLayers[gi],
                p[f"ChiralGAT{gi}"],
            )
    ref.eval()

    node_mask = np.asarray(batch.node_mask)
    n_real = int(node_mask.sum())
    assert node_mask[:n_real].all()
    (esrc, edst, eattr) = _strip(
        batch.edge_mask, batch.edge_src, batch.edge_dst, batch.edge_attr
    )
    (di, dj, dists) = _strip(
        batch.dist_mask, batch.dist_i, batch.dist_j, batch.distances
    )
    (ai, aj, ak, angs) = _strip(
        batch.ang_mask, batch.ang_i, batch.ang_j, batch.ang_k, batch.angles
    )
    (si, sj, sk, sl, dihs, ls) = _strip(
        batch.dih_mask, batch.dih_i, batch.dih_j, batch.dih_k, batch.dih_l,
        batch.dihedrals, batch.ls_map,
    )
    (ax, ay) = _strip(batch.alpha_mask, batch.alpha_x, batch.alpha_y)
    long = lambda a: torch.tensor(np.asarray(a), dtype=torch.long)

    class _Data:
        pass

    data = _Data()
    data.x = _t(np.asarray(batch.x)[:n_real])
    data.edge_index = torch.stack([long(esrc), long(edst)])
    data.edge_attr = _t(eattr)
    data.bond_distances = _t(dists)
    data.bond_distance_index = torch.stack([long(di), long(dj)])
    data.bond_angles = _t(angs)
    data.bond_angle_index = torch.stack([long(ai), long(aj), long(ak)])
    data.dihedral_angles = _t(dihs)
    data.dihedral_angle_index = torch.stack(
        [long(si), long(sj), long(sk), long(sl)]
    )
    data.batch = long(np.asarray(batch.node_graph_id)[:n_real])

    out = ref(
        data,
        LS_map=long(ls),
        alpha_indices=torch.stack([long(ax), long(ay)]),
    )
    want_latent = out[0].detach().numpy()
    want_mol = out[3].detach().numpy()

    assert got_mol.shape == want_mol.shape == (4, F_HH)
    assert got_latent.shape == want_latent.shape == (4, sum(F_Z))
    np.testing.assert_allclose(got_mol, want_mol, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(got_latent, want_latent, rtol=2e-4, atol=2e-5)
