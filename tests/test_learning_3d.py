"""Learning-quality tests for the 3D baselines (VERDICT r1 item 7).

Round 1 proved SchNet/DimeNet++/ChIRoNet compile, are invariant, and match
spec oracles — but only kgnn was shown to *learn*. Here each baseline is
trained through the real Trainer on a task labeled by exactly the geometric
signal that family is built to encode:

  * SchNet: label = whether the molecule's sub-cutoff contact count exceeds
    the dataset median — a function of the pairwise-distance set, the only
    geometry SchNet sees (radius graph + Gaussian RBFs; reference
    schnet.py:85-160).
  * DimeNet++: label = whether the mean cosine of radius-graph angles
    exceeds the median — angle information enters only through the
    spherical-basis triplet path (reference dimenet_pp.py:304-346).
  * ChIRoNet: butane conformers, stretched (x1.15) vs normal geometry —
    bond lengths feed Encoder_D directly (alpha_encoder.py:176-190), the
    only geometric channel that can carry this label since node/edge
    features are identical. A NEGATIVE test documents why an anti-vs-
    gauche dihedral task is NOT learnable by ChIRo's design: every
    dihedral of the central bond shifts by the same delta under bond
    rotation, and the torsion encoder's pooled output is the phase-vector
    MAGNITUDE |sum c_q e^{i(psi+delta_q+phi_q)}| (alpha_encoder.py:
    221-258), which is invariant to a common shift — verified as an
    exact invariance of our implementation.
"""

import numpy as np
import pytest

from molkgnn_tpu.chem.embed import embed_molecule
from molkgnn_tpu.chem.smiles import parse_smiles
from molkgnn_tpu.data.dataset import Dataset, QSAR_METRICS
from molkgnn_tpu.data.synthetic import random_molgraph
from molkgnn_tpu.graphs.chiro import mol_to_chiro_graph
from molkgnn_tpu.graphs.geometric import radius_edges
from molkgnn_tpu.models.registry import get_family
from molkgnn_tpu.training import GNNModel, TrainConfig, Trainer


def _dataset(name, graphs, n_train):
    n = len(graphs)
    return Dataset(
        name=name,
        graphs=graphs,
        split={
            "train": np.arange(n_train),
            "valid": np.arange(n_train, n),
            "test": np.arange(n_train, n),
        },
        metrics=list(QSAR_METRICS),
        loss_name="bce_with_logits",
    )


def _fit_auc(gnn_type, graphs, n_train, encoder_kw, spec_kw, cfg_kw):
    import tempfile

    fam = get_family(gnn_type)
    ds = _dataset(f"learn3d-{gnn_type}", graphs, n_train)
    spec = fam.make_spec(graphs, batch_size=cfg_kw["batch_size"], **spec_kw)
    model = GNNModel(encoder=fam.make_encoder(**encoder_kw), ffn_dropout_rate=0.0)
    cfg = TrainConfig(
        oversample=False, progress=False, warmup_iterations=10,
        log_dir=tempfile.mkdtemp(prefix="learn3d_"),  # not the repo's logs/
        **cfg_kw,
    )
    trainer = Trainer(model, ds, spec, cfg, collate=fam.collate)
    trainer.fit()
    return max(h["AUC"] for h in trainer.history)


def test_schnet_learns_contact_count():
    rng = np.random.default_rng(3)
    cutoff = 3.0
    raw = [random_molgraph(rng, num_atoms=14) for _ in range(240)]
    counts = np.array(
        [radius_edges(g.p, cutoff).shape[1] for g in raw], float
    )
    lo, hi = np.percentile(counts, [40, 60])
    graphs = []
    for g, c in zip(raw, counts):
        if lo <= c <= hi:
            continue  # drop the boundary band so the rule is clean
        g.y = float(c > hi)
        graphs.append(g)
    assert len(graphs) >= 144, len(graphs)
    graphs = graphs[:144]

    auc = _fit_auc(
        "schnet",
        graphs,
        n_train=112,
        encoder_kw=dict(
            cutoff=cutoff, num_layers=2, hidden_channels=32,
            num_filters=32, out_channels=16,
        ),
        spec_kw=dict(cutoff=cutoff),
        cfg_kw=dict(
            batch_size=16, max_epochs=25, peak_lr=3e-3, weight_decay=0.0
        ),
    )
    assert auc > 0.85, f"SchNet did not learn contact count: best AUC {auc}"


def test_dimenetpp_learns_mean_angle():
    rng = np.random.default_rng(4)
    cutoff = 3.0
    raw = [random_molgraph(rng, num_atoms=12) for _ in range(300)]

    def mean_angle_cos(g):
        e = radius_edges(g.p, cutoff)  # [2, E] directed (j, i)
        by_center = {}
        for j, i in e.T:
            by_center.setdefault(int(i), []).append(int(j))
        cosines = []
        for i, nbrs in by_center.items():
            for a in range(len(nbrs)):
                for b in range(a + 1, len(nbrs)):
                    v1 = g.p[nbrs[a]] - g.p[i]
                    v2 = g.p[nbrs[b]] - g.p[i]
                    denom = np.linalg.norm(v1) * np.linalg.norm(v2)
                    if denom > 1e-9:
                        cosines.append(float(np.dot(v1, v2) / denom))
        return np.mean(cosines) if cosines else np.nan

    vals = np.array([mean_angle_cos(g) for g in raw])
    keep = np.isfinite(vals)
    raw = [g for g, k in zip(raw, keep) if k]
    vals = vals[keep]
    lo, hi = np.percentile(vals, [40, 60])
    graphs = []
    for g, v in zip(raw, vals):
        if lo <= v <= hi:
            continue
        g.y = float(v > hi)
        graphs.append(g)
    assert len(graphs) >= 144, len(graphs)
    graphs = graphs[:144]

    auc = _fit_auc(
        "dimenet_pp",
        graphs,
        n_train=112,
        encoder_kw=dict(
            hidden_channels=32, out_channels=16, num_blocks=2,
            int_emb_size=16, basis_emb_size=8, out_emb_channels=32,
            num_spherical=4, num_radial=4, cutoff=cutoff,
            num_output_layers=1,
        ),
        spec_kw=dict(cutoff=cutoff),
        cfg_kw=dict(
            batch_size=16, max_epochs=25, peak_lr=2e-3, weight_decay=0.0
        ),
    )
    assert auc > 0.8, f"DimeNet++ did not learn mean angle: best AUC {auc}"


def test_spherenet_learns_enantiomer_handedness():
    """SphereNet learning-quality test (VERDICT r2 item 6), built on the
    torsion machinery only SphereNet has among the 3DGN trio
    (spherenet.py:49-118): class 1 is the MIRROR IMAGE of a fixed template
    conformer (z negated), class 0 the template, both position-jittered.
    Mirroring preserves every pairwise distance and every angle exactly, so
    the Gaussian/Bessel distance channel and the spherical-harmonic angle
    channel carry zero class signal by construction — only the torsion
    dihedrals (whose m != 0 harmonics see phi -> 2*pi - phi under mirror)
    can separate the classes."""
    rng = np.random.default_rng(6)
    cutoff = 3.0
    template = random_molgraph(rng, num_atoms=10)
    # Controlled-ness: the mirror preserves distances exactly.
    p64 = template.p.astype(np.float64)
    mirrored = p64 * np.array([1.0, 1.0, -1.0])
    d0 = np.linalg.norm(p64[:, None] - p64[None], axis=-1)
    d1 = np.linalg.norm(mirrored[:, None] - mirrored[None], axis=-1)
    np.testing.assert_allclose(d0, d1, atol=1e-12)

    graphs = []
    for idx in range(160):
        y = idx % 2
        base = mirrored if y else p64
        g = random_molgraph(rng, num_atoms=10)  # fresh arrays/features
        g.x = template.x.copy()
        g.edge_index = template.edge_index.copy()
        g.edge_attr = template.edge_attr.copy()
        g.atomic_num = template.atomic_num.copy()
        g.p = (base + rng.normal(0, 0.02, base.shape)).astype(np.float32)
        g.y = float(y)
        if hasattr(g, "_geom_cache"):
            del g._geom_cache
        graphs.append(g)

    auc = _fit_auc(
        "spherenet",
        graphs,
        n_train=128,
        encoder_kw=dict(
            cutoff=cutoff, num_layers=2, hidden_channels=32,
            out_channels=16, int_emb_size=16, basis_emb_size_dist=8,
            basis_emb_size_angle=8, basis_emb_size_torsion=8,
            out_emb_channels=32, num_spherical=3, num_radial=4,
            num_before_skip=1, num_after_skip=1, num_output_layers=1,
        ),
        spec_kw=dict(cutoff=cutoff),
        cfg_kw=dict(
            batch_size=16, max_epochs=25, peak_lr=2e-3, weight_decay=0.0
        ),
    )
    assert auc > 0.8, f"SphereNet did not learn handedness: best AUC {auc}"


# ---------------------------------------------------------------- ChIRoNet


def _dihedral(p0, p1, p2, p3):
    b1, b2, b3 = p1 - p0, p2 - p1, p3 - p2
    n1 = np.cross(b1, b2)
    n2 = np.cross(b2, b3)
    return float(
        np.arctan2(
            np.linalg.norm(b2) * np.dot(b1, n2), np.dot(n1, n2)
        )
    )


def _side_atoms(mol, a, b):
    """Atoms reachable from ``b`` with the a-b bond removed."""
    seen = {a, b}
    stack = [b]
    side = {b}
    while stack:
        u = stack.pop()
        for v, _ in mol.neighbors(u):
            if v == a and u == b:
                continue
            if v not in seen:
                seen.add(v)
                side.add(v)
                stack.append(v)
    return side


def _set_dihedral(mol, pos, quad, target):
    """Rotate the atoms on the far side of the (quad[1], quad[2]) bond so
    the quad dihedral equals ``target``."""
    i, j, k, l = quad
    current = _dihedral(pos[i], pos[j], pos[k], pos[l])
    axis = pos[k] - pos[j]
    axis = axis / np.linalg.norm(axis)
    side = sorted(_side_atoms(mol, j, k) - {j})

    def rotate(delta):
        c, s = np.cos(delta), np.sin(delta)
        out = pos.copy()
        for a in side:
            v = pos[a] - pos[k]
            out[a] = (
                pos[k]
                + v * c
                + np.cross(axis, v) * s
                + axis * np.dot(axis, v) * (1 - c)
            )
        return out

    delta = target - current
    rotated = rotate(delta)
    if abs(
        _wrap(_dihedral(rotated[i], rotated[j], rotated[k], rotated[l]) - target)
    ) > 1e-3:
        rotated = rotate(-delta)
    got = _dihedral(rotated[i], rotated[j], rotated[k], rotated[l])
    assert abs(_wrap(got - target)) < 1e-3, (got, target)
    return rotated


def _wrap(a):
    return (a + np.pi) % (2 * np.pi) - np.pi


def _butane(rng, idx, stretched=False, twist=None):
    mol = parse_smiles("CCCC", add_hs=True)
    pos = embed_molecule(mol, seed=idx, iterations=60).astype(np.float64)
    if twist is not None:
        cur = _dihedral(pos[0], pos[1], pos[2], pos[3])
        pos = _set_dihedral(mol, pos, (0, 1, 2, 3), _wrap(cur + twist))
    if stretched:
        pos = pos * 1.15
    for a_idx, atom in enumerate(mol.atoms):
        atom.x, atom.y, atom.z = map(float, pos[a_idx])
    g = mol_to_chiro_graph(
        mol, y=float(stretched), idx=idx, smiles="CCCC"
    )
    assert g is not None
    return g


def test_chironet_learns_bond_stretch():
    """ChIRoNet trains end-to-end through the internal-coordinate encoder:
    stretched vs normal butane differs ONLY in bond distances (features
    identical across all molecules), which enter through Encoder_D. Uses
    output_mode='both' — the reference's own conformer-task configuration
    (ChIRo standalone harness, output_concatenation_mode='both')."""
    rng = np.random.default_rng(5)
    graphs = [_butane(rng, i, stretched=bool(i % 2)) for i in range(96)]
    auc = _fit_auc(
        "chironet",
        graphs,
        n_train=72,
        encoder_kw=dict(
            f_h=16, f_h_econv=16, econv_mlp_hidden=(8,), gat_hidden=(16,),
            gat_heads=2, hidden_d=(16,), hidden_phi=(8,), hidden_c=(8,),
            hidden_shift=(8,), hidden_alpha=(8,), f_z=(8, 8, 8),
            output_mode="both",
        ),
        spec_kw={},
        cfg_kw=dict(
            batch_size=16, max_epochs=30, peak_lr=3e-3, weight_decay=0.0
        ),
    )
    assert auc > 0.85, f"ChIRoNet did not learn bond stretch: best AUC {auc}"


def test_chironet_torsion_radius_invariant_to_bond_rotation():
    """Faithfulness check of a subtle ChIRo property: rotating a bond
    shifts every dihedral in its local structure by the same delta, and
    the torsion channel pools |sum c_q e^{i(psi_q + phi_q)}| — invariant
    to a common shift. So the encoder output (with identical features and
    unchanged distances/angles) must be EXACTLY unchanged, which is why a
    gauche-vs-anti label is unlearnable for this architecture (in the
    reference exactly as here)."""
    import jax

    from molkgnn_tpu.models.registry import get_family

    rng = np.random.default_rng(9)
    g0 = _butane(rng, 0)
    g1 = _butane(rng, 0, twist=np.deg2rad(97.0))  # same base conformer
    np.testing.assert_allclose(g0.distances, g1.distances, atol=1e-6)
    np.testing.assert_allclose(g0.angles, g1.angles, atol=1e-6)
    assert np.abs(g0.dihedrals - g1.dihedrals).max() > 1.0  # inputs DO differ

    fam = get_family("chironet")
    spec = fam.make_spec([g0, g1], batch_size=2)
    batch = fam.collate([g0, g1], spec)
    enc = fam.make_encoder(
        f_h=16, f_h_econv=16, econv_mlp_hidden=(8,), gat_hidden=(16,),
        gat_heads=2, hidden_d=(8,), hidden_phi=(8,), hidden_c=(8,),
        hidden_shift=(8,), hidden_alpha=(8,), f_z=(8, 8, 8),
        output_mode="both",
    )
    variables = enc.init(jax.random.key(0), batch)
    out = np.asarray(enc.apply(variables, batch))
    np.testing.assert_allclose(out[0], out[1], rtol=1e-5, atol=1e-5)


def test_schnet_device_resident_devsample_and_scan(tmp_path):
    """The 3D families ride the device-resident pipeline since r4
    (graphs/device_points): a SchNet fit with device_sampling + scan
    fusion consumes ZERO per-step host input, keeps the host sampler's
    optimizer-step budget, stays deterministic per seed, and still learns
    the contact-count rule (quality unchanged through the on-device
    assembly — gather_points is bit-identical to the host packer,
    tests/test_graphs.py)."""
    rng = np.random.default_rng(3)
    cutoff = 3.0
    raw = [random_molgraph(rng, num_atoms=14) for _ in range(240)]
    counts = np.array(
        [radius_edges(g.p, cutoff).shape[1] for g in raw], float
    )
    lo, hi = np.percentile(counts, [40, 60])
    graphs = []
    for g, c in zip(raw, counts):
        if lo <= c <= hi:
            continue
        g.y = float(c > hi)
        graphs.append(g)
    graphs = graphs[:144]
    fam = get_family("schnet")
    ds = _dataset("schnet-devsample", graphs, 112)
    spec = fam.make_spec(graphs, batch_size=16, cutoff=cutoff)
    model = GNNModel(
        encoder=fam.make_encoder(
            cutoff=cutoff, num_layers=2, hidden_channels=32,
            num_filters=32, out_channels=16,
        ),
        ffn_dropout_rate=0.0,
    )

    def run(sub):
        cfg = TrainConfig(
            batch_size=16, max_epochs=15, peak_lr=3e-3, weight_decay=0.0,
            oversample=True, device_sampling=True, scan_steps=3,
            warmup_iterations=10, progress=False,
            log_dir=str(tmp_path / sub),
        )
        t = Trainer(model, ds, spec, cfg, collate=fam.collate)
        assert t._device_data is not None, "3D device path not taken"
        from molkgnn_tpu.graphs.device_points import DevicePointDataset

        assert isinstance(t._device_data, DevicePointDataset)
        t.fit()
        return t

    t1 = run("a")
    steps_per_epoch = -(-112 // 16)
    assert int(np.asarray(t1.state.step)) == 15 * steps_per_epoch
    assert max(h["AUC"] for h in t1.history) > 0.85
    # Determinism per seed across fresh trainers.
    t2 = run("b")
    import jax

    for a, b in zip(
        jax.tree.leaves(t1.state.params), jax.tree.leaves(t2.state.params)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
