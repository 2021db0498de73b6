"""Checkpoint persistence: orbax when available, flax msgpack fallback.

Replaces PL ModelCheckpoint file handling (reference entry.py:187-237,
model.py:404-434). Checkpoints store {step, params, batch_stats}; optimizer
state is intentionally excluded to match the reference's eval-time-only
checkpoints (no mid-epoch resume in the contract; full-state resume is a
framework extension hook).
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np

try:  # orbax is the idiomatic JAX checkpointer
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def save_checkpoint(path: str, payload: Any) -> None:
    payload = jax.tree.map(np.asarray, payload)
    if _HAVE_ORBAX:
        path = os.path.abspath(path)
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, payload, force=True)
    else:
        from flax import serialization

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path + ".msgpack", "wb") as f:
            f.write(serialization.to_bytes(payload))


def _np(t) -> np.ndarray:
    """Array-ify a torch tensor / numpy array without importing torch."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


# Reference GNNModel members that exist but are dead in its forward
# (model.py:147-149 constructs lin1/lin2 alongside ffn; only ffn is applied
# at model.py:170. graph_embedding_linear is constructed at
# MolKGNNNet.py:20-25 and never called). num_batches_tracked is torch BN
# bookkeeping our MaskedBatchNorm does not carry.
_IGNORED_TORCH_KEYS = (
    "lin1.", "lin2.", "gnn_model.graph_embedding_linear.",
    # SchNet's Gaussian-basis offset is a constant buffer derived from
    # (cutoff, num_gaussians) — our emb recomputes it (models/schnet.py).
    "gnn_model.dist_emb.offset",
)


def from_torch_state_dict(variables: Any, state_dict: Any, prefix: str = ""):
    """Import a trained reference checkpoint into our GNNModel variables.

    ``state_dict`` is the reference GNNModel's (the PL LightningModule
    wrapping an encoder, /root/reference/model.py:45-149 +
    entry.py:134-162 best-ckpt loading) torch ``state_dict()`` — str keys
    to tensors/arrays. ``variables`` is our template from
    ``GNNModel.init`` ({'params', 'batch_stats'}); the import is
    template-driven, so every target leaf must find its source key (else
    KeyError) with a matching shape (else ValueError). ALL FIVE encoder
    families import (dispatched from the template's structure): kgnn
    (MolKGNNNet — the reference's core model), SchNet, DimeNet++,
    SphereNet, and ChIRoNet.

    Layout translation:
      * Linear layers: torch stores weight [out, in]; our TorchLinear
        kernel is [in, out] -> transpose. (ffn head, graph_embedding_lin1/2)
      * BatchNorm: weight/bias -> params; running_mean/running_var ->
        batch_stats mean/var (ops/norm.py MaskedBatchNorm).
      * KernelConv parameters (x_center [L,F], x_support [L,deg,F],
        edge_attr_support [L,deg,E], p_support [L,deg,3], the five
        *_sc_weight scalars) are stored IDENTICALLY on both sides — only
        score matrices are transposed between the frameworks
        ([nodes, kernels] here vs [kernels, nodes] there), never params.
        Source: gnn_model.gnn.layers.{i}.trainable_kernelconv_set.{d-1}
        (kernels.py:483-486); fixed sets map from fixed_kernelconv_set
        when the template carries them.

    ``prefix`` is prepended to every source key (e.g. ``"model."`` for
    checkpoints that nest the LightningModule under an attribute).
    Returns a new variables dict of numpy arrays (cast to the template
    leaf dtypes), ready for ``Trainer``/``Predictor``/``serving``.
    """
    from flax.traverse_util import flatten_dict, unflatten_dict

    sd = {str(k): v for k, v in dict(state_dict).items()}

    def _schnet_key(rest):
        """Source key for a path under our SchNet encoder
        (models/schnet.py param names vs the reference's
        /root/reference/models/SchNet/schnet.py:106-150 module tree; the
        same correspondence the injected-weights parity test uses)."""
        name = rest[0]
        if name == "init_v":  # Embedding: weight stored [num, H] both sides
            return "gnn_model.init_v.weight", False
        leaf = "weight" if rest[1] == "kernel" else rest[1]
        transpose = rest[1] == "kernel"
        if name in ("uu1", "uu2"):
            return (
                f"gnn_model.update_u.lin{name[-1]}.{leaf}",
                transpose,
            )
        base, _, layer = name.rpartition("_")
        if base in ("mlp1", "mlp2"):
            seq = {"mlp1": 0, "mlp2": 2}[base]
            return (
                f"gnn_model.update_es.{layer}.mlp.{seq}.{leaf}",
                transpose,
            )
        if base == "lin":
            return f"gnn_model.update_es.{layer}.lin.{leaf}", transpose
        if base in ("uv1", "uv2"):
            return (
                f"gnn_model.update_vs.{layer}.lin{base[-1]}.{leaf}",
                transpose,
            )
        raise KeyError(f"unmapped SchNet path: {rest}")

    def _skip_sub(name):
        """before_skip{k}/after_skip{k} -> layers_*_skip.{k} (both
        DimeNet++ and SphereNet residual stacks)."""
        for ours, theirs in (
            ("before_skip", "layers_before_skip"),
            ("after_skip", "layers_after_skip"),
        ):
            if name.startswith(ours):
                return f"{theirs}.{int(name[len(ours):])}"
        return None

    def _out_sub(sub):
        """update_v / output-block sublayer names: lin{k} -> lins.{k},
        the named linears pass through."""
        if sub in ("lin_rbf", "lin_up", "lin"):
            return sub
        if sub.startswith("lin"):
            return f"lins.{int(sub[len('lin'):])}"
        raise KeyError(f"unmapped output sublayer: {sub}")

    def _dimenet_key(rest):
        """models/dimenetpp.py param names vs the reference's
        DimeNetPlusPlus module tree (/root/reference/models/ChIRoNet/
        gnn_3D/dimenet_pp.py:193-260) — the injected-weights parity
        test's correspondence."""
        name = rest[0]
        if name == "rbf_freq":
            return "gnn_model.rbf.freq", False
        if name == "emb":
            return "gnn_model.emb.emb.weight", False
        transpose = rest[-1] == "kernel"
        leaf = "weight" if transpose else rest[-1]
        if name in ("emb_lin_rbf", "emb_lin"):
            return (
                f"gnn_model.emb.{name[len('emb_'):]}.{leaf}",
                transpose,
            )
        if name.startswith("output"):
            b = int(name[len("output"):])
            return (
                f"gnn_model.output_blocks.{b}.{_out_sub(rest[1])}.{leaf}",
                transpose,
            )
        if name.startswith("interaction"):
            b = int(name[len("interaction"):])
            sk = _skip_sub(rest[1])
            mid = f"{sk}.{rest[2]}" if sk else rest[1]
            return (
                f"gnn_model.interaction_blocks.{b}.{mid}.{leaf}",
                transpose,
            )
        raise KeyError(f"unmapped DimeNet++ path: {rest}")

    def _spherenet_key(rest):
        """models/spherenet.py param names vs the reference's SphereNet
        module tree (/root/reference/models/ChIRoNet/gnn_3D/
        spherenet.py:600-640); update_u is parameterless there."""
        name = rest[0]
        if name == "rbf_freq":
            return "gnn_model.emb.dist_emb.freq", False
        transpose = rest[-1] == "kernel"
        leaf = "weight" if transpose else rest[-1]
        if name == "init_e":
            if rest[1] == "emb":
                return "gnn_model.init_e.emb.weight", False
            return f"gnn_model.init_e.{rest[1]}.{leaf}", transpose
        if name == "init_v":
            return (
                f"gnn_model.init_v.{_out_sub(rest[1])}.{leaf}",
                transpose,
            )
        if name.startswith("update_e"):
            layer = int(name[len("update_e"):])
            sk = _skip_sub(rest[1])
            mid = f"{sk}.{rest[2]}" if sk else rest[1]
            return f"gnn_model.update_es.{layer}.{mid}.{leaf}", transpose
        if name.startswith("update_v"):
            layer = int(name[len("update_v"):])
            return (
                f"gnn_model.update_vs.{layer}.{_out_sub(rest[1])}.{leaf}",
                transpose,
            )
        raise KeyError(f"unmapped SphereNet path: {rest}")

    def _chiro_key(rest):
        """models/chironet.py param names vs the reference's
        ChIRoNet -> Encoder module tree (/root/reference/models/ChIRoNet/
        ChIRoNet.py:21, alpha_encoder.py:261-330): NNConv ('root' is the
        PyG root weight ``lin``), GATConv, and the five
        internal-coordinate MLPs."""
        base = "gnn_model.encoder"
        name = rest[0]

        def nnconv(mod, sub):
            if sub[0] == "nn":
                k = int(sub[1][len("lin"):])
                transpose = sub[2] == "kernel"
                leaf = "weight" if transpose else sub[2]
                return f"{mod}.nn.linear_layers.{k}.{leaf}", transpose
            if sub[0] == "root":
                return f"{mod}.lin.weight", True
            if sub[0] == "bias":
                return f"{mod}.bias", False
            raise KeyError(f"unmapped NNConv sublayer: {sub}")

        def gat(mod, sub):
            if sub[0] == "lin":
                return f"{mod}.lin.weight", True
            if sub[0] in ("att_src", "att_dst", "bias"):
                return f"{mod}.{sub[0]}", False
            raise KeyError(f"unmapped GAT sublayer: {sub}")

        if name == "EConv":
            return nnconv(f"{base}.Graph_Embedder.EConv", rest[1:])
        if name.startswith("ChiralGAT"):
            g = int(name[len("ChiralGAT"):])
            return gat(
                f"{base}.ChiralMessagePassingEncoder.ChiralGATLayers.{g}",
                rest[1:],
            )
        if name == "ChiralEConv":
            return nnconv(
                f"{base}.ChiralMessagePassingEncoder.ChiralEConv", rest[1:]
            )
        if name.startswith("GAT"):
            g = int(name[len("GAT"):])
            return gat(f"{base}.Graph_Embedder.GAT_layers.{g}", rest[1:])
        if name == "InternalCoordinateEncoder":
            k = int(rest[2][len("lin"):])
            transpose = rest[3] == "kernel"
            leaf = "weight" if transpose else rest[3]
            return (
                f"{base}.InternalCoordinateEncoder.{rest[1]}"
                f".linear_layers.{k}.{leaf}",
                transpose,
            )
        raise KeyError(f"unmapped ChIRoNet path: {rest}")

    def _enc_key(rest):
        """Source key for a path under our encoder (MolKGNNNet)."""
        if rest[0] in ("node_batch_norm", "edge_batch_norm"):
            leaf = {"mean": "running_mean", "var": "running_var"}.get(
                rest[1], rest[1]
            )
            return f"gnn_model.{rest[0]}.{leaf}", False
        if rest[0].startswith("graph_embedding_lin"):
            leaf = "weight" if rest[1] == "kernel" else rest[1]
            return f"gnn_model.{rest[0]}.{leaf}", rest[1] == "kernel"
        if rest[0] == "gnn" and rest[1].startswith("layer"):
            i = int(rest[1][len("layer"):])
            conv = rest[2]
            if conv.startswith("fixed_kernelconv"):
                d, set_name = int(conv[-1]), "fixed_kernelconv_set"
            elif conv.startswith("kernelconv"):
                d, set_name = int(conv[-1]), "trainable_kernelconv_set"
            else:
                raise KeyError(f"unmapped encoder path: {rest}")
            return (
                f"gnn_model.gnn.layers.{i}.{set_name}.{d - 1}.{rest[3]}",
                False,
            )
        raise KeyError(f"unmapped encoder path: {rest}")

    # Family dispatch by template structure: kgnn owns the BatchNorms,
    # DimeNet++ the emb_lin pair, SphereNet the init_e block, SchNet the
    # flat init_v embedding (SphereNet's init_v is a dict, so init_e is
    # checked first).
    enc_params = variables.get("params", {}).get("encoder", {})
    if "node_batch_norm" in enc_params:
        enc_map = _enc_key
    elif "EConv" in enc_params:
        enc_map = _chiro_key
    elif "emb_lin" in enc_params:
        enc_map = _dimenet_key
    elif "init_e" in enc_params:
        enc_map = _spherenet_key
    elif "init_v" in enc_params:
        enc_map = _schnet_key
    else:
        raise KeyError(
            "from_torch_state_dict: unrecognized encoder family "
            f"(template keys: {sorted(enc_params)[:6]})"
        )

    def _src_key(collection, path):
        if path[0] == "ffn":
            leaf = "weight" if path[1] == "kernel" else path[1]
            return f"ffn.{leaf}", path[1] == "kernel"
        if path[0] == "encoder":
            return enc_map(path[1:])
        raise KeyError(f"unmapped {collection} path: {path}")

    out = {}
    used = set()
    for collection, tree in variables.items():
        flat = flatten_dict(tree)
        mapped = {}
        for path, leaf in flat.items():
            key, transpose = _src_key(collection, path)
            key = prefix + key
            if key not in sd:
                raise KeyError(
                    f"reference state_dict missing '{key}' "
                    f"(for {collection} path {path})"
                )
            arr = _np(sd[key])
            if transpose:
                arr = arr.T
            want = np.shape(leaf)
            if tuple(arr.shape) != tuple(want):
                raise ValueError(
                    f"shape mismatch at '{key}': reference "
                    f"{tuple(arr.shape)} vs template {tuple(want)}"
                )
            mapped[path] = arr.astype(np.asarray(leaf).dtype)
            used.add(key)
        out[collection] = unflatten_dict(mapped)

    leftovers = [
        k
        for k in sd
        if k not in used
        and not k[len(prefix):].startswith(_IGNORED_TORCH_KEYS)
        and not k.endswith("num_batches_tracked")
    ]
    if leftovers:
        raise ValueError(
            "reference state_dict keys with no target in the template "
            f"(wrong model config?): {sorted(leftovers)[:8]}"
        )
    return out


def load_torch_checkpoint(path: str, variables: Any, prefix: str = ""):
    """``from_torch_state_dict`` on a torch-saved file: a raw state_dict,
    a PL .ckpt ({'state_dict': ...}), or the kernels dump the reference
    writes per layer (model.py:404-434)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return from_torch_state_dict(variables, obj, prefix=prefix)


def load_checkpoint(path: str, target: Any = None) -> Any:
    if _HAVE_ORBAX and os.path.isdir(path):
        ckptr = ocp.PyTreeCheckpointer()
        return ckptr.restore(os.path.abspath(path))
    from flax import serialization

    with open(path + ".msgpack", "rb") as f:
        data = f.read()
    if target is None:
        return serialization.msgpack_restore(data)
    return serialization.from_bytes(target, data)
