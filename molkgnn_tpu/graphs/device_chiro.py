"""Device-resident dataset + on-device batch assembly for the chironet
family — completing device-resident input coverage for all five model
families (kgnn: graphs/device_pack.py; SchNet/DimeNet++/SphereNet:
graphs/device_points.py).

A ChiroGraph's internal-coordinate tensors (distances, bond angles,
dihedrals with their index tuples, plus the local-structure alpha map)
are static per conformer, already computed at featurization time
(graphs/chiro.mol_to_chiro_graph — the reference's chiro_process,
/root/reference/wrapper.py:475-502). They flatten into per-kind arrays
with per-graph offsets; the on-device gather rebuilds ``batch_chiro``'s
exact layout — every index rebases by the batch NODE offsets except
``ls_map``, which rebases by the batch ALPHA offsets. Bit-parity with the
host packer is asserted in tests.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from molkgnn_tpu.graphs.chiro import ChiroBatch, ChiroBatchSpec, ChiroGraph
from molkgnn_tpu.graphs.device_pack import _ranged_gather


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DeviceChiroDataset:
    """Flat chiro dataset arrays living in HBM (a pytree)."""

    x: jax.Array  # [sumN, 52]
    node_count: jax.Array  # [G]
    node_start: jax.Array
    edge_local: jax.Array  # [sumE, 2]
    edge_attr: jax.Array  # [sumE, 14]
    edge_count: jax.Array
    edge_start: jax.Array
    dist_val: jax.Array  # [sumD]
    dist_local: jax.Array  # [sumD, 2]
    dist_count: jax.Array
    dist_start: jax.Array
    ang_val: jax.Array  # [sumP]
    ang_local: jax.Array  # [sumP, 3]
    ang_count: jax.Array
    ang_start: jax.Array
    dih_val: jax.Array  # [sumS]
    dih_local: jax.Array  # [sumS, 4]
    ls_local: jax.Array  # [sumS] graph-local alpha rows
    dih_count: jax.Array
    dih_start: jax.Array
    alpha_local: jax.Array  # [sumA, 2]
    alpha_count: jax.Array
    alpha_start: jax.Array
    y: jax.Array  # [G]

    @classmethod
    def from_graphs(cls, graphs: Sequence[ChiroGraph]) -> "DeviceChiroDataset":
        def starts(counts):
            c = np.asarray(counts, np.int64)
            return jnp.asarray((np.cumsum(c) - c).astype(np.int32))

        i32c = lambda a: jnp.asarray(np.asarray(a, np.int32))

        def cat(chunks, shape_tail, dtype):
            if sum(c.shape[0] for c in chunks) == 0:
                return jnp.zeros((0,) + shape_tail, dtype)
            return jnp.asarray(
                np.concatenate([np.asarray(c, dtype) for c in chunks])
            )

        ncnt = [g.num_nodes for g in graphs]
        ecnt = [g.edge_index.shape[1] for g in graphs]
        dcnt = [g.distances.shape[0] for g in graphs]
        acnt = [g.angles.shape[0] for g in graphs]
        scnt = [g.dihedrals.shape[0] for g in graphs]
        alcnt = [g.alpha_index.shape[1] for g in graphs]
        return cls(
            x=cat([g.x for g in graphs], (52,), np.float32),
            node_count=i32c(ncnt),
            node_start=starts(ncnt),
            edge_local=cat(
                [g.edge_index.T for g in graphs], (2,), np.int32
            ),
            edge_attr=cat([g.edge_attr for g in graphs], (14,), np.float32),
            edge_count=i32c(ecnt),
            edge_start=starts(ecnt),
            dist_val=cat([g.distances for g in graphs], (), np.float32),
            dist_local=cat(
                [g.distance_index for g in graphs], (2,), np.int32
            ),
            dist_count=i32c(dcnt),
            dist_start=starts(dcnt),
            ang_val=cat([g.angles for g in graphs], (), np.float32),
            ang_local=cat([g.angle_index for g in graphs], (3,), np.int32),
            ang_count=i32c(acnt),
            ang_start=starts(acnt),
            dih_val=cat([g.dihedrals for g in graphs], (), np.float32),
            dih_local=cat(
                [g.dihedral_index for g in graphs], (4,), np.int32
            ),
            ls_local=cat([g.ls_map for g in graphs], (), np.int32),
            dih_count=i32c(scnt),
            dih_start=starts(scnt),
            alpha_local=cat(
                [g.alpha_index.T for g in graphs], (2,), np.int32
            ),
            alpha_count=i32c(alcnt),
            alpha_start=starts(alcnt),
            y=jnp.asarray(np.asarray([g.y for g in graphs], np.float32)),
        )


def gather_chiro(
    data: DeviceChiroDataset, ids: jnp.ndarray, spec: ChiroBatchSpec
) -> ChiroBatch:
    """Assemble a padded ChiroBatch on device from graph ids [B]
    (jittable; same -1-padded-ids contract as gather_batch)."""
    valid = ids >= 0
    ids_c = jnp.where(valid, ids, 0).astype(jnp.int32)

    def seg(counts, starts_, cap):
        """(src, gop, mask, batch-local offsets per graph) for one ranged
        segment; the offsets rebase this kind's indices in OTHER segments
        (e.g. alpha offsets feed ls_map)."""
        lens = jnp.where(valid, counts[ids_c], 0)
        off = jnp.cumsum(lens) - lens
        src, gop, mask = _ranged_gather(ids_c, lens, starts_, cap)
        return src, gop, mask, off

    def pull(flat, src, mask):
        """Masked gather that tolerates a dataset-wide EMPTY flat array:
        a gather from shape (0, ...) is invalid even fully masked (the
        same trace-time failure gather_batch guards against for empty
        degree buckets), so emit the masked fill directly — a static
        decision, dataset shapes are trace-time constants. The fill is a
        zero OF THE FLAT DTYPE (a float literal would silently promote
        the int32 index arrays)."""
        if flat.shape[0] == 0:
            return jnp.zeros(src.shape + flat.shape[1:], flat.dtype)
        expand = (slice(None),) + (None,) * (flat.ndim - 1)
        return jnp.where(mask[expand], flat[src], jnp.zeros((), flat.dtype))

    nsrc, ngop, nmask, boff = seg(
        data.node_count, data.node_start, spec.num_nodes
    )
    x = pull(data.x, nsrc, nmask)
    gid = jnp.where(nmask, ngop, 0).astype(jnp.int32)

    esrc_i, egop, emask, _ = seg(
        data.edge_count, data.edge_start, spec.num_edges
    )
    pair = pull(data.edge_local, esrc_i, emask) + jnp.where(
        emask, boff[egop], 0
    )[:, None].astype(jnp.int32)
    eattr = pull(data.edge_attr, esrc_i, emask)

    def idx_seg(flat_idx, src, gop, mask):
        off = jnp.where(mask, boff[gop], 0)[:, None].astype(jnp.int32)
        return pull(flat_idx, src, mask) + off

    dsrc, dgop, dmask, _ = seg(
        data.dist_count, data.dist_start, spec.num_dist
    )
    dvals = pull(data.dist_val, dsrc, dmask)
    didx = idx_seg(data.dist_local, dsrc, dgop, dmask)

    asrc, agop, amask, _ = seg(
        data.ang_count, data.ang_start, spec.num_angles
    )
    avals = pull(data.ang_val, asrc, amask)
    aidx = idx_seg(data.ang_local, asrc, agop, amask)

    alsrc, algop, almask, aloff = seg(
        data.alpha_count, data.alpha_start, spec.num_alpha
    )
    alidx = idx_seg(data.alpha_local, alsrc, algop, almask)

    ssrc, sgop, smask, _ = seg(
        data.dih_count, data.dih_start, spec.num_dihedrals
    )
    svals = pull(data.dih_val, ssrc, smask)
    sidx = idx_seg(data.dih_local, ssrc, sgop, smask)
    # ls_map rebases by the batch ALPHA offsets, not node offsets.
    lsm = pull(data.ls_local, ssrc, smask) + jnp.where(
        smask, aloff[sgop], 0
    ).astype(jnp.int32)

    y = jnp.where(valid, data.y[ids_c], 0.0)

    return ChiroBatch(
        x=x,
        node_mask=nmask,
        node_graph_id=gid,
        edge_src=pair[:, 0].astype(jnp.int32),
        edge_dst=pair[:, 1].astype(jnp.int32),
        edge_attr=eattr,
        edge_mask=emask,
        distances=dvals,
        dist_i=didx[:, 0],
        dist_j=didx[:, 1],
        dist_mask=dmask,
        angles=avals,
        ang_i=aidx[:, 0],
        ang_j=aidx[:, 1],
        ang_k=aidx[:, 2],
        ang_mask=amask,
        dihedrals=svals,
        dih_i=sidx[:, 0],
        dih_j=sidx[:, 1],
        dih_k=sidx[:, 2],
        dih_l=sidx[:, 3],
        dih_mask=smask,
        ls_map=lsm,
        alpha_x=alidx[:, 0],
        alpha_y=alidx[:, 1],
        alpha_mask=almask,
        y=y,
        graph_mask=valid,
    )
