"""Independent numpy "spec" of the MolKGNN kernel-conv math.

Deliberately written as slow, obvious loops straight from the semantics in
SURVEY.md §2.1 (the reference's calculate_total_score contract) so it can
serve as an oracle for the vectorized TPU implementation. Cosine similarity
uses torch's formula dot / max(|a|*|b|, 1e-8).
"""

from __future__ import annotations

import numpy as np

from molkgnn_tpu.ops.permutations import PERMS


def cos(a: np.ndarray, b: np.ndarray, eps: float = 1e-8) -> float:
    denom = max(np.linalg.norm(a) * np.linalg.norm(b), eps)
    return float(np.dot(a, b) / denom)


def kernel_conv_spec(
    params: dict,
    x_focal: np.ndarray,
    p_focal: np.ndarray,
    x_nei: np.ndarray,
    p_nei: np.ndarray,
    e_nei: np.ndarray,
    deg: int,
    is_last_layer: bool,
) -> np.ndarray:
    """Returns [M, L] scores."""
    x_center = params["x_center"]
    x_support = params["x_support"]
    e_support = params["edge_attr_support"]
    p_support = params["p_support"]
    perms = PERMS[deg]
    L = x_center.shape[0]
    M = x_focal.shape[0]
    P = len(perms)

    pc = p_nei - p_focal[:, None, :]

    support_sc = np.zeros((M, L, P))
    for m in range(M):
        for l in range(L):
            for pi, perm in enumerate(perms):
                s = 0.0
                for k in range(deg):
                    s += cos(x_nei[m, k], x_support[l, perm[k]])
                support_sc[m, l, pi] = s / deg
    best = support_sc.max(axis=2)
    idx = support_sc.argmax(axis=2)

    edge_sc = np.zeros((M, L))
    center_sc = np.zeros((M, L))
    for m in range(M):
        for l in range(L):
            perm = perms[idx[m, l]]
            s = 0.0
            for k in range(deg):
                s += cos(e_nei[m, k], e_support[l, perm[k]])
            edge_sc[m, l] = s / deg
            center_sc[m, l] = cos(x_focal[m], x_center[l])

    ew = np.exp(
        np.array(
            [
                params["support_attr_sc_weight"],
                params["center_attr_sc_weight"],
                params["edge_attr_support_sc_weight"],
            ]
        )
    )
    w = ew / ew.sum()
    sc = best * w[0] + center_sc * w[1] + edge_sc * w[2]

    if deg == 4 and is_last_layer:
        sign = np.ones((M, L))
        for m in range(M):
            pairwise_equal = False
            for i in range(4):
                for j in range(i + 1, 4):
                    if np.array_equal(x_nei[m, i], x_nei[m, j]):
                        pairwise_equal = True
            if pairwise_equal:
                continue
            det_nei = np.dot(pc[m, 2], np.cross(pc[m, 0], pc[m, 1]))
            for l in range(L):
                perm = perms[idx[m, l]]
                s1 = p_support[l, perm[0]]
                s2 = p_support[l, perm[1]]
                s3 = p_support[l, perm[2]]
                det_sup = np.dot(s3, np.cross(s1, s2))
                if np.sign(det_nei) != np.sign(det_sup):
                    sign[m, l] = -1.0
        sc = sc * sign
    return sc
