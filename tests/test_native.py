"""Native C++ helper tests: build, Floyd-Warshall, path features."""

import numpy as np

from molkgnn_tpu.native import (
    UNREACHABLE,
    floyd_warshall,
    gen_edge_input,
    have_native,
)


def _chain_adj(n):
    adj = np.zeros((n, n), np.int64)
    for i in range(n - 1):
        adj[i, i + 1] = adj[i + 1, i] = 1
    return adj


def test_native_library_builds():
    assert have_native(), "g++ build of libgraph_ops.so failed"


def test_floyd_warshall_chain():
    dist, pred = floyd_warshall(_chain_adj(5))
    for i in range(5):
        for j in range(5):
            assert dist[i, j] == abs(i - j)


def test_floyd_warshall_disconnected_sentinel():
    adj = np.zeros((4, 4), np.int64)
    adj[0, 1] = adj[1, 0] = 1
    adj[2, 3] = adj[3, 2] = 1
    dist, _ = floyd_warshall(adj)
    assert dist[0, 1] == 1 and dist[0, 2] == UNREACHABLE


def test_floyd_warshall_matches_numpy_fallback():
    rng = np.random.default_rng(0)
    n = 12
    adj = (rng.random((n, n)) < 0.25).astype(np.int64)
    adj = np.maximum(adj, adj.T)
    np.fill_diagonal(adj, 0)
    dist_native, _ = floyd_warshall(adj)

    # scipy oracle
    from scipy.sparse.csgraph import shortest_path

    sp = shortest_path(adj.astype(float), unweighted=True)
    want = np.where(np.isinf(sp), UNREACHABLE, sp).astype(np.int64)
    np.testing.assert_array_equal(dist_native, want)


def test_gen_edge_input_paths():
    n, f = 5, 3
    adj = _chain_adj(n)
    feat = np.zeros((n, n, f), np.float32)
    for i in range(n - 1):
        feat[i, i + 1] = [i + 1, 0, 0]
        feat[i + 1, i] = [-(i + 1), 0, 0]
    dist, pred = floyd_warshall(adj)
    out = gen_edge_input(dist, pred, feat)
    # Path 0 -> 3 traverses edges (0,1), (1,2), (2,3).
    np.testing.assert_allclose(out[0, 3, 0, 0], 1)
    np.testing.assert_allclose(out[0, 3, 1, 0], 2)
    np.testing.assert_allclose(out[0, 3, 2, 0], 3)
    # Reverse direction uses reverse-edge features.
    np.testing.assert_allclose(out[3, 0, 0, 0], -3)
