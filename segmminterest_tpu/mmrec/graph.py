"""Graph utilities for the MMRec family.

Behavioral spec: /root/reference/SkipPredBaseline/MMRec/src/models/freedom.py
(get_norm_adj_mat :135-159, get_knn_adj_mat :84-101,
compute_normalized_laplacian :126-133, pre_epoch_processing :161-176).

torch sparse matmuls become segment-sum message passing over static edge
arrays — fixed shapes, MXU/VPU friendly, no sparse formats.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def bipartite_norm_edges(users: np.ndarray, items: np.ndarray,
                         n_users: int, n_items: int):
    """Symmetric-normalized bipartite adjacency as (edge_u, edge_i, value):
    value = 1/sqrt(deg_u * deg_i) (get_norm_adj_mat)."""
    du = np.bincount(users, minlength=n_users).astype(np.float64) + 1e-7
    di = np.bincount(items, minlength=n_items).astype(np.float64) + 1e-7
    values = 1.0 / np.sqrt(du[users] * di[items])
    return (users.astype(np.int32), items.astype(np.int32),
            values.astype(np.float32))


def propagate(u_emb, i_emb, edge_u, edge_i, values):
    """One user<->item message-passing step of the normalized adjacency:
    returns (new_u, new_i)."""
    msgs_u = i_emb[edge_i] * values[:, None]
    new_u = jnp.zeros_like(u_emb).at[edge_u].add(msgs_u)
    msgs_i = u_emb[edge_u] * values[:, None]
    new_i = jnp.zeros_like(i_emb).at[edge_i].add(msgs_i)
    return new_u, new_i


def masked_norm_values(edge_u, edge_i, keep, n_users, n_items):
    """Renormalize the kept-edge subset (FREEDOM pre_epoch_processing /
    _normalize_adj_m): 1/sqrt(row_deg * col_deg) over kept edges, zero for
    dropped ones — a static-shape form of degree-sensitive edge pruning."""
    keep_f = keep.astype(jnp.float32)
    du = jnp.zeros(n_users).at[edge_u].add(keep_f) + 1e-7
    di = jnp.zeros(n_items).at[edge_i].add(keep_f) + 1e-7
    return keep_f / jnp.sqrt(du[edge_u] * di[edge_i])


def knn_item_graph(features: np.ndarray, knn_k: int,
                   batch: int = 1024) -> Tuple[np.ndarray, np.ndarray]:
    """kNN item-item graph over L2-normalized modal features with the
    reference's BATCHED quirk (get_knn_adj_mat_batch): similarities are
    computed within each 1024-item batch only, so neighbors never cross batch
    boundaries. Returns (edges (N*k, 2) int32, laplacian values (N*k,))."""
    x = features / (np.linalg.norm(features, axis=-1, keepdims=True) + 1e-12)
    n = x.shape[0]
    rows, cols = [], []
    for start in range(0, n, batch):
        chunk = x[start:start + batch]
        sim = chunk @ chunk.T
        k = min(knn_k, sim.shape[1])
        idx = np.argpartition(-sim, kth=k - 1, axis=1)[:, :k]
        # order by similarity like torch.topk
        order = np.take_along_axis(sim, idx, 1).argsort(axis=1)[:, ::-1]
        idx = np.take_along_axis(idx, order, 1)
        rows.append(np.repeat(np.arange(start, start + chunk.shape[0]), k))
        cols.append((idx + start).reshape(-1))
    rows = np.concatenate(rows).astype(np.int32)
    cols = np.concatenate(cols).astype(np.int32)
    # normalized laplacian values (compute_normalized_laplacian)
    deg = np.bincount(rows, minlength=n).astype(np.float64) + 1e-7
    values = (deg[rows] ** -0.5) * (deg[cols] ** -0.5)
    return np.stack([rows, cols], 1), values.astype(np.float32)


def global_weighted_knn_graph(features: np.ndarray, knn_k: int,
                              chunk: int = 4096
                              ) -> Tuple[np.ndarray, np.ndarray]:
    """GLOBAL sim-weighted kNN graph — LATTICE's original_adj
    (lattice.py:72-76 via utils.build_sim + build_knn_neighbourhood +
    compute_normalized_laplacian): neighbors come from the full cosine
    similarity matrix (unlike FREEDOM's block-local quirk), edge values are
    the cosines, and the laplacian normalizes by the SIM rowsums.
    Row-chunked so the dense n x n similarity never materializes."""
    x = np.asarray(features, np.float32)
    x = x / np.linalg.norm(x, axis=-1, keepdims=True)
    n = x.shape[0]
    k = min(knn_k, n)
    cols = np.empty((n, k), np.int32)
    sims = np.empty((n, k), np.float32)
    for start in range(0, n, chunk):
        sim = x[start:start + chunk] @ x.T
        idx = np.argpartition(-sim, kth=k - 1, axis=1)[:, :k]
        order = np.take_along_axis(sim, idx, 1).argsort(axis=1)[:, ::-1]
        idx = np.take_along_axis(idx, order, 1)
        cols[start:start + chunk] = idx
        sims[start:start + chunk] = np.take_along_axis(sim, idx, 1)
    rows = np.repeat(np.arange(n, dtype=np.int32), k)
    cols = cols.reshape(-1)
    vals = sims.reshape(-1).astype(np.float64)
    rowsum = np.bincount(rows, weights=vals, minlength=n)
    d = np.where(rowsum > 0, rowsum, np.inf) ** -0.5
    values = d[rows] * vals * d[cols]
    return np.stack([rows, cols], 1), values.astype(np.float32)


def knn_edges_device(features: jax.Array, knn_k: int,
                     chunk: int = 2048) -> jax.Array:
    """On-device global kNN STRUCTURE over cosine similarity, row-chunked so
    peak memory is chunk x n — LATTICE's per-epoch graph rebuild
    (lattice.py:141-142 build_sim + topk) with fixed output shape (n*k, 2)
    so the training step never recompiles."""
    x = features / (jnp.linalg.norm(features, axis=-1, keepdims=True) + 1e-12)
    n = x.shape[0]
    k = min(knn_k, n)
    pad = (-n) % chunk
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    blocks = xp.reshape(-1, chunk, x.shape[1])

    def body(block):
        sim = block @ x.T
        _, idx = jax.lax.top_k(sim, k)
        return idx

    cols = jax.lax.map(body, blocks).reshape(-1, k)[:n]
    rows = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)
    return jnp.stack([rows, cols.reshape(-1).astype(jnp.int32)], 1)


def weighted_laplacian_values(edges, proj, n_items: int):
    """Differentiable sim-weighted normalized-laplacian edge values over a
    given structure (lattice.py:154 compute_normalized_laplacian on the
    learned adjacency): v_ij = cos_ij / sqrt(rowsum_i * rowsum_j)."""
    pn = proj / (jnp.linalg.norm(proj, axis=-1, keepdims=True) + 1e-12)
    sims = (pn[edges[:, 0]] * pn[edges[:, 1]]).sum(-1)
    rowsum = jnp.zeros(n_items, sims.dtype).at[edges[:, 0]].add(sims)
    d = jnp.where(rowsum > 0, rowsum, jnp.inf) ** -0.5
    return d[edges[:, 0]] * sims * d[edges[:, 1]]


def item_graph_propagate(h, edges, values):
    """h_next[i] = sum_j A[i, j] h[j] over the item kNN graph."""
    msgs = h[edges[:, 1]] * values[:, None]
    return jnp.zeros_like(h).at[edges[:, 0]].add(msgs)
