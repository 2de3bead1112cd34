"""Bipartite matching and edge coloring (host side).

Used by the SHYPS gauge-measurement scheduler to 3-color the gauge/qubit
incidence graph (capability parity with reference utils.py:517-623).
"""

from __future__ import annotations

from collections import deque

import numpy as np

__all__ = ["hopcroft_karp", "edge_coloring_bipartite"]

_INF = float("inf")


def hopcroft_karp(adj: dict, U, V) -> dict:
    """Maximum bipartite matching; returns {u: v} for matched pairs."""
    pair_U = {u: None for u in U}
    pair_V = {v: None for v in V}
    dist: dict = {}

    def bfs() -> bool:
        queue = deque()
        for u in U:
            if pair_U[u] is None:
                dist[u] = 0
                queue.append(u)
            else:
                dist[u] = _INF
        dist[None] = _INF
        while queue:
            u = queue.popleft()
            if dist[u] < dist[None]:
                for v in adj.get(u, []):
                    pu = pair_V[v]
                    if pu is None:
                        dist[None] = dist[u] + 1
                    elif dist[pu] == _INF:
                        dist[pu] = dist[u] + 1
                        queue.append(pu)
        return dist[None] != _INF

    def dfs(u) -> bool:
        if u is None:
            return True
        for v in adj.get(u, []):
            pu = pair_V[v]
            if pu is None or (dist[pu] == dist[u] + 1 and dfs(pu)):
                pair_U[u] = v
                pair_V[v] = u
                return True
        dist[u] = _INF
        return False

    while bfs():
        for u in U:
            if pair_U[u] is None:
                dfs(u)
    return {u: v for u, v in pair_U.items() if v is not None}


def edge_coloring_bipartite(adj_mat: np.ndarray):
    """Edge-color a bipartite graph by repeated maximum matchings.

    Returns ``(color_dict, num_colors)`` where ``color_dict[c]`` lists the
    (row, col) edges of color ``c``. May use more than Δ colors (greedy).
    """
    adj_mat = np.asarray(adj_mat)
    num_row, num_col = adj_mat.shape
    U = list(range(num_row))
    V = list(range(num_col))
    current = {u: list(np.nonzero(adj_mat[u])[0]) for u in U}
    color_dict: dict[int, list] = {}
    num_colors = 0
    while any(current[u] for u in U):
        matching = hopcroft_karp(current, U, V)
        color_dict[num_colors] = sorted(matching.items())
        for u, v in matching.items():
            current[u].remove(v)
        num_colors += 1
    return color_dict, num_colors
