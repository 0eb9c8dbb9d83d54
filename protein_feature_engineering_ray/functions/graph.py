"""Conversation interaction-graph descriptors — the transcript re-expression
of the reference's network descriptor (``get_network_descriptor``,
feature.py:4566-4623: a residue contact graph summarized by per-node graph
statistics).  Here the graph is the conversation's ROLE-TRANSITION graph:
nodes = alphabet letters, a directed edge (a, b) whenever role b ever
follows role a (adjacent turns, self-loops excluded).

All statistics are closed-form functions of the A×A adjacent-pair count
matrix, so the kernel is DECOMPOSABLE exactly like DPC (counts = anchored
bigram counts, ``lookback = 1``) and segment-vectorized across every
conversation in a bucket ((n_segs, A, A) boolean tensor ops — no per-
conversation Python, no graph library).

Features per conversation:
- ``graph_density``      directed edges present / (A·(A−1))
- ``graph_reciprocity``  reciprocated unordered pairs / unordered pairs
                         present (0 when no edges)
- ``graphdeg_<letter>``  distinct undirected neighbors / (A−1)
- ``graph_clustering``   mean over nodes of the undirected local clustering
                         coefficient (0 for degree < 2)

Density / reciprocity / degrees are integer-count ratios (bit-exact SQL
oracle); clustering is a triangle ratio checked by the pytest reference.
"""

from __future__ import annotations

import numpy as np

from protein_feature_engineering_ray.core.context import ConvContext
from protein_feature_engineering_ray.functions.composition import NGramComposition


class ConvGraph:
    def __init__(self, letters: list[str]):
        self.letters = letters
        self._bigram = NGramComposition(letters, n=2, normalize=False)

    def names(self) -> list[str]:
        return (
            ["graph_density", "graph_reciprocity"]
            + [f"graphdeg_{s}" for s in self.letters]
            + ["graph_clustering"]
        )

    @property
    def lookback(self):
        return 1

    @property
    def counts_width(self):
        return len(self.letters) ** 2

    def counts(self, ctx: ConvContext, anchor: np.ndarray | None = None) -> np.ndarray:
        return self._bigram.counts(ctx, anchor=anchor)

    def finalize(self, counts: np.ndarray) -> np.ndarray:
        A = len(self.letters)
        n = len(counts)
        E = counts.reshape(n, A, A) > 0
        off = ~np.eye(A, dtype=bool)
        D = E & off  # directed edges, self-loops excluded
        n_dir = D.sum(axis=(1, 2))
        density = n_dir / float(A * (A - 1))
        U = D | D.transpose(0, 2, 1)  # undirected support
        both = D & D.transpose(0, 2, 1)
        n_unordered = U.sum(axis=(1, 2)) // 2
        n_recip = both.sum(axis=(1, 2)) // 2
        recip = np.where(
            n_unordered > 0,
            n_recip / np.where(n_unordered == 0, 1, n_unordered),
            0.0,
        )
        deg = U.sum(axis=2)  # (n, A) undirected degree
        degshare = deg / float(A - 1)
        # triangles through each node: (U @ U ∘ U) row sums / 2
        Uf = U.astype(np.float64)
        tri = (np.matmul(Uf, Uf) * Uf).sum(axis=2) / 2.0
        possible = deg * (deg - 1) / 2.0
        clust = np.where(possible > 0, tri / np.where(possible == 0, 1, possible), 0.0)
        return np.concatenate(
            [
                density[:, None],
                recip[:, None],
                degshare,
                clust.mean(axis=1)[:, None],
            ],
            axis=1,
        )

    def apply(self, ctx: ConvContext) -> np.ndarray:
        return self.finalize(self.counts(ctx))
