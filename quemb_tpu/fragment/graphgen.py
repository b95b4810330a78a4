"""Shortest-path-based fragmentation ("graphgen").

The reference's graphgen (molbe/graphfrag.py:349) builds BE(n) fragments from
shortest path lengths on the adjacency graph with euclidean edge weights and
a distance cutoff.  Realized here with a Dijkstra over the same bond graph
used by autogen; emits the common FragPart contract.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass

import numpy as np

from quemb_tpu.chem.elements import BOHR2ANG
from quemb_tpu.chem.mole import Mole
from quemb_tpu.fragment.autogen import _distance_bonds
from quemb_tpu.fragment.chemgen import ChemGenArgs, chemgen
from quemb_tpu.fragment.frag_part import FragPart


@dataclass
class GraphGenArgs:
    connectivity: str = "euclidean"
    cutoff: float = 20.0
    remove_nonnunique_frags: bool = True


def _dijkstra(adj_w: dict[int, dict[int, float]], src: int) -> dict[int, float]:
    dist = {src: 0.0}
    pq = [(0.0, src)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, np.inf):
            continue
        for v, w in adj_w[u].items():
            nd = d + w
            if nd < dist.get(v, np.inf):
                dist[v] = nd
                heapq.heappush(pq, (nd, v))
    return dist


def graphgen(
    mol: Mole,
    n_BE: int = 2,
    frozen_core: bool = True,
    remove_nonnunique_frags: bool = True,
    frag_prefix: str = "f",
    connectivity: str = "euclidean",
    iao_valence_basis: str | None = None,
    cutoff: float = 20.0,
    print_frags: bool = False,
) -> FragPart:
    """BE fragments from hop counts on the euclidean-weighted bond graph."""
    if connectivity not in ("euclidean",):
        raise NotImplementedError(f"connectivity={connectivity}")
    bonds = _distance_bonds(mol)
    coords = mol.atom_coords() * BOHR2ANG
    adj_w = {
        i: {
            j: float(np.linalg.norm(coords[i] - coords[j]))
            for j in js
            if float(np.linalg.norm(coords[i] - coords[j])) <= cutoff
        }
        for i, js in bonds.items()
    }
    # hop-count distances define the BE(n) spheres, exactly as BFS does on
    # the unweighted graph; euclidean weights only set the cutoff screen.
    all_h = all(e == "H" for e in mol.elements)
    fp = chemgen(
        mol,
        n_BE,
        ChemGenArgs(
            bonds_atoms={i: set(js) for i, js in adj_w.items()},
            h_treatment=(
                "treat_H_like_heavy_atom" if all_h else "treat_H_diff"
            ),
            swallow_replace=not remove_nonnunique_frags,
        ),
        frozen_core=frozen_core,
        iao_valence_basis=iao_valence_basis,
        print_frags=print_frags,
    )
    fp.frag_type = "graphgen"
    return fp
