"""Regenerate fcd_tpu/metrics/_mc_tri_table.py.

Reconstructs the classic marching-cubes triangle connectivity per 2x2x2
neighbour code by (a) building the isosurface polygons from first
principles (face rules in mc_tables.py, ambiguous faces separate the
positive corners, complement side used when >4 corners are positive) and
(b) selecting, per polygon, the convex-polygon triangulation whose
triangle area-vector multiset matches the standard tabulation — verified
against the DeepMind surface-distance reference table when available.

Run: python scripts/gen_mc_tri_table.py [reference_lookup_tables_dir]
"""

from __future__ import annotations

import itertools
import sys

import numpy as np

sys.path.insert(0, ".")
from fcd_tpu.metrics import mc_tables as M  # noqa: E402

EDGE_INDEX = {M._edge_key(*e): i for i, e in enumerate(M._EDGES)}


def triangulations(n):
    memo = {}

    def dp(i, j):
        if j - i < 2:
            return [[]]
        if (i, j) in memo:
            return memo[(i, j)]
        res = []
        for k in range(i + 1, j):
            for left in dp(i, k):
                for right in dp(k, j):
                    res.append(left + right + [(i, k, j)])
        memo[(i, j)] = res
        return res

    return dp(0, n - 1)


def tri_vectors(pts, tris):
    return [
        np.cross(np.asarray(pts[b]) - np.asarray(pts[a]),
                 np.asarray(pts[c]) - np.asarray(pts[a])) / 2
        for (a, b, c) in tris
    ]


def canon(vs):
    rows = []
    for v in vs:
        v = np.round(np.asarray(v, float), 9)
        nz = v[np.abs(v) > 1e-12]
        if len(nz) and nz[0] < 0:
            v = -v
        rows.append(tuple(v))
    return tuple(sorted(rows))


def main():
    ref = None
    if len(sys.argv) > 1:
        sys.path.insert(0, sys.argv[1])
        import lookup_tables  # type: ignore

        ref = lookup_tables.neighbour_code_to_normals

    solved = {}
    for code in range(256):
        npos = bin(code).count("1")
        sides = [code] if npos < 4 else ([255 - code] if npos > 4 else [code, 255 - code])
        found = None
        for use_code in sides:
            polys = M._polygons_for_code(use_code)
            pts_list = [[tuple(M._midpoint(*e)) for e in p] for p in polys]
            combos = itertools.product(*[triangulations(len(p)) for p in pts_list])
            for combo in combos:
                vecs, tris_edges = [], []
                for pts, poly, tris in zip(pts_list, polys, combo):
                    vecs += tri_vectors(pts, tris)
                    tris_edges += [[EDGE_INDEX[poly[i]] for i in t] for t in tris]
                if ref is None:
                    found = (use_code, tris_edges)
                    break
                ref_vecs = [np.asarray(n, float) for n in ref[code] if np.linalg.norm(n) > 0]
                if len(vecs) == len(ref_vecs) and canon(vecs) == canon(ref_vecs):
                    found = (use_code, tris_edges)
                    break
            if found:
                break
        assert found is not None, f"no triangulation found for code {code}"
        solved[code] = found

    lines = []
    for code in range(256):
        side, tris = solved[code]
        tris_s = ", ".join("(%d, %d, %d)" % tuple(t) for t in tris)
        if len(tris) == 1:
            tris_s += ","
        lines.append(f"    ({side}, ({tris_s})),")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
