"""Plain-numpy golden oracle for the geometry operators.

Written independently of the engine's kernels (different code
shape: fractional-coordinate MIC via a matrix inverse here vs the
engine's per-vector deskew) so that agreement is meaningful. The
semantics follow the reference's documented pure-array paths
(``/root/reference/dask_traj/geometry/distance.py:209-236``,
``angle.py:142-176``) and the standard minimum-image definitions.
"""

from __future__ import annotations

import numpy as np


def box_vectors_from_lengths_angles(a, b, c, alpha, beta, gamma):
    """(lengths nm, angles deg) → (3,3) lower-triangular box, rows a,b,c."""
    ar, br, gr = np.radians([alpha, beta, gamma])
    av = np.array([a, 0.0, 0.0])
    bv = np.array([b * np.cos(gr), b * np.sin(gr), 0.0])
    cx = c * np.cos(br)
    cy = c * (np.cos(ar) - np.cos(br) * np.cos(gr)) / np.sin(gr)
    cz = np.sqrt(c * c - cx * cx - cy * cy)
    cv = np.array([cx, cy, cz])
    m = np.stack([av, bv, cv])
    m[np.abs(m) < 1e-6] = 0.0
    return m


def lengths_angles_from_box_vectors(m):
    av, bv, cv = m[0], m[1], m[2]
    na, nb, nc = np.linalg.norm(av), np.linalg.norm(bv), np.linalg.norm(cv)
    alpha = np.degrees(np.arccos(np.clip(np.dot(bv, cv) / (nb * nc), -1, 1)))
    beta = np.degrees(np.arccos(np.clip(np.dot(cv, av) / (nc * na), -1, 1)))
    gamma = np.degrees(np.arccos(np.clip(np.dot(av, bv) / (na * nb), -1, 1)))
    return na, nb, nc, alpha, beta, gamma


def mic_displacement(d, box):
    """Minimum-image displacement via fractional coordinates + a
    3x3x3 image search. d: (..., 3); box: (3, 3) rows a,b,c."""
    inv = np.linalg.inv(box)
    frac = d @ inv  # fractional coords
    frac -= np.round(frac)
    base = frac @ box
    best = base.copy()
    best_n2 = (best ** 2).sum(-1)
    shifts = [-1.0, 0.0, 1.0]
    for si in shifts:
        for sj in shifts:
            for sk in shifts:
                if si == sj == sk == 0.0:
                    continue
                cand = base + si * box[0] + sj * box[1] + sk * box[2]
                n2 = (cand ** 2).sum(-1)
                take = n2 < best_n2
                best[take] = cand[take]
                best_n2[take] = n2[take]
    return best


def displacements(xyz, pairs, box=None):
    """r_j − r_i per (frame, pair). xyz (F, A, 3); pairs (P, 2);
    box None | (3,3) constant across frames."""
    d = xyz[:, pairs[:, 1], :].astype(np.float64) - xyz[:, pairs[:, 0], :]
    if box is not None:
        d = mic_displacement(d, np.asarray(box, dtype=np.float64))
    return d


def distances(xyz, pairs, box=None):
    return np.sqrt((displacements(xyz, pairs, box) ** 2).sum(-1))


def angles(xyz, triplets, box=None):
    u = displacements(xyz, triplets[:, [1, 0]], box)
    v = displacements(xyz, triplets[:, [1, 2]], box)
    un = np.linalg.norm(u, axis=-1)
    vn = np.linalg.norm(v, axis=-1)
    cosang = np.clip((u * v).sum(-1) / (un * vn), -1.0, 1.0)
    return np.arccos(cosang)


def center_of_mass(xyz, masses):
    m = np.asarray(masses, dtype=np.float64)
    w = m / m.sum()
    return (xyz.astype(np.float64) * w[None, :, None]).sum(axis=1)


def center_of_geometry(xyz):
    return xyz.astype(np.float64).mean(axis=1)


def closest_contact(xyz, g1, g2, box=None):
    """Per frame: (i, j, dist) minimal over g1 × g2, ties by (i, j)."""
    out = []
    for f in range(xyz.shape[0]):
        pts1 = xyz[f, g1].astype(np.float64)
        pts2 = xyz[f, g2].astype(np.float64)
        d = pts2[None, :, :] - pts1[:, None, :]
        if box is not None:
            d = mic_displacement(d, np.asarray(box, dtype=np.float64))
        dist = np.sqrt((d ** 2).sum(-1))
        best = None
        for ii, gi in enumerate(g1):
            for jj, gj in enumerate(g2):
                key = (dist[ii, jj], gi, gj)
                if best is None or key < best:
                    best = key
        out.append((f, best[1], best[2], best[0]))
    return out
