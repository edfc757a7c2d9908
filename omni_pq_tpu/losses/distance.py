"""Legacy distance-based layout pseudo-label loss.

Reference: models/utils/distance_util.py — `calc_distance_vertically`
(:111-146), `distance_loss_gamma_mixture` (:310-394) and the
spectral-clustering debug variant `distance_loss_spectral_clustering`
(:192-307), reachable only via `get_loss_distance`
(loss_helper_pq.py:488-500), never from train.py/eval.py. Implemented for
API-surface completeness; the viz palette lives in utils/viz.py.

TPU-first redesign: the reference runs a Python loop over predicted quads
with a running min-|distance| update on the GPU, then a per-scene host scipy
EM fit plus an `opt.root` pdf-crossover solve. Here the per-quad signed
distances are one batched einsum over fixed-shape masked quads with a
first-occurrence argmin (jit-safe, matches the strict-< update order), the
mixture fit reuses the fixed-iteration jnp EM of losses/gamma.py, and the
crossover root is a fixed-iteration bisection of the log-pdf difference
(deterministic, compiles; the reference's `opt.root` finds the same
crossover when it converges).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .gamma import gamma_logpdf, gamma_mixture_em

# semantic classes forming the "layout" set (distance_util.py:322-325):
# wall(1), door(8), window(9) in the nyu40-mapped scannet ids the reference
# indexes with
LAYOUT_CLASSES = (1, 8, 9)
_NO_QUAD_DIST = 10.0  # distance init for points no quad ever updates (:117)


def calc_distance_vertically(points, quad_corners, quad_mask=None):
    """Signed vertical distance from each point to its nearest quad plane.

    Args:
      points: (N, 3) float32 scene points.
      quad_corners: (Q, 4, 3) float32 predicted quad corners.
      quad_mask: (Q,) bool; False rows are ignored (fixed-shape stand-in for
        the reference's variable-length post-NMS corner list).
    Returns:
      (distance (N,), idx (N,) float32) — the signed distance to the quad
      with minimum |distance| (inner side negative, distance_util.py:132-133)
      and that quad's index; points never within reach of a valid quad keep
      the reference's init values (10.0, 1.0).
    """
    Q = quad_corners.shape[0]
    if quad_mask is None:
        quad_mask = jnp.ones((Q,), bool)
    pc_center = jnp.mean(points, axis=0)
    q_center = jnp.mean(quad_corners, axis=1)  # (Q, 3)
    n = jnp.cross(quad_corners[:, 1] - quad_corners[:, 0],
                  quad_corners[:, 2] - quad_corners[:, 0])
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    # orient so the inner side (toward the scene centroid) is negative
    flip = jnp.sum((pc_center - q_center) * n, axis=-1) > 0
    n = jnp.where(flip[:, None], -n, n)
    # (Q, N) signed distances in one contraction
    d = jnp.einsum("qnc,qc->qn", points[None] - q_center[:, None], n)
    d = jnp.where(quad_mask[:, None], d, jnp.inf)
    # row 0 models the 10.0 init; argmin is first-occurrence, matching the
    # reference's strict-< running update (earliest quad wins ties)
    cand = jnp.concatenate(
        [jnp.full((1, points.shape[0]), _NO_QUAD_DIST), d], axis=0)
    sel = jnp.argmin(jnp.abs(cand), axis=0)  # (N,)
    dist = jnp.take_along_axis(cand, sel[None], axis=0)[0]
    idx = jnp.where(sel == 0, 1.0, (sel - 1).astype(jnp.float32))
    return dist, idx


def _pdf_crossover(a1, b1, a2, b2, w, iters: int = 40):
    """x where w*pdf_a(x) = (1-w)*pdf_b(x), by bisection between the
    component modes (fit.py:143-146 solves the same equation with opt.root
    seeded at the mode midpoint)."""
    mode = lambda a, b: jnp.maximum(a - 1.0, 1e-3) / jnp.maximum(b, 1e-6)
    lo = jnp.minimum(mode(a1, b1), mode(a2, b2)) * 1e-3 + 1e-6
    hi = jnp.maximum(mode(a1, b1), mode(a2, b2)) * 4.0 + 1e-3

    def f(x):
        return (jnp.log(w) + gamma_logpdf(x, a1, b1)
                - jnp.log1p(-w) - gamma_logpdf(x, a2, b2))

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        go_right = f(mid) > 0  # still on the near-component side
        return jnp.where(go_right, mid, lo), jnp.where(go_right, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return 0.5 * (lo + hi)


def distance_loss_gamma_mixture(points, semantic_labels, quad_corners,
                                quad_mask):
    """Batched legacy distance loss (distance_util.py:310-394).

    Args:
      points: (B, N, 3) float32.
      semantic_labels: (B, N) int32 nyu40-mapped labels.
      quad_corners: (B, Q, 4, 3) float32 post-parse quad corners
        (evals/quad.py parse_quad_predictions corners4).
      quad_mask: (B, Q) bool validity of each quad row.
    Returns:
      (loss scalar, aux dict with per-scene 'distance', 'idx_array',
       'keep_mask', 'layout_mask') — loss is the mean |distance| of kept
      layout points averaged over scenes with at least one kept point
      (lambda_distance = 1, :392-394).
    """
    layout = jnp.zeros(semantic_labels.shape, bool)
    for c in LAYOUT_CLASSES:
        layout = layout | (semantic_labels == c)

    def per_scene(pts, lay, corners, qmask):
        dist, idx = calc_distance_vertically(pts, corners, qmask)
        d_abs = jnp.abs(jnp.where(lay, dist, 1.0)) + 1e-12
        # EM fit over layout points only: emulate masking by folding
        # non-layout points into weight-neutral 1.0s is wrong — instead run
        # the EM with the masked values replaced by the layout mean so the
        # component responsibilities of real points dominate. The reference
        # fits on the exact subset; with fixed-shape batching we document
        # this as an approximation exercised only on the legacy path.
        n_lay = jnp.sum(lay)
        lay_mean = jnp.sum(jnp.where(lay, d_abs, 0.0)) / jnp.maximum(n_lay, 1)
        d_fit = jnp.where(lay, d_abs, lay_mean)
        a1, b1, a2, b2, w = gamma_mixture_em(d_fit, 2.0, 40.0, 10.0, 20.0,
                                             0.5, 20)
        root = _pdf_crossover(a1, b1, a2, b2, w)
        keep = lay & (d_abs < root)  # below-crossover points kept (fit.py:146)
        n_keep = jnp.sum(keep)
        scene_loss = jnp.sum(jnp.where(keep, jnp.abs(dist), 0.0)) / \
            jnp.maximum(n_keep, 1)
        return scene_loss, (n_keep > 0), dist, idx, keep

    loss_b, fit_b, dist_b, idx_b, keep_b = jax.vmap(per_scene)(
        points, layout, quad_corners, quad_mask)
    total_fit = jnp.sum(fit_b.astype(jnp.float32))
    loss = jnp.sum(jnp.where(fit_b, loss_b, 0.0)) / jnp.maximum(total_fit, 1.0)
    aux = {"distance": dist_b, "idx_array": idx_b, "keep_mask": keep_b,
           "layout_mask": layout}
    return loss, aux


def spectral_layout_clustering(points, semantic_labels, n_select: int = 1000,
                               lambdas=(0.1, 1.0, 0.0),
                               threshold_k: float = 0.1,
                               num_gt_quads=None, dump_path=None, seed=0):
    """Spectral clustering of layout points — the reference's debug variant
    distance_loss_spectral_clustering (distance_util.py:192-307), host-side
    numpy/sklearn. Not a loss (the reference returns 0): an analysis tool
    that partitions wall/door/window points into planar clusters.

    Deviations from the reference, by necessity and documented: normals come
    from this repo's k-NN PCA estimator (data/preprocess.py:estimate_normals,
    threaded C++ core) instead of open3d's KDTree-hybrid estimate_normals
    (not installed here); sampling uses a seeded numpy Generator instead of
    `random.sample`. Both only change which of the equivalent planar
    clusterings is found, not the method.

    Args:
      points: (N, 3) scene points (numpy).
      semantic_labels: (N,) int labels; layout set is wall/door/window
        = {1, 8, 9} (distance_util.py:322-325).
      n_select: points sampled for the affinity matrix (SELECTION=1000).
      lambdas: (euclid, cosine, d^2) distance weights (:278).
      threshold_k: eigenvalue threshold choosing the cluster count (:295).
      num_gt_quads: optional int; when given, prints the eigengap diagnostic
        the reference prints under use_gt (:287-291).
      dump_path: optional path; writes the reference's colored point dump
        (x y z r g b nx ny nz 1.0 rows, :302-306).
    Returns:
      dict(labels (n_select,), K, selected (n_select, 3),
           normals (n_select, 3), eigenvalues).
    """
    import numpy as np

    from ..data.preprocess import estimate_normals

    points = np.asarray(points)
    semantic_labels = np.asarray(semantic_labels)
    mask = np.isin(semantic_labels, LAYOUT_CLASSES)
    layout = points[mask]
    if len(layout) < 4:
        return {"labels": np.zeros(0, np.int64), "K": 0,
                "selected": np.zeros((0, 3)), "normals": np.zeros((0, 3)),
                "eigenvalues": np.zeros(0)}
    n_select = min(n_select, len(layout))
    rng = np.random.default_rng(seed)
    choice = rng.choice(len(layout), n_select, replace=False)
    sel = layout[choice]

    # pairwise euclid (:240)
    euclid = np.sqrt(((sel[:, None] - sel[None]) ** 2).sum(-1))

    # normals, flipped away from the layout centroid (:245-256: reference
    # flips where (p - center) . n < 0)
    normals = estimate_normals(layout, k=min(5, len(layout) - 1))
    centered = layout - layout.mean(0)
    flip = (centered * normals).sum(1) < 0
    normals[flip] = -normals[flip]
    sel_n = normals[choice]

    cosine = 1.0 - sel_n @ sel_n.T + 1e-5  # (:262-268)
    d = -(sel_n * sel).sum(1)  # plane offsets (:274-276)
    d2 = np.abs(d[:, None] - d[None]) ** 2
    distance = (lambdas[0] * euclid + lambdas[1] * cosine + lambdas[2] * d2)

    # normalized affinity + eigen spectrum (:281-286)
    std = distance.std()
    Z = np.exp(-distance ** 2 / (2 * std ** 2))
    Dm = np.diag(np.sum(Z, axis=1) ** (-0.5))
    Zt = Dm @ Z @ Dm
    eigenvalues = np.linalg.eigvalsh(Zt)[::-1]

    if num_gt_quads is not None and num_gt_quads >= 1:
        lo, hi = eigenvalues[num_gt_quads - 1], eigenvalues[num_gt_quads]
        print(f"gt num quad {num_gt_quads}  threshold {lo} {hi} "
              f"avg {(lo + hi) / 2}")
        print(eigenvalues[:6])

    K = int((eigenvalues > threshold_k).sum())
    try:
        from sklearn import cluster
        labels = cluster.spectral_clustering(
            n_clusters=max(K, 1), affinity=np.asarray(Zt), random_state=seed)
    except ImportError:  # sklearn not installed: eigengap count only
        labels = np.zeros(n_select, np.int64)

    if dump_path is not None:
        from ..utils.viz import label_palette
        colors = label_palette(labels)
        with open(dump_path, "w") as f:
            for k in range(n_select):
                c = colors[k] / 255.0
                f.write(f"{sel[k][0]} {sel[k][1]} {sel[k][2]} "
                        f"{c[0]} {c[1]} {c[2]} "
                        f"{sel_n[k][0]} {sel_n[k][1]} {sel_n[k][2]} 1.0\n")
    return {"labels": np.asarray(labels), "K": K, "selected": sel,
            "normals": sel_n, "eigenvalues": eigenvalues}
