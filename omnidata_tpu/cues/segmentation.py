"""Unsupervised 2D / 2.5D segmentation: Felzenszwalb superpixels -> mean-color
region-adjacency graph -> recursive normalized cuts.

Host-side (numpy + scipy.sparse) by design, mirroring the reference's choice
of CPU skimage for these cues (create_segmentation_2d_images.py:41-85,
create_segmentation_25d_images.py:47-120); the per-image volume is tiny
compared to rendering. Algorithms are implemented from the papers
(Felzenszwalb & Huttenlocher 2004; Shi & Malik 2000) with skimage's parameter
conventions so the reference settings transfer:

- felzenszwalb(img, scale, sigma, min_size): 8-connected grid graph, weight =
  L2 color distance, Kruskal-order merging with threshold tau(C) = scale/|C|,
  then small-component merging.
- rag_mean_color(mode='similarity'): region weight = exp(-d^2 / sigma),
  sigma = 255.0.
- cut_normalized(thresh, num_cuts): recursive two-way split by the Fiedler
  vector of the normalized Laplacian; split threshold chosen among num_cuts
  candidates minimizing the NCut value; stop when NCut > thresh.
"""
from __future__ import annotations

import numpy as np
import scipy.ndimage as ndi
import scipy.sparse as sp
import scipy.sparse.linalg as spla


class _UnionFind:
    def __init__(self, n):
        self.parent = np.arange(n)
        self.size = np.ones(n, np.int64)

    def find(self, x):
        root = x
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return ra
        if self.size[ra] < self.size[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        self.size[ra] += self.size[rb]
        return ra


def _img_as_float(img: np.ndarray) -> np.ndarray:
    """skimage img_as_float semantics: uint8 -> /255, uint16 -> /65535,
    floats pass through."""
    img = np.asarray(img)
    if img.dtype == np.uint8:
        return img / 255.0
    if img.dtype == np.uint16:
        return img / 65535.0
    return img.astype(np.float64)


_FELZ_LIB = None


def _felz_native():
    """Build/load the native Kruskal core (native/felzenszwalb.cpp) — ~70x
    faster than the Python loop at 512^2; bit-identical labels."""
    global _FELZ_LIB
    if _FELZ_LIB is not None:
        return _FELZ_LIB
    import ctypes
    import os
    import subprocess

    d = os.path.join(os.path.dirname(__file__), "..", "native")
    src = os.path.join(d, "felzenszwalb.cpp")
    so = os.path.join(d, "libfelzenszwalb.so")
    if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
        # atomic build: concurrent first-use from spawn'd pool workers must
        # never CDLL a half-written .so (or persist one with a fresh mtime)
        tmp = f"{so}.{os.getpid()}.tmp"
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, src], check=True
        )
        os.replace(tmp, so)
    lib = ctypes.CDLL(so)
    lib.felzenszwalb_segment.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_double, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.felzenszwalb_segment.restype = None
    _FELZ_LIB = lib
    return lib


def felzenszwalb(img: np.ndarray, scale: float = 200.0, sigma: float = 0.8,
                 min_size: int = 20, backend: str = "native",
                 pre_scaled: bool = False) -> np.ndarray:
    """Graph-based superpixels; img (H,W) or (H,W,C). Returns labels.

    Edge costs are computed at the 0-255 scale (img_as_float then x255 —
    skimage's felzenszwalb does the same, which is why the reference's
    scale=200/500 settings produce sensible superpixels on [0,1]-ish float
    inputs; verified against the published hm3d segment_unsup25d asset:
    x255 reproduces its region structure with ARI ~0.9 at this stage, while
    unscaled costs chain-merge into one giant region).

    pre_scaled=True: img is ALREADY at that 0-255 cost scale (e.g. the
    device-blurred maps of cues/seg_device.py) — skip the dtype rescale.

    backend='native' uses the C++ Kruskal core when g++ is available
    (identical labels up to np.unique renumbering, same stable tie order);
    'python' forces the reference loop."""
    if pre_scaled:
        img = np.atleast_3d(np.asarray(img, np.float64))
    else:
        img = np.atleast_3d(_img_as_float(img)) * 255.0
    if backend == "native":
        try:
            lib = _felz_native()
        except Exception:
            backend = "python"
        else:
            import ctypes

            if sigma > 0:
                img = np.stack(
                    [ndi.gaussian_filter(img[..., c], sigma)
                     for c in range(img.shape[-1])], -1,
                )
            arr = np.ascontiguousarray(img, np.float64)
            H, W, C = arr.shape
            out = np.empty((H * W,), np.int64)
            lib.felzenszwalb_segment(
                arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                H, W, C, float(scale), int(min_size),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            )
            return out.reshape(H, W)
    if sigma > 0:
        img = np.stack(
            [ndi.gaussian_filter(img[..., c], sigma) for c in range(img.shape[-1])], -1
        )
    H, W, _ = img.shape
    idx = np.arange(H * W).reshape(H, W)

    edges, weights = [], []

    def add(a, b):
        d = np.sqrt(np.sum((img.reshape(H * W, -1)[a] - img.reshape(H * W, -1)[b]) ** 2, -1))
        edges.append(np.stack([a, b], -1))
        weights.append(d)

    add(idx[:, :-1].ravel(), idx[:, 1:].ravel())      # right
    add(idx[:-1, :].ravel(), idx[1:, :].ravel())      # down
    add(idx[:-1, :-1].ravel(), idx[1:, 1:].ravel())   # down-right
    add(idx[1:, :-1].ravel(), idx[:-1, 1:].ravel())   # up-right
    E = np.concatenate(edges)
    Wt = np.concatenate(weights)

    # sort by the FLOAT32-rounded cost (stable): matches the native core's
    # 2-pass u32 radix exactly — near-ties within one f32 ulp collapse to
    # insertion order in both implementations; threshold math stays f64
    order = np.argsort(Wt.astype(np.float32), kind="stable")
    uf = _UnionFind(H * W)
    thresh = np.full(H * W, scale, np.float64)  # tau = scale / |C|, |C|=1
    for ei in order:
        a, b = E[ei]
        w = Wt[ei]
        ra, rb = uf.find(a), uf.find(b)
        if ra == rb:
            continue
        if w <= thresh[ra] and w <= thresh[rb]:
            r = uf.union(ra, rb)
            thresh[r] = w + scale / uf.size[r]
    # merge small components
    for ei in order:
        a, b = E[ei]
        ra, rb = uf.find(a), uf.find(b)
        if ra != rb and (uf.size[ra] < min_size or uf.size[rb] < min_size):
            uf.union(ra, rb)

    roots = np.array([uf.find(i) for i in range(H * W)])
    _, labels = np.unique(roots, return_inverse=True)
    return labels.reshape(H, W)


def rag_mean_color(img: np.ndarray, labels: np.ndarray, sigma: float = 255.0):
    """Mean-color region adjacency with similarity weights exp(-d^2/sigma).

    Returns (W sparse (n,n), mean_colors (n,C))."""
    img = np.atleast_3d(np.asarray(img, np.float64))
    H, W_, C = img.shape
    n = labels.max() + 1
    flat = labels.ravel()
    counts = np.bincount(flat, minlength=n).astype(np.float64)
    means = np.stack(
        [np.bincount(flat, weights=img[..., c].ravel(), minlength=n) for c in range(C)], -1
    ) / np.maximum(counts[:, None], 1)

    pairs = set()
    for (a, b) in ((labels[:, :-1], labels[:, 1:]), (labels[:-1, :], labels[1:, :])):
        diff = a != b
        pa, pb = a[diff], b[diff]
        lo = np.minimum(pa, pb)
        hi = np.maximum(pa, pb)
        pairs.update(zip(lo.tolist(), hi.tolist()))
    if not pairs:
        return sp.csr_matrix((n, n)), means
    ij = np.array(sorted(pairs))
    d2 = np.sum((means[ij[:, 0]] - means[ij[:, 1]]) ** 2, -1)
    w = np.exp(-d2 / sigma)
    Wm = sp.coo_matrix(
        (np.concatenate([w, w]), (np.concatenate([ij[:, 0], ij[:, 1]]),
                                  np.concatenate([ij[:, 1], ij[:, 0]]))),
        shape=(n, n),
    ).tocsr()
    return Wm, means


def _ncut_value(Wm, mask):
    """NCut(A,B) = cut/assoc(A) + cut/assoc(B)."""
    a = mask
    b = ~mask
    cut = Wm[a][:, b].sum()
    assoc_a = Wm[a].sum()
    assoc_b = Wm[b].sum()
    if assoc_a == 0 or assoc_b == 0:
        return np.inf
    return cut / assoc_a + cut / assoc_b


def _ncut_sweep(Wm, fiedler, ts):
    """NCut values for every threshold mask (fiedler > t) at once, O(E + K).

    Equivalent to [_ncut_value(Wm, fiedler > t) for t in ts] (same cut /
    assoc definitions: assoc includes self-loops and both edge directions,
    cut counts each undirected crossing edge once) but sweeps the sorted
    edge list with difference arrays instead of slicing the sparse matrix
    per threshold — at 512^2 / num_cuts=100 this is the difference between
    ~18 s and ~0.1 s per image."""
    K = len(ts)
    # level_i = #{k : ts[k] < fiedler[i]}  =>  (fiedler[i] > ts[k]) == (level_i > k)
    level = np.searchsorted(ts, fiedler, side="left")
    d = np.asarray(Wm.sum(1)).ravel()
    cnt = np.bincount(level, minlength=K + 1).astype(np.int64)
    deg = np.bincount(level, weights=d, minlength=K + 1)
    n_a = len(fiedler) - np.cumsum(cnt)[:K]          # |A| per threshold
    assoc_a = d.sum() - np.cumsum(deg)[:K]           # sum of degrees in A
    assoc_b = d.sum() - assoc_a
    coo = sp.triu(Wm, k=1).tocoo()                   # each undirected edge once
    li = level[coo.row]
    lj = level[coo.col]
    lo = np.minimum(li, lj)
    hi = np.maximum(li, lj)
    diff = np.zeros(K + 1)
    cross = lo < hi                                  # edge crosses for k in [lo, hi)
    np.add.at(diff, lo[cross], coo.data[cross])
    np.add.at(diff, hi[cross], -coo.data[cross])
    cut = np.cumsum(diff)[:K]
    with np.errstate(divide="ignore", invalid="ignore"):
        vals = cut / assoc_a + cut / assoc_b
    vals[(n_a == 0) | (n_a == len(fiedler)) | (assoc_a == 0) | (assoc_b == 0)] = np.inf
    return vals


def _ncut_sweep_dense(W, fiedler, ts):
    """_ncut_sweep for a dense (n, n) W — same cut/assoc difference-array
    sweep, numpy only. Summation order matches the sparse path (row-major
    upper-triangle edges; zero entries add 0.0 and cannot change sums)."""
    K = len(ts)
    n = W.shape[0]
    level = np.searchsorted(ts, fiedler, side="left")
    d = W.sum(1)
    cnt = np.bincount(level, minlength=K + 1).astype(np.int64)
    deg = np.bincount(level, weights=d, minlength=K + 1)
    n_a = n - np.cumsum(cnt)[:K]
    assoc_a = d.sum() - np.cumsum(deg)[:K]
    assoc_b = d.sum() - assoc_a
    iu, ju = np.triu_indices(n, 1)
    w = W[iu, ju]
    li, lj = level[iu], level[ju]
    lo = np.minimum(li, lj)
    hi = np.maximum(li, lj)
    diff = np.zeros(K + 1)
    cross = lo < hi
    np.add.at(diff, lo[cross], w[cross])
    np.add.at(diff, hi[cross], -w[cross])
    cut = np.cumsum(diff)[:K]
    with np.errstate(divide="ignore", invalid="ignore"):
        vals = cut / assoc_a + cut / assoc_b
    vals[(n_a == 0) | (n_a == n) | (assoc_a == 0) | (assoc_b == 0)] = np.inf
    return vals


def _two_way_ncut_dense(W, thresh, num_cuts):
    """Dense-numpy twin of _two_way_ncut for small subgraphs: the recursion
    spends ~2 ms/call in scipy.sparse construction/slicing overhead on RAGs
    of a few dozen nodes (511 calls x 2 ms dominated segment_25d's 1.7 s),
    while the actual eig was already dense. Identical math: the normalized
    Laplacian entries are the same single multiply chain
    dm12_i * L_ij * dm12_j, and the sweep matches _ncut_sweep_dense."""
    n = W.shape[0]
    if n < 3:
        return None
    d = W.sum(1)
    dm12 = 1.0 / np.sqrt(d + 1e-300)
    A = (dm12[:, None] * (np.diag(d) - W)) * dm12[None, :]
    import scipy.linalg as sla

    vals, vecs = sla.eigh(A)
    order = np.argsort(vals)
    if len(order) < 2:
        return None
    fiedler = vecs[:, order[1]]
    lo, hi = fiedler.min(), fiedler.max()
    if hi - lo < 1e-12:
        return None
    ts = np.linspace(lo, hi, num_cuts, endpoint=False)
    vals = _ncut_sweep_dense(W, fiedler, ts)
    bi = int(np.argmin(vals))
    if not (vals[bi] < thresh):
        return None
    return fiedler > ts[bi]


def _two_way_ncut(Wm, thresh, num_cuts):
    """One recursive step of skimage's graph.cut_normalized: Fiedler vector of
    the normalized Laplacian via shift-invert eigsh (sigma=0, 'LM' — the 'SM'
    mode fails to converge on near-disconnected RAGs), threshold sweep over
    num_cuts candidates, split only if the best NCut value <= thresh.
    Wm must already carry the self-loop diagonal (max_edge)."""
    n = Wm.shape[0]
    if n < 3:
        return None
    d = np.asarray(Wm.sum(1)).ravel()
    D = sp.diags(d)
    L = D - Wm
    Dm12 = sp.diags(1.0 / np.sqrt(d + 1e-300))
    A = Dm12 @ L @ Dm12
    if n <= 512:
        # dense solve: deterministic and immune to ARPACK non-convergence /
        # singular shift-inverts on (near-)disconnected RAGs
        import scipy.linalg as sla

        vals, vecs = sla.eigh(A.toarray())
    else:
        # k=2 would suffice mathematically but ARPACK shift-invert fails to
        # converge (or crawls) at tiny k on these near-disconnected RAGs;
        # the wide subspace is what makes it reliable
        k = min(100, n - 2)
        try:
            # shift slightly negative: A >= 0 so A + eps*I is never singular
            vals, vecs = spla.eigsh(
                A.astype(np.float64), k=k, sigma=-1e-6, which="LM"
            )
        except Exception:
            return None
    order = np.argsort(vals)
    if len(order) < 2:
        return None
    # threshold the raw eigenvector of the normalized system (skimage sweeps
    # ev, not Dm12 @ ev), over num_cuts candidates from min (inclusive) up
    fiedler = vecs[:, order[1]]
    lo, hi = fiedler.min(), fiedler.max()
    if hi - lo < 1e-12:
        return None
    ts = np.linspace(lo, hi, num_cuts, endpoint=False)
    vals = _ncut_sweep(Wm, fiedler, ts)
    bi = int(np.argmin(vals))
    if not (vals[bi] < thresh):
        return None
    return fiedler > ts[bi]


def cut_normalized(labels: np.ndarray, Wm, thresh: float = 0.001,
                   num_cuts: int = 10,
                   max_edge: float = 1.0) -> np.ndarray:
    """Recursively bipartition the RAG; relabel the image.

    max_edge: self-loop weight added to every node before cutting (skimage
    cut_normalized's max_edge / the reference's SEGMENTATION_*_SELF_EDGE_WEIGHT
    — create_segmentation_25d_images.py:62-67). Self-loops keep D well-
    conditioned on near-disconnected RAGs and damp trivial single-node cuts."""
    Wm = Wm.tolil(copy=True)
    Wm.setdiag(max_edge)
    Wm = Wm.tocsr()
    n = Wm.shape[0]
    region_of = np.zeros(n, np.int64)  # final region id per original segment
    next_id = 0

    # explicit worklist (aggressive thresholds can peel a node per cut —
    # recursion depth ~n blows Python's limit on large RAGs). Entries carry
    # an optional dense subgraph: once a subtree is <= 512 nodes it is
    # densified ONCE and children slice numpy arrays — the scipy.sparse
    # fancy-slicing/matmul overhead per tiny subgraph was the dominant cost
    # of segment_25d (511 calls x ~2 ms on a 512^2 image).
    stack = [(np.arange(n), None)]
    while stack:
        nodes, dW = stack.pop()
        if dW is None and len(nodes) <= 512:
            dW = np.asarray(Wm[nodes][:, nodes].todense())
        if dW is not None:
            mask = _two_way_ncut_dense(dW, thresh, num_cuts)
        else:
            sub = Wm[nodes][:, nodes]
            mask = _two_way_ncut(sub, thresh, num_cuts)
        if mask is None:
            region_of[nodes] = next_id
            next_id += 1
            continue
        sl = lambda m: None if dW is None else dW[np.ix_(m, m)]
        stack.append((nodes[~mask], sl(~mask)))  # LIFO: mask side first (old
        stack.append((nodes[mask], sl(mask)))    # DFS order, label-bit-stable)
    return region_of[labels]


def segment_2d(img: np.ndarray, scale: float = 200.0, blur: float = 3.0,
               cut_thresh: float = 0.005, num_cuts: int = 10,
               self_edge_weight: float = 1.0,
               blurred255: np.ndarray | None = None) -> np.ndarray:
    """segment_unsup2d (create_segmentation_2d_images.py:41-85): felzenszwalb
    on the (blurred) rgb/gray image (0-255 scale), mean-color RAG, normalized
    cuts.

    blurred255: optional device-computed blur of img at the 0-255 scale
    (seg_device.seg2d_blur_maps) — skips the host-side gaussian. The RAG
    still reads the raw img, as the reference does."""
    if blurred255 is not None:
        labels = felzenszwalb(blurred255, scale=scale, sigma=0.0,
                              min_size=20, pre_scaled=True)
    else:
        labels = felzenszwalb(img, scale=scale, sigma=blur, min_size=20)
    Wm, _ = rag_mean_color(img, labels)
    return cut_normalized(labels, Wm, thresh=cut_thresh, num_cuts=num_cuts,
                          max_edge=self_edge_weight)


def segment_25d(
    depth_code_u16: np.ndarray,
    normal_rgb: np.ndarray,
    edge_occlusion_u16: np.ndarray,
    depth_weight: float = 2.0,
    normal_weight: float = 1.0,
    edge_weight: float = 10.0,
    scale: float = 200.0,
    cut_thresh: float = 1.0,
    num_cuts: int = 100,
    self_edge_weight: float = 1.0,
    input_img: np.ndarray | None = None,
) -> np.ndarray:
    """segment_unsup25d (create_segmentation_25d_images.py:47-120): 5-channel
    [w_d*log(depth)/16, w_n*smoothed normal, w_e*edge] -> felz(min_size=200)
    -> similarity RAG -> ncut.

    input_img: optional pre-built WEIGHTED 5-channel image
    (seg_device.seg25d_input_from_maps — the smoothing computed on device);
    depth/normal/edge args and the *_weight knobs are then ignored."""
    if input_img is not None:
        return _segment_25d_from_img(
            np.asarray(input_img, np.float64), scale=scale,
            cut_thresh=cut_thresh, num_cuts=num_cuts,
            self_edge_weight=self_edge_weight)
    depth = np.asarray(depth_code_u16, np.float64)
    mask = depth < 2**16 - 2
    img_depth = np.log(np.maximum(depth, 1.0)) / 16.0
    img_normal = np.asarray(normal_rgb, np.float64) / 255.0
    img_edge = np.asarray(edge_occlusion_u16, np.float64) / 255.0 / 255.0

    # pure-host masked smoothing (same math as cues.edges.smooth_with_mask,
    # whose gaussian matches ndi.gaussian_filter(mode='constant')): host cues
    # must never dispatch to the device — on a tunneled TPU a worker-thread
    # jax call serializes with the render pipeline and collapses throughput
    mf = mask.astype(np.float64)
    _bleed = {}

    def sm(x, s):
        if s not in _bleed:
            _bleed[s] = ndi.gaussian_filter(mf, s, mode="constant") \
                + np.finfo(np.float32).eps
        smx = ndi.gaussian_filter(x * mf, s, mode="constant")
        return smx / _bleed[s]
    img_normal = np.stack([sm(img_normal[..., c], 2.0) for c in range(3)], -1)
    img_depth = sm(img_depth, 1.0)

    img = np.concatenate(
        [
            depth_weight * img_depth[..., None],
            normal_weight * img_normal,
            edge_weight * img_edge[..., None],
        ],
        -1,
    )
    return _segment_25d_from_img(img, scale=scale, cut_thresh=cut_thresh,
                                 num_cuts=num_cuts,
                                 self_edge_weight=self_edge_weight)


def _segment_25d_from_img(img: np.ndarray, scale: float, cut_thresh: float,
                          num_cuts: int, self_edge_weight: float):
    # felzenszwalb lifts costs to the 0-255 scale internally; the RAG sees
    # the raw [0,~1] float channels with sigma=255 (exactly what the
    # reference feeds skimage: create_segmentation_25d_images.py:104-113) —
    # all similarity weights land near 1, so the ncut stage partitions the
    # superpixel graph nearly uniformly, which is what the published
    # segment_unsup25d assets show (regions ~= 1-3 superpixels each).
    labels = felzenszwalb(img, scale=scale, sigma=0.0, min_size=200)
    Wm, _ = rag_mean_color(img, labels)
    return cut_normalized(labels, Wm, thresh=cut_thresh, num_cuts=num_cuts,
                          max_edge=self_edge_weight)
