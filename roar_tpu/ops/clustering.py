"""Speaker clustering: NME-SC spectral clustering on device.

TPU-first re-design of roar/collections/asr/parts/utils/offline_clustering.py
(cos_similarity :7, getCosAffinityMatrix :427, getKneighborsConnections :304,
getAffinityGraphMat :347, getLaplacian :556, estimateNumofSpeakers :741,
NMESC :900, SpectralClustering :773, kmeans_torch :170):

- the affinity matrix, top-p binarization, Laplacians and eigenvalues are
  jnp — one jitted program evaluates the eigen-gap ratio for EVERY candidate
  p-value at once (`vmap` over the p-grid) instead of the reference's
  torch.jit.fork thread pool;
- k-means++ init and Lloyd iterations run as `lax.fori_loop`s on device;
- host Python only orchestrates (p-grid construction, connectivity check,
  final label materialization).

Documented divergence: among k-means restarts we keep the lowest-inertia
trial (the standard criterion) instead of the reference's mode-of-modes
majority vote over unaligned label sets (offline_clustering.py:866-871),
which is not permutation-safe.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ----------------------------------------------------------------------
# Affinity
# ----------------------------------------------------------------------

def cos_affinity(emb: jnp.ndarray) -> jnp.ndarray:
    """[N, D] embeddings -> min-max-scaled cosine affinity [N, N]
    (getCosAffinityMatrix offline_clustering.py:427-451)."""
    emb = emb.astype(jnp.float32)
    norm = jnp.linalg.norm(emb, axis=1, keepdims=True)
    e = emb / jnp.maximum(norm, 1e-8)
    sim = e @ e.T
    lo, hi = jnp.min(sim), jnp.max(sim)
    return (sim - lo) / jnp.maximum(hi - lo, 1e-8)


def binarize_topp(aff: jnp.ndarray, p_value: jnp.ndarray) -> jnp.ndarray:
    """Keep each row's top-p connections as 1, symmetrize with 0.5*(X+X^T)
    (getKneighborsConnections + getAffinityGraphMat :304-360).

    `p_value` may be a traced scalar: the top-p mask is computed from per-row
    ranks (rank < p), which jits for any p without re-binarizing on host.
    """
    order = jnp.argsort(-aff, axis=1)
    ranks = jnp.argsort(order, axis=1)  # rank of each column within its row
    x = (ranks < p_value).astype(jnp.float32)
    return 0.5 * (x + x.T)


def laplacian(x: jnp.ndarray) -> jnp.ndarray:
    """Unnormalized graph Laplacian L = D - X with zeroed diagonal
    (getLaplacian :556-566)."""
    x = x * (1.0 - jnp.eye(x.shape[0], dtype=x.dtype))
    return jnp.diag(jnp.sum(x, axis=0)) - x


def eigvalsh_laplacian(aff_bin: jnp.ndarray) -> jnp.ndarray:
    return jnp.linalg.eigvalsh(laplacian(aff_bin))


def lambda_gaps(lambdas: jnp.ndarray) -> jnp.ndarray:
    """Consecutive eigenvalue gaps (getLamdaGaplist :599-607)."""
    return lambdas[1:] - lambdas[:-1]


def estimate_num_speakers(
    aff_bin: jnp.ndarray, max_num_speakers: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(num_speakers, lambdas, gaps) from the binarized affinity
    (estimateNumofSpeakers :741-772)."""
    lambdas = jnp.sort(eigvalsh_laplacian(aff_bin))
    gaps = lambda_gaps(lambdas)
    num = jnp.argmax(gaps[: min(max_num_speakers, gaps.shape[0])]) + 1
    return num, lambdas, gaps


@functools.partial(jax.jit, static_argnames=("max_num_speakers",))
def _eig_ratio_grid(aff, p_values, max_num_speakers: int):
    """g_p ratio + speaker estimate for every candidate p in ONE program
    (vmapped analogue of NMESC.getEigRatio :1099-1129)."""

    def one(p):
        a = binarize_topp(aff, p)
        num, lambdas, gaps = estimate_num_speakers(a, max_num_speakers)
        max_gap = jnp.max(gaps[:max_num_speakers]) / (jnp.max(lambdas) + 1e-10)
        g_p = (p / aff.shape[0]) / (max_gap + 1e-10)
        return g_p, num

    return jax.vmap(one)(p_values.astype(jnp.float32))


def _fully_connected(aff_bin: np.ndarray) -> bool:
    """Host-side BFS connectivity check (isGraphFullyConnected :293-303).
    Any nonzero weight connects — the symmetrized one-directional edges
    (value 0.5) count, matching the reference BFS's logical_or on float
    rows and the Laplacian's spectral behavior."""
    n = aff_bin.shape[0]
    adj = aff_bin > 0
    seen = np.zeros(n, bool)
    seen[0] = True
    frontier = np.asarray([0])
    while frontier.size:
        nxt = np.unique(np.nonzero(adj[frontier])[1])
        nxt = nxt[~seen[nxt]]
        seen[nxt] = True
        frontier = nxt
    return bool(seen.all())


class NMESC:
    """Normalized-Maximum-Eigengap p-value / speaker-count estimation
    (offline_clustering.py:900-1180).  `forward()` returns
    (est_num_of_speakers, p_hat)."""

    def __init__(
        self,
        mat,
        max_num_speakers: int = 10,
        max_rp_threshold: float = 0.15,
        sparse_search: bool = True,
        sparse_search_volume: int = 30,
        nme_mat_size: int = 512,
        use_subsampling_for_nme: bool = True,
        fixed_thres: float = -1.0,
        maj_vote_spk_count: bool = False,
    ):
        self.mat = jnp.asarray(mat)
        self.max_num_speakers = max_num_speakers
        self.max_rp_threshold = max_rp_threshold
        self.sparse_search = sparse_search
        self.sparse_search_volume = sparse_search_volume
        self.nme_mat_size = nme_mat_size
        self.use_subsampling_for_nme = use_subsampling_for_nme
        self.fixed_thres = fixed_thres
        self.maj_vote_spk_count = maj_vote_spk_count

    def _p_value_list(self, n: int) -> np.ndarray:
        """Candidate p grid (getPvalueList :1131-1178)."""
        if self.fixed_thres is not None and self.fixed_thres > 0.0:
            return np.asarray([max(int(n * self.fixed_thres), 2)])
        max_n = max(int(n * self.max_rp_threshold), 2)
        if self.sparse_search:
            steps = min(max_n, max(min(max_n, self.sparse_search_volume), 2))
            return np.unique(np.linspace(1, max_n, steps).astype(int))
        return np.arange(1, max_n + 1)

    def forward(self) -> Tuple[int, int]:
        mat = self.mat
        subsample_ratio = 1
        if self.use_subsampling_for_nme and mat.shape[0] > self.nme_mat_size:
            subsample_ratio = int(np.ceil(mat.shape[0] / self.nme_mat_size))
            mat = mat[::subsample_ratio, ::subsample_ratio]

        p_list = self._p_value_list(mat.shape[0])
        g_p, nums = _eig_ratio_grid(
            mat, jnp.asarray(p_list), self.max_num_speakers
        )
        g_p = np.asarray(g_p)
        nums = np.asarray(nums)
        best = int(np.argmin(g_p))
        rp_p_value = int(p_list[best])

        aff_bin = np.asarray(binarize_topp(mat, jnp.asarray(rp_p_value)))
        if not _fully_connected(aff_bin):
            # grow p until the graph connects (getMinimumConnection :361-378)
            for p in p_list[p_list > rp_p_value]:
                aff_bin = np.asarray(binarize_topp(mat, jnp.asarray(int(p))))
                rp_p_value = int(p)
                if _fully_connected(aff_bin):
                    break

        p_hat = int(subsample_ratio * rp_p_value)
        if self.maj_vote_spk_count:
            vals, counts = np.unique(nums, return_counts=True)
            est = int(vals[np.argmax(counts)])
        else:
            est = int(nums[best])
        return est, p_hat


# ----------------------------------------------------------------------
# K-means on device
# ----------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("k", "iters"))
def kmeans(x: jnp.ndarray, k: int, seed: jnp.ndarray, iters: int = 50):
    """K-means++ init + Lloyd iterations (kmeans_plusplus_torch :78,
    kmeans_torch :170) as fori_loops.  Returns (labels [N], inertia)."""
    n = x.shape[0]
    key = jax.random.PRNGKey(seed) if jnp.ndim(seed) == 0 else seed

    def dist2(a, b):
        return jnp.sum(jnp.square(a[:, None, :] - b[None, :, :]), -1)

    # -- k-means++ seeding --
    key, k0 = jax.random.split(key)
    first = jax.random.randint(k0, (), 0, n)
    centers0 = jnp.zeros((k, x.shape[1]), x.dtype).at[0].set(x[first])

    def seed_body(i, carry):
        centers, key = carry
        d = dist2(x, centers)  # [N, k]
        # distance to nearest chosen center (mask unchosen slots with +inf)
        mask = jnp.arange(k) < i
        d = jnp.where(mask[None, :], d, jnp.inf)
        dmin = jnp.min(d, axis=1)
        key, kk = jax.random.split(key)
        probs = dmin / jnp.maximum(jnp.sum(dmin), 1e-12)
        idx = jax.random.choice(kk, n, p=probs)
        return centers.at[i].set(x[idx]), key

    centers, key = jax.lax.fori_loop(1, k, seed_body, (centers0, key))

    # -- Lloyd --
    def lloyd_body(_, carry):
        centers, _ = carry
        d = dist2(x, centers)
        labels = jnp.argmin(d, axis=1)
        onehot = jax.nn.one_hot(labels, k, dtype=x.dtype)  # [N, k]
        counts = jnp.maximum(onehot.sum(0), 1.0)
        new_centers = (onehot.T @ x) / counts[:, None]
        # keep old center for empty clusters
        new_centers = jnp.where(
            (onehot.sum(0) > 0)[:, None], new_centers, centers
        )
        return new_centers, labels

    centers, labels = jax.lax.fori_loop(
        0, iters, lloyd_body, (centers, jnp.zeros((n,), jnp.int32))
    )
    inertia = jnp.sum(jnp.min(dist2(x, centers), axis=1))
    return labels, inertia


class SpectralClustering:
    """Spectral embedding + k-means (offline_clustering.py:773-898).
    Restarts pick the lowest-inertia labels (see module docstring)."""

    def __init__(self, n_clusters: int = 8, random_state: int = 0,
                 n_random_trials: int = 1):
        self.n_clusters = n_clusters
        self.random_state = random_state
        self.n_random_trials = max(n_random_trials, 1)

    def spectral_embeddings(self, aff: jnp.ndarray) -> jnp.ndarray:
        lam, vecs = jnp.linalg.eigh(laplacian(aff))
        return vecs[:, : self.n_clusters]

    def forward(self, aff) -> np.ndarray:
        aff = jnp.asarray(aff)
        if aff.shape[0] != aff.shape[1]:
            raise ValueError("The affinity matrix is not a square matrix.")
        emb = self.spectral_embeddings(aff)
        best_labels, best_inertia = None, np.inf
        for trial in range(self.n_random_trials):
            labels, inertia = kmeans(
                emb, self.n_clusters, jnp.asarray(self.random_state + trial)
            )
            if float(inertia) < best_inertia:
                best_inertia = float(inertia)
                best_labels = np.asarray(labels)
        return best_labels

    __call__ = forward


class SpeakerClustering:
    """End-to-end: embeddings -> affinity -> NME-SC -> labels
    (offline_clustering.py:1181+ SpeakerClustering.forward_infer)."""

    def __init__(
        self,
        max_num_speakers: int = 8,
        max_rp_threshold: float = 0.15,
        sparse_search_volume: int = 30,
        nme_mat_size: int = 512,
        maj_vote_spk_count: bool = False,
        n_random_trials: int = 1,
    ):
        self.max_num_speakers = max_num_speakers
        self.max_rp_threshold = max_rp_threshold
        self.sparse_search_volume = sparse_search_volume
        self.nme_mat_size = nme_mat_size
        self.maj_vote_spk_count = maj_vote_spk_count
        self.n_random_trials = n_random_trials

    def forward_infer(
        self, embeddings, oracle_num_speakers: Optional[int] = None
    ) -> np.ndarray:
        emb = jnp.asarray(embeddings)
        if emb.shape[0] <= 2:
            return np.zeros((emb.shape[0],), np.int64)
        aff = cos_affinity(emb)
        nmesc = NMESC(
            aff,
            max_num_speakers=self.max_num_speakers,
            max_rp_threshold=self.max_rp_threshold,
            sparse_search_volume=self.sparse_search_volume,
            nme_mat_size=self.nme_mat_size,
            maj_vote_spk_count=self.maj_vote_spk_count,
        )
        est_num, p_hat = nmesc.forward()
        if oracle_num_speakers is not None:
            est_num = oracle_num_speakers
        # NMESC's connectivity growth is capped at its p grid
        # (max_rp_threshold * N); for small segment counts with near-tied
        # affinities the top-p graph can still fragment, leaving a
        # multi-dimensional Laplacian null space whose eigenbasis is
        # arbitrary (clustering then depends on tie-breaking).  The
        # reference ships this flaw with a docstring warning
        # (getMinimumConnection :361-378); here p keeps growing until the
        # graph actually connects.
        n = aff.shape[0]
        p = int(min(p_hat, n))
        aff_bin = binarize_topp(aff, jnp.asarray(p))
        while not _fully_connected(np.asarray(aff_bin)) and p < n:
            p += 1
            aff_bin = binarize_topp(aff, jnp.asarray(p))
        return SpectralClustering(
            n_clusters=int(est_num), n_random_trials=self.n_random_trials
        ).forward(aff_bin)

    __call__ = forward_infer
