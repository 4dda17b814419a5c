"""Slow, dense NumPy/SciPy oracle implementations of the reference algorithms.

Written from the paper's formulas (Barz, Käding, Denzler, GCPR 2018,
arXiv:1809.02337) and SURVEY.md's reconstruction of ``cvjena/ITAL`` — NOT from
the reference source (the mount was empty).  This is the ground truth the TPU
implementation must match (SURVEY.md section 4, "honest parity harness"), and
also the CPU baseline timed by ``bench.py`` (BASELINE.md: the >=10x ms/round
denominator).

Everything here is deliberately simple and dense: full N x N kernel, per-round
Cholesky refits, Python loops over candidates — the reference's computational
shape.
"""

from __future__ import annotations

import itertools

import numpy as np
from scipy.linalg import cho_factor, cho_solve, cholesky, solve_triangular
from scipy.stats import multivariate_normal, norm


class OracleGP:
    """Dense exact GP with RBF kernel; mirrors ``italia/gp.py :: GaussianProcess``."""

    def __init__(self, x, length_scale, var=1.0, noise=1e-6):
        self.x = np.asarray(x, dtype=np.float64)
        self.ls = float(length_scale)
        self.var = float(var)
        self.noise = float(noise)
        d2 = (
            np.sum(self.x**2, axis=1)[:, None]
            + np.sum(self.x**2, axis=1)[None, :]
            - 2.0 * self.x @ self.x.T
        )
        np.maximum(d2, 0.0, out=d2)
        self.k_all = self.var * np.exp(-d2 / (2.0 * self.ls**2))
        self.labeled: list[int] = []
        self.y: list[float] = []
        self._cho = None

    def fit(self, indices, labels):
        self.labeled = list(indices)
        self.y = list(labels)
        k_ll = self.k_all[np.ix_(self.labeled, self.labeled)] + self.noise * np.eye(
            len(self.labeled)
        )
        self._cho = cho_factor(k_ll, lower=True)
        self.alpha = cho_solve(self._cho, np.asarray(self.y, dtype=np.float64))

    def predict_mean(self, ind=None):
        k = self.k_all[:, self.labeled] if ind is None else self.k_all[np.ix_(ind, self.labeled)]
        return k @ self.alpha

    def predict_cov(self, ind):
        """Full posterior covariance over subset ``ind``."""
        k_li = self.k_all[np.ix_(self.labeled, ind)]
        v = solve_triangular(self._cho[0], k_li, lower=True)
        return self.k_all[np.ix_(ind, ind)] - v.T @ v

    def predict_diag(self, ind=None):
        ind = np.arange(self.k_all.shape[0]) if ind is None else np.asarray(ind)
        k_li = self.k_all[np.ix_(self.labeled, ind)]
        v = solve_triangular(self._cho[0], k_li, lower=True)
        mu = self.k_all[np.ix_(ind, self.labeled)] @ self.alpha
        sig2 = np.diag(self.k_all)[ind] - np.sum(v * v, axis=0)
        return mu, np.maximum(sig2, 1e-12)


def mvn_orthant(mu, cov, signs):
    """P(sign_i * z_i > 0 for all i), z ~ N(mu, cov) — via scipy's Genz MVNDST."""
    mu = np.asarray(mu, dtype=np.float64)
    cov = np.asarray(cov, dtype=np.float64)
    signs = np.asarray(signs, dtype=np.float64)
    m = mu.shape[0]
    if m == 1:
        p = norm.sf(0.0, loc=mu[0], scale=np.sqrt(cov[0, 0]))
        return p if signs[0] > 0 else 1.0 - p
    # Flip axes so every constraint becomes z'_i < 0 is FALSE... easier: z'_i = -s_i z_i,
    # then the orthant is z'_i < 0 elementwise, i.e. CDF at 0.
    s = -signs
    mu_f = s * mu
    cov_f = cov * np.outer(s, s)
    # Default MVNDST tolerance (~1e-5): tighter settings cost ~1000x at m >= 3.
    return float(
        multivariate_normal.cdf(np.zeros(m), mean=mu_f, cov=cov_f, allow_singular=True)
    )


def user_feedback_prob(f, r, label_prob, mistake_prob):
    """P(F=f | R=r) for one item: f in {-1,0,+1}, r in {-1,+1}.

    The paper's noisy/skipping user model: annotate with prob ``label_prob``;
    an annotation is flipped with prob ``mistake_prob``.
    """
    if f == 0:
        return 1.0 - label_prob
    if f == r:
        return label_prob * (1.0 - mistake_prob)
    return label_prob * mistake_prob


def mutual_information(mu, cov, label_prob, mistake_prob, eps=1e-12):
    """Brute-force ITAL MI of a candidate batch: I(R; F) under the GP joint.

    Enumerates all 2^m relevance sign configurations (orthant probabilities of
    N(mu, cov)) and all 3^m feedback configurations (the noisy/skipping user
    model), exactly as in SURVEY.md section 3.2.
    """
    m = len(mu)
    r_configs = list(itertools.product([-1, 1], repeat=m))
    f_configs = list(itertools.product([-1, 0, 1], repeat=m))
    p_r = np.array([mvn_orthant(mu, cov, r) for r in r_configs])
    p_r = np.maximum(p_r, 0.0)
    p_r = p_r / max(p_r.sum(), eps)
    # P(f | r) factorizes across items.
    p_f_given_r = np.array(
        [
            [
                np.prod(
                    [user_feedback_prob(fi, ri, label_prob, mistake_prob) for fi, ri in zip(f, r)]
                )
                for f in f_configs
            ]
            for r in r_configs
        ]
    )  # (2^m, 3^m)
    p_f = p_r @ p_f_given_r
    mi = 0.0
    for i, _ in enumerate(r_configs):
        for j, _ in enumerate(f_configs):
            joint = p_r[i] * p_f_given_r[i, j]
            if joint > eps and p_f[j] > eps:
                mi += joint * np.log(p_f_given_r[i, j] / p_f[j])
    return mi


def ital_select(gp: OracleGP, candidates, batch_size, label_prob, mistake_prob):
    """Greedy ITAL batch construction — the reference's ``ITAL.fetch_unlabelled``."""
    batch: list[int] = []
    for _ in range(batch_size):
        best, best_score = None, -np.inf
        for c in candidates:
            if c in batch:
                continue
            sel = batch + [c]
            mu = gp.predict_mean(sel)
            cov = gp.predict_cov(sel) + 1e-6 * np.eye(len(sel))
            score = mutual_information(mu, cov, label_prob, mistake_prob)
            if score > best_score:
                best, best_score = c, score
        batch.append(best)
    return batch


def average_precision(relevant, scores, exclude=()):
    """AP of ranking ``scores`` (higher = earlier) against binary ``relevant``.

    ``exclude``: indices removed from the ranking (e.g. the query itself).
    """
    mask = np.ones(len(scores), dtype=bool)
    mask[list(exclude)] = False
    rel = np.asarray(relevant, dtype=bool)[mask]
    order = np.argsort(-np.asarray(scores)[mask], kind="stable")
    rel_sorted = rel[order]
    if rel_sorted.sum() == 0:
        return 0.0
    cum = np.cumsum(rel_sorted)
    precision = cum / (1 + np.arange(len(rel_sorted)))
    return float(np.sum(precision * rel_sorted) / rel_sorted.sum())
