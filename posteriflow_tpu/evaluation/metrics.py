"""Evaluation metrics: bias, performance, recovery, method comparison.

Reference surface (src/ahsd/evaluation/metrics.py: BiasMetrics 1574-LoC
module): parameter-wise bias with significance, timing/accuracy grades,
multi-criteria signal matching with precision/recall/F1, pairwise method
comparison. Numpy host-side — evaluation is offline.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from posteriflow_tpu import PARAM_NAMES


class BiasMetrics:
    """Parameter-wise bias of posterior summaries against truth."""

    def __init__(self, param_names: Sequence[str] = PARAM_NAMES):
        self.param_names = tuple(param_names)

    def compute(self, estimates: np.ndarray, truths: np.ndarray,
                stds: Optional[np.ndarray] = None) -> Dict:
        """estimates/truths [N, P]; stds [N, P] posterior widths (for
        normalized bias). Returns per-parameter bias stats + significance."""
        est = np.asarray(estimates, dtype=np.float64)
        tru = np.asarray(truths, dtype=np.float64)
        err = est - tru
        out = {}
        for j, name in enumerate(self.param_names):
            e = err[:, j]
            n = len(e)
            mean_bias = float(e.mean())
            sem = float(e.std(ddof=1) / np.sqrt(max(n, 2)))
            z = mean_bias / max(sem, 1e-30)
            rec = {
                "mean_bias": mean_bias,
                "median_bias": float(np.median(e)),
                "std": float(e.std()),
                "mae": float(np.abs(e).mean()),
                "frac_err_median": float(np.median(
                    np.abs(e) / np.maximum(np.abs(tru[:, j]), 1e-9))),
                "bias_significance_z": float(z),
                "significant": bool(abs(z) > 3.0),
            }
            if stds is not None:
                rec["normalized_bias"] = float(
                    np.mean(e / np.maximum(stds[:, j], 1e-12)))
            out[name] = rec
        return out


class PerformanceMetrics:
    """Timing/throughput/accuracy aggregation with letter grades
    (reference: metrics.py:352+)."""

    GRADES = ((0.9, "A"), (0.75, "B"), (0.6, "C"), (0.4, "D"), (0.0, "F"))

    def __init__(self):
        self.records: List[Dict] = []

    def record(self, wall_time_s: float, n_samples: int,
               accuracy_score: float = 1.0, **extra):
        self.records.append({"wall_time_s": wall_time_s,
                             "n_samples": n_samples,
                             "accuracy_score": accuracy_score, **extra})

    def summary(self) -> Dict:
        if not self.records:
            return {}
        t = np.array([r["wall_time_s"] for r in self.records])
        n = np.array([r["n_samples"] for r in self.records])
        acc = np.array([r["accuracy_score"] for r in self.records])
        thr = n.sum() / max(t.sum(), 1e-12)
        score = float(np.clip(acc.mean(), 0, 1))
        grade = next(g for thresh, g in self.GRADES if score >= thresh)
        return {"mean_wall_time_s": float(t.mean()),
                "median_wall_time_s": float(np.median(t)),
                "throughput_per_s": float(thr),
                "accuracy_score": score, "grade": grade,
                "n_runs": len(self.records)}

    @classmethod
    def scalability(cls, sizes: Sequence[float],
                    throughputs: Sequence[float]) -> Dict:
        """Scaling-efficiency grade from a (problem size, throughput)
        curve (reference PerformanceMetrics scalability grading,
        metrics.py:352+): efficiency = measured throughput at the largest
        size / throughput at the smallest size (ideal strong scaling for
        a per-item rate is a FLAT curve; falling = super-linear cost)."""
        s = np.asarray(sizes, dtype=np.float64)
        thr = np.asarray(throughputs, dtype=np.float64)
        order = np.argsort(s)
        s, thr = s[order], thr[order]
        eff = float(thr[-1] / max(thr[0], 1e-12))
        score = float(np.clip(eff, 0.0, 1.0))
        grade = next(g for thresh, g in cls.GRADES if score >= thresh)
        return {"sizes": s.tolist(), "throughputs": thr.tolist(),
                "scaling_efficiency": eff, "grade": grade,
                "peak_throughput": float(thr.max()),
                "best_size": float(s[int(np.argmax(thr))])}


class RecoveryMetrics:
    """Multi-criteria matching of recovered signals to injections ->
    precision/recall/F1 (reference RecoveryMetrics)."""

    def __init__(self, mc_tol: float = 0.2, time_tol: float = 0.1):
        self.mc_tol = mc_tol
        self.time_tol = time_tol

    @staticmethod
    def _mc(p):
        return (p[0] * p[1]) ** 0.6 / (p[0] + p[1]) ** 0.2

    def match(self, recovered: np.ndarray, injected: np.ndarray) -> Dict:
        """recovered [R, P] median params; injected [I, P] truth.
        Greedy best-match within chirp-mass + merger-time tolerance."""
        rec = np.atleast_2d(recovered)
        inj = np.atleast_2d(injected)
        used = set()
        matches = []
        for i, t in enumerate(inj):
            best, best_d = None, np.inf
            for r, e in enumerate(rec):
                if r in used:
                    continue
                mc_t, mc_r = self._mc(t), self._mc(e)
                d_mc = abs(mc_r - mc_t) / max(mc_t, 1e-9)
                d_t = abs(e[8] - t[8])
                if d_mc < self.mc_tol and d_t < self.time_tol:
                    d = d_mc + d_t
                    if d < best_d:
                        best, best_d = r, d
            if best is not None:
                used.add(best)
                matches.append((best, i))
        tp = len(matches)
        fp = len(rec) - tp
        fn = len(inj) - tp
        precision = tp / max(tp + fp, 1)
        recall = tp / max(tp + fn, 1)
        f1 = 2 * precision * recall / max(precision + recall, 1e-12)
        return {"matches": matches, "n_recovered": len(rec),
                "n_injected": len(inj), "precision": precision,
                "recall": recall, "f1": f1}


class ComparisonMetrics:
    """Pairwise method comparison on shared events: per-parameter KL (1-D
    Gaussian approx), Wasserstein-1, median offset in σ, width ratio — the
    quantities benchmark_real_events.py reports (reference scripts §2.9)."""

    def compare_posteriors(self, samples_a: np.ndarray,
                           samples_b: np.ndarray,
                           param_names=PARAM_NAMES) -> Dict:
        from scipy.stats import wasserstein_distance
        out = {}
        for j, name in enumerate(param_names):
            a, b = samples_a[:, j], samples_b[:, j]
            mu_a, mu_b = a.mean(), b.mean()
            s_a, s_b = max(a.std(), 1e-12), max(b.std(), 1e-12)
            kl = (np.log(s_b / s_a) + (s_a ** 2 + (mu_a - mu_b) ** 2)
                  / (2 * s_b ** 2) - 0.5)
            out[name] = {
                "kl_gauss": float(kl),
                "wasserstein": float(wasserstein_distance(a, b)),
                "median_offset_sigma": float(
                    (np.median(a) - np.median(b)) / s_b),
                "width_ratio": float(
                    (np.quantile(a, 0.95) - np.quantile(a, 0.05))
                    / max(np.quantile(b, 0.95) - np.quantile(b, 0.05),
                          1e-12)),
                "js_divergence": self._js_hist(a, b),
            }
        return out

    @staticmethod
    def _js_hist(a: np.ndarray, b: np.ndarray, bins: int = 64) -> float:
        """Histogram Jensen-Shannon divergence (nats) on the union
        support — robust to multimodality where the Gaussian-approx KL
        is blind."""
        lo = min(a.min(), b.min())
        hi = max(a.max(), b.max())
        if not np.isfinite(lo) or hi <= lo:
            return 0.0
        pa, _ = np.histogram(a, bins=bins, range=(lo, hi), density=False)
        pb, _ = np.histogram(b, bins=bins, range=(lo, hi), density=False)
        pa = pa / max(pa.sum(), 1)
        pb = pb / max(pb.sum(), 1)
        m = 0.5 * (pa + pb)
        def _kl(p, q):
            mask = p > 0
            return float(np.sum(p[mask] * np.log(p[mask] / q[mask])))
        return 0.5 * _kl(pa, m) + 0.5 * _kl(pb, m)

    @staticmethod
    def summarize(comparison: Dict) -> Dict:
        """Aggregate a compare_posteriors dict across parameters: the
        headline numbers benchmark_real_events reports per event."""
        if not comparison:
            return {}
        offs = [abs(c["median_offset_sigma"]) for c in comparison.values()]
        return {
            "mean_abs_offset_sigma": float(np.mean(offs)),
            "max_abs_offset_sigma": float(np.max(offs)),
            "mean_js": float(np.mean([c["js_divergence"]
                                      for c in comparison.values()])),
            "mean_width_ratio": float(np.mean(
                [c["width_ratio"] for c in comparison.values()])),
            "n_params": len(comparison),
        }
