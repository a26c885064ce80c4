"""Evaluation-layer tests (reference analogs: metrics.py, validation.py,
benchmarks.py, noise_analysis.py) + core subtract-and-reinfer machinery."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posteriflow_tpu import PARAM_NAMES
from posteriflow_tpu.core.calibrator import OutputCalibrator
from posteriflow_tpu.core.subtractor import AdaptiveSubtractor
from posteriflow_tpu.evaluation import (BiasMetrics, ComparisonMetrics,
                                        NoiseAnalyzer, PerformanceMetrics,
                                        RecoveryMetrics, ResultValidator,
                                        SimpleIterativeSubtraction,
                                        StandardHierarchicalSubtraction)
from posteriflow_tpu.inference.preprocessing import prepare_simulated
from posteriflow_tpu.inference.result import PosteriorResult

BBH = {"mass_1": 36.0, "mass_2": 29.0, "luminosity_distance": 400.0,
       "ra": 1.0, "dec": -0.5, "theta_jn": 0.5, "psi": 0.3, "phase": 1.0,
       "geocent_time": 0.2, "a1": 0.1, "a2": 0.05}
TRUTH = np.array([[BBH[k] for k in PARAM_NAMES]], dtype=np.float32)


def _fake_samples(n=500, seed=0):
    rng = np.random.default_rng(seed)
    s = np.column_stack([
        rng.uniform(30, 40, n), rng.uniform(25, 30, n),
        rng.uniform(300, 500, n), rng.uniform(0, 6.28, n),
        rng.uniform(-1.5, 1.5, n), rng.uniform(0, 3.14, n),
        rng.uniform(0, 3.14, n), rng.uniform(0, 6.28, n),
        rng.uniform(-1.5, 1.5, n), rng.uniform(0, 0.99, n),
        rng.uniform(0, 0.99, n)])
    return s


def test_bias_metrics():
    rng = np.random.default_rng(0)
    truths = np.abs(rng.normal(30, 5, (200, 11))) + 1
    ests = truths + 0.5                     # constant bias
    out = BiasMetrics().compute(ests, truths)
    assert out["mass_1"]["mean_bias"] == pytest.approx(0.5, abs=1e-6)
    assert out["mass_1"]["significant"]     # 0.5 bias with 0 scatter


def test_performance_metrics_grades():
    pm = PerformanceMetrics()
    pm.record(1.0, 1000, accuracy_score=0.95)
    pm.record(2.0, 1000, accuracy_score=0.92)
    s = pm.summary()
    assert s["grade"] == "A"
    assert s["throughput_per_s"] == pytest.approx(2000 / 3.0)


def test_recovery_metrics_matching():
    inj = np.vstack([TRUTH[0], TRUTH[0]])
    inj[1, 0], inj[1, 1], inj[1, 8] = 60.0, 50.0, -0.8
    rec = inj.copy()
    rec[0, 0] += 1.0                        # close enough
    out = RecoveryMetrics().match(rec, inj)
    assert out["precision"] == 1.0 and out["recall"] == 1.0
    # a recovered ghost hurts precision
    rec_extra = np.vstack([rec, rec[0] * 2.0])
    out2 = RecoveryMetrics().match(rec_extra, inj)
    assert out2["precision"] < 1.0 and out2["recall"] == 1.0


def test_comparison_metrics_identical_is_zero():
    a = _fake_samples()
    out = ComparisonMetrics().compare_posteriors(a, a.copy())
    assert abs(out["mass_1"]["kl_gauss"]) < 1e-9
    assert abs(out["mass_1"]["median_offset_sigma"]) < 1e-9
    assert out["mass_1"]["width_ratio"] == pytest.approx(1.0)


def test_result_validator():
    good = PosteriorResult(samples=_fake_samples())
    v = ResultValidator().validate(good)
    assert v["valid"], v["issues"]
    bad_s = _fake_samples()
    bad_s[0, 0] = np.nan
    bad = PosteriorResult(samples=bad_s)
    v2 = ResultValidator().validate(bad)
    assert not v2["valid"]


def test_noise_analyzer_separates_gaussian_from_liney():
    rng = np.random.default_rng(0)
    t = np.arange(16384) / 4096.0
    gauss = rng.standard_normal(16384)
    liney = gauss + 4.0 * np.sin(2 * np.pi * 60 * t) \
        + 3.0 * np.sin(2 * np.pi * 120 * t)
    na = NoiseAnalyzer()
    g = na.analyze(gauss)
    l = na.analyze(liney)
    assert g["n_lines"] <= 1
    assert l["n_lines"] >= 2
    assert g["gaussianity_score"] >= l["gaussianity_score"]


def test_subtractor_removes_injected_signal():
    """Subtracting the TRUE template must remove ~all signal power."""
    prep = prepare_simulated([BBH], seed=7, add_noise=False)
    sub = AdaptiveSubtractor()
    draws = np.repeat(TRUTH, 64, axis=0)    # delta posterior at truth
    out = sub.subtract(prep.strain, draws)
    sig_power = float((prep.strain ** 2).sum())
    res_power = float((out["residual"] ** 2).sum())
    assert out["accepted"]
    assert out["alpha"] == pytest.approx(1.0, abs=0.05)
    assert res_power < 0.02 * sig_power, (res_power, sig_power)


def test_hierarchical_baselines_order_by_loudness():
    two = [BBH, {**BBH, "mass_1": 15.0, "mass_2": 12.0,
                 "luminosity_distance": 1200.0, "geocent_time": -0.7}]
    prep = prepare_simulated(two, seed=8, add_noise=False)
    cands = np.array([[p[k] for k in PARAM_NAMES] for p in two],
                     dtype=np.float32)
    out = StandardHierarchicalSubtraction().decompose(prep.strain, cands)
    assert out["order"][0] == 0             # louder candidate first
    assert out["extracted"][0]["fit_snr"] > 5.0

    # both baselines must remove nearly all signal power given the truth
    data_power = float((prep.strain ** 2).sum())
    out2 = SimpleIterativeSubtraction().decompose(prep.strain, cands)
    assert out["residual_power"] < 0.01 * data_power
    assert out2["residual_power"] < 0.01 * data_power


def test_output_calibrator_modes():
    rng = np.random.default_rng(0)
    s = rng.normal(0, 1, 200)
    t = 2.0 * s + 3.0
    for mode in ("learned", "minmax", "percentile"):
        cal = OutputCalibrator().fit(s, t, mode=mode)
        err = np.abs(cal(s) - t).mean()
        assert err < 0.5, (mode, err)


def test_pod_batched_decompose():
    """Pod-scale subtract-and-reinfer: batched stages run, gates mask."""
    from posteriflow_tpu.core.pod import make_batched_decompose
    from posteriflow_tpu.models.npe import NPEConfig
    from posteriflow_tpu.physics.simulator import SimConfig, simulate_batch
    from posteriflow_tpu.prior import PriorConfig
    from posteriflow_tpu.train.trainer import TrainConfig, init_state

    cfg = TrainConfig(
        npe=NPEConfig(context_dim=32, rank_dim=8, flow_layers=2,
                      flow_hidden=32, flow_bins=4, encoder_type="conv",
                      d_model=32, enc_layers=1, enc_heads=4),
        sim=SimConfig(prior=PriorConfig(max_signals=2)))
    state = init_state(jax.random.PRNGKey(0), cfg)
    batch = jax.jit(lambda k: simulate_batch(k, 4, cfg.sim))(
        jax.random.PRNGKey(1))
    decompose = make_batched_decompose(cfg, n_samples=64, max_stages=2,
                                       n_template_draws=16)
    out = decompose(state.params, batch.strain, batch.asd_bands,
                    jax.random.PRNGKey(2))
    assert out["median"].shape == (4, 2, 11)
    assert out["n_extracted"].shape == (4,)
    assert np.isfinite(np.asarray(out["final_residual"])).all()
    # untrained model -> low quality -> gate stops extraction quickly
    assert (np.asarray(out["n_extracted"]) <= 2).all()


def test_validate_dataset(tmp_path):
    import jax as _jax
    from posteriflow_tpu.data.io import DatasetWriter, validate_dataset
    from posteriflow_tpu.physics.simulator import SimConfig, simulate_batch
    b = _jax.jit(lambda k: simulate_batch(k, 32, SimConfig()))(
        _jax.random.PRNGKey(0))
    with DatasetWriter(tmp_path / "d.h5") as w:
        w.append_batch({
            "strain": np.asarray(b.strain, dtype=np.float16),
            "params": np.asarray(b.params),
            "n_sig": np.asarray(b.n_sig, dtype=np.int32),
            "net_snr": np.asarray(b.net_snr),
            "sig_snr": np.asarray(b.sig_snr)})
    rep = validate_dataset(tmp_path / "d.h5")
    assert rep["valid"], rep["issues"]
    assert rep["n_checked"] == 32


def test_pod_decompose_sharded_matches_unsharded():
    """The mesh-sharded pod decompose equals the single-device program."""
    from posteriflow_tpu.core.pod import make_batched_decompose
    from posteriflow_tpu.models.npe import NPEConfig
    from posteriflow_tpu.parallel.mesh import make_mesh
    from posteriflow_tpu.physics.simulator import SimConfig, simulate_batch
    from posteriflow_tpu.prior import PriorConfig
    from posteriflow_tpu.train.trainer import TrainConfig, init_state

    cfg = TrainConfig(
        npe=NPEConfig(context_dim=32, rank_dim=8, flow_layers=2,
                      flow_hidden=32, flow_bins=4, encoder_type="conv",
                      d_model=32, enc_layers=1, enc_heads=4),
        sim=SimConfig(prior=PriorConfig(max_signals=2)))
    state = init_state(jax.random.PRNGKey(0), cfg)
    batch = jax.jit(lambda k: simulate_batch(k, 8, cfg.sim))(
        jax.random.PRNGKey(1))
    plain = make_batched_decompose(cfg, n_samples=32, max_stages=2,
                                   n_template_draws=8)
    mesh = make_mesh(8)
    sharded = make_batched_decompose(cfg, n_samples=32, max_stages=2,
                                     n_template_draws=8, mesh=mesh)
    o1 = plain(state.params, batch.strain, batch.asd_bands,
               jax.random.PRNGKey(2))
    o2 = sharded(state.params, batch.strain, batch.asd_bands,
                 jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(o1["median"]),
                               np.asarray(o2["median"]), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(o1["n_extracted"]),
                                  np.asarray(o2["n_extracted"]))


def test_bias_corrector_trains_and_corrects():
    """fit_synthetic must learn the injected stage-dependent bias pattern
    and validate() must show post-correction improvement with honest
    z-scores; correct() preserves sample correlations and mass ordering
    (reference machinery: bias_corrector.py:1049,1324)."""
    import jax
    import numpy as np
    from posteriflow_tpu.core.bias_corrector import BiasCorrector
    from posteriflow_tpu.prior import sample_prior_bbh

    bc = BiasCorrector()
    loss = bc.fit_synthetic(jax.random.PRNGKey(0), n_events=2048,
                            n_steps=300)
    assert np.isfinite(loss)

    # held-out pairs with the same corruption pattern
    rng = np.random.default_rng(9)
    theta = sample_prior_bbh(rng, 512)
    import jax.numpy as jnp
    y_true = np.asarray(bc.scaler.normalize(jnp.asarray(theta,
                                                        jnp.float32)))
    stage = np.full(512, 2.0, np.float32)
    feats = np.stack([stage, np.full(512, 0.5, np.float32),
                      np.full(512, 0.8, np.float32),
                      np.full(512, 0.7, np.float32)], axis=1)
    amp = 0.03 * 2.0 * (1.2 - 0.5)
    y_est = y_true.copy()
    y_est[:, 0] -= amp
    y_est[:, 1] += amp
    y_est[:, 2] += 0.8 * amp
    rep = bc.validate(y_est.astype(np.float32), feats,
                      y_true.astype(np.float32))
    assert rep["post_abs_bias"][0] < rep["pre_abs_bias"][0]
    assert rep["post_abs_bias"][2] < rep["pre_abs_bias"][2]
    assert 0.2 < float(np.median(rep["z_std"])) < 5.0

    # correct(): mass ordering + correlation preservation
    rng2 = np.random.default_rng(1)
    base = rng2.multivariate_normal(
        [30.0, 20.0], [[4.0, 1.8], [1.8, 1.0]], 800)
    samples = np.column_stack(
        [base[:, 0], base[:, 1], rng2.uniform(300, 900, 800)]
        + [rng2.uniform(0.1, 0.9, 800) for _ in range(8)])
    out = bc.correct(samples, stage=2, quality=0.5, alpha=0.8,
                     residual_ratio=0.7)
    assert out["applied"]
    s = out["samples"]
    assert (s[:, 0] >= s[:, 1] - 1e-6).all()
    c_in = np.corrcoef(samples[:, 0], samples[:, 1])[0, 1]
    c_out = np.corrcoef(s[:, 0], s[:, 1])[0, 1]
    assert abs(c_in - c_out) < 0.25, (c_in, c_out)


def test_js_divergence_and_summarize():
    """JS: 0 for identical samples, larger for separated ones, bounded by
    log 2; summarize aggregates the per-param dict."""
    import numpy as np

    from posteriflow_tpu.evaluation.metrics import ComparisonMetrics
    rng = np.random.default_rng(0)
    a = rng.normal(0, 1, (4000, 11))
    b = rng.normal(0, 1, (4000, 11))
    c = ComparisonMetrics().compare_posteriors(a, b)
    js_same = [v["js_divergence"] for v in c.values()]
    assert max(js_same) < 0.02, max(js_same)
    b2 = b + 5.0
    c2 = ComparisonMetrics().compare_posteriors(a, b2)
    js_far = [v["js_divergence"] for v in c2.values()]
    assert min(js_far) > 0.5 and max(js_far) <= np.log(2) + 1e-9
    s = ComparisonMetrics.summarize(c2)
    assert s["n_params"] == 11 and s["mean_abs_offset_sigma"] > 3.0


def test_scalability_grading():
    from posteriflow_tpu.evaluation.metrics import PerformanceMetrics
    flat = PerformanceMetrics.scalability([64, 128, 256],
                                          [9000, 9100, 9050])
    assert flat["grade"] == "A" and flat["scaling_efficiency"] > 0.9
    falling = PerformanceMetrics.scalability([64, 128, 256],
                                             [9000, 7000, 4000])
    assert falling["grade"] in ("D", "F")
    assert falling["best_size"] == 64.0


def test_soft_match_scoring_and_failure_analysis():
    """Soft multi-criteria matching (reference metrics.py:751-949):
    perfect recovery scores ~1, a wrong-sky recovery loses exactly the
    sky component, misses are diagnosed as loudness-biased."""
    rm = RecoveryMetrics()
    s = rm.match_score(TRUTH[0], TRUTH[0])
    assert s["score"] > 0.99 and min(s.values()) > 0.99

    off_sky = TRUTH[0].copy()
    off_sky[3] += 2.0                      # ~2 rad away on the sky
    s2 = rm.match_score(off_sky, TRUTH[0])
    assert s2["sky"] < 0.05 and s2["mass"] > 0.99
    assert s2["score"] == pytest.approx(
        0.4 * s2["mass"] + 0.3 * s2["time"] + 0.2 * s2["sky"]
        + 0.1 * s2["distance"], abs=1e-9)

    # two injections, only the loud one recovered -> recall 0.5 and the
    # failure analysis flags the miss as the quieter signal
    quiet = TRUTH[0].copy()
    quiet[2] = 2000.0                      # far -> quiet
    quiet[8] = -0.9
    inj = np.vstack([TRUTH[0], quiet])
    soft = rm.match_soft(TRUTH, inj)
    assert soft["recall"] == pytest.approx(0.5)
    assert soft["precision"] == pytest.approx(1.0)
    fa = RecoveryMetrics.failure_analysis(soft, inj)
    assert fa["n_missed"] == 1 and fa["missed_indices"] == [1]
    assert fa["misses_are_quieter"]
    assert fa["weakest_component"] in ("mass", "time", "sky", "distance")


def test_compare_methods_ranking_and_significance():
    """Multi-method comparison (reference metrics.py:1157-1465): the
    more accurate method wins pairwise and ranks first; the paired test
    flags a consistent accuracy gap on shared events."""
    rng = np.random.default_rng(0)
    npe = {"accuracy": (0.9 + 0.02 * rng.standard_normal(20)).tolist(),
           "wall_time_s": [0.5] * 20}
    sampler = {"accuracy": (0.7 + 0.02 * rng.standard_normal(20)).tolist(),
               "wall_time_s": [400.0] * 20}
    out = ComparisonMetrics().compare_methods(
        {"npe": npe, "sampler": sampler})
    pw = out["pairwise"]["npe_vs_sampler"]
    assert pw["winner"] == "npe"
    assert pw["timing"]["winner"] == "npe"
    assert pw["timing"]["speedup"] > 100
    assert out["ranking"][0]["method"] == "npe"
    sig = out["significance"]["npe_vs_sampler"]
    assert sig["significant"] and sig["mean_diff"] > 0.1

    # identical methods: no significance, tie verdicts
    out2 = ComparisonMetrics().compare_methods({"a": npe, "b": npe})
    assert not out2["significance"]["a_vs_b"]["significant"]
    assert out2["pairwise"]["a_vs_b"]["winner"] == "tie"


def test_bias_overall_rollup():
    rng = np.random.default_rng(0)
    truths = np.abs(rng.normal(30, 5, (400, 11))) + 1
    ests = truths + rng.normal(0, 0.1, truths.shape)
    ests[:, 2] += 3.0                      # one strongly biased param
    pb = BiasMetrics().compute(ests, truths)
    roll = BiasMetrics.overall(pb)
    assert roll["worst_param"] == "luminosity_distance"
    assert "luminosity_distance" in roll["significant_params"]
    assert np.isfinite(pb["mass_1"]["skewness"])
    assert np.isfinite(pb["mass_1"]["kurtosis_excess"])
