"""End-to-end inference-stack tests: checkpoint -> engine -> infer() ->
PosteriorResult, plus OOD / gate / ranking / importance machinery
(reference analogs: pipeline.py, ood.py, gating.py, ranking.py,
importance.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from posteriflow_tpu import PARAM_NAMES
from posteriflow_tpu.inference import (ContextStats, PosteriorResult,
                                       confidence_verdict,
                                       fit_context_stats, importance_correct,
                                       infer, infer_overlapping,
                                       make_log_likelihood, prepare_simulated,
                                       rank_overlapping, refinement_gate,
                                       score_context)
from posteriflow_tpu.inference.pipeline import InferenceEngine
from posteriflow_tpu.models.npe import NPEConfig
from posteriflow_tpu.models.priority_net import (PriorityNet, ranking_loss,
                                                 rank_by_score)
from posteriflow_tpu.physics.simulator import SimConfig
from posteriflow_tpu.prior import PriorConfig
from posteriflow_tpu.train.checkpoints import CheckpointManager
from posteriflow_tpu.train.trainer import TrainConfig, init_state

TINY = TrainConfig(
    npe=NPEConfig(context_dim=32, rank_dim=8, flow_layers=2, flow_hidden=32,
                  flow_bins=4, encoder_type="conv", d_model=32,
                  enc_layers=1, enc_heads=4),
    sim=SimConfig(prior=PriorConfig(max_signals=2)),
    batch_size=8, warmup_steps=5, total_steps=50)

BBH = {"mass_1": 36.0, "mass_2": 29.0, "luminosity_distance": 400.0,
       "ra": 1.0, "dec": -0.5, "theta_jn": 0.5, "psi": 0.3, "phase": 1.0,
       "geocent_time": 0.2, "a1": 0.1, "a2": 0.05}


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    root = tmp_path_factory.mktemp("ckpt")
    state = init_state(jax.random.PRNGKey(0), TINY)
    cm = CheckpointManager(root)
    cm.save("best", state, TINY, {"val_nll": 0.0}, epoch=1)
    return InferenceEngine.from_checkpoint(root, "best")


def test_prepare_simulated_truth_roundtrip():
    prep = prepare_simulated([BBH], seed=1)
    assert prep.strain.shape == (3, 16384)
    assert prep.truth.shape == (1, 11)
    np.testing.assert_allclose(prep.truth[0][:3],
                               [36.0, 29.0, 400.0], rtol=1e-5)
    assert 0.8 < np.std(prep.strain) < 2.5


def test_from_checkpoint_with_armed_ood(tmp_path):
    """Regression: a CheckpointManager dir that SHIPS ood_stats.npz must
    load with the stats armed — a function-local ContextStats import in
    the release branch used to shadow the module-level name and raise
    UnboundLocalError exactly when ood_stats.npz existed (the production
    layout validate_checkpoint writes)."""
    state = init_state(jax.random.PRNGKey(0), TINY)
    cm = CheckpointManager(tmp_path)
    cm.save("best", state, TINY, {"val_nll": 0.0}, epoch=1)
    stats = fit_context_stats(np.random.default_rng(0)
                              .normal(size=(64, 32)).astype(np.float32))
    stats.save(tmp_path / "ood_stats.npz")
    eng = InferenceEngine.from_checkpoint(tmp_path, "best")
    assert eng.ood_stats is not None


def test_infer_end_to_end(engine):
    res = infer(engine, inject=[BBH], n_samples=256, seed=0)
    assert res.samples.shape == (256, 11)
    assert np.isfinite(res.samples).all()
    assert np.isfinite(res.log_prob).all()
    # m1 >= m2 enforced
    assert (res.samples[:, 0] >= res.samples[:, 1] - 1e-5).all()
    # samples respect physical bounds (scaler wrap/denorm)
    assert (res.samples[:, 2] >= 40.0).all()          # distance
    assert res.verdict in ("HIGH", "MEDIUM", "LOW")
    assert "refine" in res.gate
    assert res.diagnostics["draws_per_sec"] > 0
    s = res.summary()
    assert "mass_1" in s and "rank=0" in s


def test_infer_overlapping_and_ranking(engine):
    two = [BBH, {**BBH, "mass_1": 50.0, "mass_2": 45.0,
                 "luminosity_distance": 900.0, "geocent_time": -0.4}]
    prep = prepare_simulated(two, seed=2)
    results = infer_overlapping(engine, data=prep, n_signals=2,
                                n_samples=128)
    assert len(results) == 2
    assert results[0].rank == 0 and results[1].rank == 1
    order, scores = rank_overlapping(results, prep.strain)
    assert sorted(order) == [0, 1]
    assert len(scores) == 2


def test_result_summaries_and_save(tmp_path, engine):
    res = infer(engine, inject=[BBH], n_samples=128, seed=3)
    med = res.median()
    ci = res.credible_interval(0.9)
    assert med.shape == (11,)
    assert (ci[:, 0] <= ci[:, 1] + 1e-9).all()
    assert np.isfinite(res.covariance()).all()
    corr = res.correlation()
    np.testing.assert_allclose(np.diag(corr), 1.0, atol=1e-5)
    out = res.save(tmp_path / "r")
    assert (out / "samples.npy").exists()
    assert (out / "result.json").exists()
    assert (out / "summary.csv").exists()
    rw, ess = res.reweight_to_uniform_masses()
    assert 1.0 <= ess <= len(res.samples)


def test_ood_scoring():
    rng = np.random.default_rng(0)
    ctx = rng.standard_normal((500, 16))
    stats = fit_context_stats(ctx)
    d_in, pct_in = score_context(stats, rng.standard_normal(16))
    d_out, pct_out = score_context(stats, 10.0 * np.ones(16))
    assert pct_out[0] > pct_in[0]
    assert pct_out[0] >= 99.0
    assert confidence_verdict(50.0, 0.0, []) == "HIGH"
    assert confidence_verdict(99.5, 0.25, ["glitch"]) == "LOW"


def test_refinement_gate_logic():
    rng = np.random.default_rng(1)
    samples = np.column_stack([
        rng.uniform(30, 40, 500), rng.uniform(25, 30, 500),
        rng.uniform(300, 500, 500)] + [rng.uniform(0, 1, 500)
                                       for _ in range(8)])
    ok = refinement_gate("HIGH", 50.0, 0.0, samples)
    assert not ok["refine"]
    bad = refinement_gate("LOW", 100.0, 0.5, samples)
    assert bad["refine"] and len(bad["reasons"]) >= 2


def test_bias_map_cell_trips_distrust():
    """A posterior whose median lands in a measured severe-bias twin-grid
    cell must trip parameter-level distrust with the CELL cited (round-1
    gap: the bias map was never loaded — VERDICT item 7)."""
    from posteriflow_tpu.inference.gating import bias_region
    # synthetic grid with one severe cell at (mc=12, q=0.35) — independent
    # of the committed artifact, which is regenerated per flagship
    bias_map = {"grid": [
        {"mc": 12.0, "q": 0.35, "mc_bias_frac_mean": 0.34,
         "q_bias_mean": -0.10},
        {"mc": 30.0, "q": 0.75, "mc_bias_frac_mean": 0.02,
         "q_bias_mean": 0.05},
    ]}
    rng = np.random.default_rng(2)
    m1 = rng.normal(20.0, 0.5, 500)
    m2 = rng.normal(7.0, 0.3, 500)
    samples = np.column_stack([m1, m2, rng.uniform(300, 500, 500)]
                              + [rng.uniform(0, 1, 500) for _ in range(8)])
    region = bias_region(10.0, 0.35, bias_map)
    assert region["severe_mass_bias"], region
    assert not bias_region(29.0, 0.76, bias_map)["severe_mass_bias"]
    out = refinement_gate("HIGH", 50.0, 0.0, samples, bias_map=bias_map)
    assert out["distrust"] == ["mass_1", "mass_2"]
    assert any("bias cell" in r for r in out["reasons"]), out["reasons"]
    assert out["refine"]


def test_importance_correction_on_injection(engine):
    prep = prepare_simulated([BBH], seed=4)
    res = infer(engine, data=prep, n_samples=256, seed=4)
    ctx = engine.encode(jnp.asarray(prep.strain)[None],
                        jnp.asarray(prep.asd_bands)[None])
    log_l = make_log_likelihood(prep.strain)
    out = importance_correct(engine, ctx[0], 0, res.samples, res.log_prob,
                             res.railed, log_l, max_stages=2,
                             pad_block=256)
    assert out.samples.shape[1] == 11
    assert np.isfinite(out.weights).all()
    assert 0.0 < out.ess <= len(out.samples)
    assert abs(out.weights.sum() - 1.0) < 1e-6


def test_tempered_ladder_on_injection(engine):
    """Forced tempered path on a low-SNR injection with an UNTRAINED tiny
    flow: an extreme case the ladder may legitimately fail to bridge (the
    reference raises here) — but the diagnostics must stay non-degenerate
    and honest (round-1 bug: flat final weights → efficiency 1.0,
    logZ 0.0, converged-looking output)."""
    weak = dict(BBH, luminosity_distance=1800.0)
    prep = prepare_simulated([weak], seed=6)
    res = infer(engine, data=prep, n_samples=1024, seed=6)
    ctx = engine.encode(jnp.asarray(prep.strain)[None],
                        jnp.asarray(prep.asd_bands)[None])
    log_l = make_log_likelihood(prep.strain)
    # pad_block keeps every ladder stage at 1024 likelihood evaluations —
    # the production 4096 floor is a single-CPU-core suite killer (~3 ms
    # per [3, 8193] waveform: 10 stages x 8192 evals measured >25 min)
    tempered = importance_correct(engine, ctx[0], 0, res.samples,
                                  res.log_prob, res.railed, log_l,
                                  min_ess_frac=0.999, max_stages=6,
                                  pad_block=1024)
    assert isinstance(tempered.converged, bool)
    if tempered.converged:
        assert tempered.beta_ladder[-1] >= 1.0 - 1e-6
    assert np.isfinite(tempered.log_evidence_ratio)
    assert tempered.log_evidence_ratio != 0.0
    assert 0.0 < tempered.efficiency < 1.0 - 1e-9  # no flat final weights
    assert abs(tempered.weights.sum() - 1.0) < 1e-6


def test_tempered_ladder_matches_direct_is():
    """Exactness: with the BBH prior itself as proposal and a mild
    synthetic likelihood, direct IS is reliable — the forced tempered
    ladder must reproduce its evidence and posterior mean."""
    from posteriflow_tpu.inference.importance import (_finalize,
                                                      _tempered_is)
    from posteriflow_tpu.prior import (BBH as BBH_T, _DIST_HI, _DIST_LO,
                                       _MASS_HI, _MASS_LO, _SPIN1_HI,
                                       _T_OFF_HI, _T_OFF_LO, log_prior_bbh)
    rng = np.random.default_rng(7)
    n = 4000
    lm = rng.uniform(np.log(_MASS_LO[BBH_T]), np.log(_MASS_HI[BBH_T]), n)
    m1 = np.exp(lm)
    m2 = np.exp(rng.uniform(np.log(_MASS_LO[BBH_T]), lm))
    d = (_DIST_LO[BBH_T] ** 3 + rng.uniform(0, 1, n)
         * (_DIST_HI[BBH_T] ** 3 - _DIST_LO[BBH_T] ** 3)) ** (1 / 3)
    theta = np.column_stack([
        m1, m2, d, rng.uniform(0, 2 * np.pi, n),
        np.arcsin(rng.uniform(-1, 1, n)), np.arccos(rng.uniform(-1, 1, n)),
        rng.uniform(0, np.pi, n), rng.uniform(0, 2 * np.pi, n),
        rng.uniform(_T_OFF_LO, _T_OFF_HI, n),
        rng.uniform(0, _SPIN1_HI[BBH_T], n),
        rng.uniform(0, _SPIN1_HI[BBH_T], n)]).astype(np.float64)

    def log_l_fn(t):
        return (-0.5 * ((t[:, 0] - 35.0) / 2.0) ** 2
                - 0.5 * ((t[:, 2] - 800.0) / 100.0) ** 2)

    log_prior_fn = jax.jit(jax.vmap(log_prior_bbh))
    lp = np.asarray(log_prior_fn(jnp.asarray(theta, jnp.float32)),
                    np.float64)
    ll = np.asarray(log_l_fn(theta))
    direct = _finalize(theta.astype(np.float32), ll)   # q = prior: w = L
    assert direct.ess > 20.0
    tempered = _tempered_is(theta, lp.copy(), ll, lp, log_l_fn,
                            log_prior_fn, max_stages=25, seed=3)
    assert tempered.converged, tempered.beta_ladder
    assert tempered.n_stages > 1          # the ladder actually tempered
    assert 0.0 < tempered.efficiency < 1.0 - 1e-9
    assert abs(tempered.log_evidence_ratio
               - direct.log_evidence_ratio) < 1.5
    mean_direct = np.sum(direct.weights * direct.samples[:, 0])
    mean_temp = np.sum(tempered.weights * tempered.samples[:, 0])
    assert abs(mean_direct - mean_temp) < 2.0


def test_likelihood_peaks_at_truth():
    """The Whittle likelihood must prefer the injected parameters over a
    wrong-mass alternative (noise-free injection)."""
    prep = prepare_simulated([BBH], seed=5, add_noise=False)
    log_l = make_log_likelihood(prep.strain)
    truth = np.array([[BBH[k] for k in PARAM_NAMES]], dtype=np.float32)
    wrong = truth.copy()
    wrong[0, 0], wrong[0, 1] = 80.0, 10.0
    ll = np.asarray(log_l(jnp.asarray(np.vstack([truth, wrong]))))
    assert ll[0] > ll[1] + 10.0, ll
    assert ll[0] > 0.0          # matched template beats noise-only model


def test_priority_net_shapes_and_loss():
    net = PriorityNet(d_model=32, n_heads=4, n_layers=1)
    segs = jnp.zeros((2, 3, 3, 2048))
    params = jnp.abs(jax.random.normal(jax.random.PRNGKey(0), (2, 3, 11))) \
        + 1.0
    mask = jnp.asarray([[1.0, 1.0, 0.0], [1.0, 1.0, 1.0]])
    variables = net.init(jax.random.PRNGKey(1), segs, params, mask)
    scores, sigma = net.apply(variables, segs, params, mask)
    assert scores.shape == (2, 3) and sigma.shape == (2, 3)
    assert float(scores[0, 2]) < -1e8          # masked slot suppressed
    targets = jnp.asarray([[1.0, 0.5, 0.0], [0.2, 0.9, 0.4]])
    loss = ranking_loss(scores, targets, sigma, mask)
    assert np.isfinite(float(loss))
    order = rank_by_score(scores, mask)
    assert order.shape == (2, 3)


def test_bilby_compatible_export(tmp_path):
    """save_bilby writes the bilby-Result JSON structure (posterior as a
    __dataframe__ dict-of-lists) with ABSOLUTE-GPS geocent_time, without
    importing bilby (reference: result.py:148-179)."""
    import json as _json
    from posteriflow_tpu.physics.constants import GPS_REF
    rng = np.random.default_rng(0)
    samples = np.column_stack([rng.uniform(20, 40, 64),
                               rng.uniform(10, 20, 64),
                               rng.uniform(300, 500, 64)]
                              + [rng.uniform(0, 1, 64) for _ in range(8)])
    res = PosteriorResult(samples=samples, param_names=PARAM_NAMES,
                          log_prob=rng.standard_normal(64))
    p = res.save_bilby(tmp_path / "result_bilby.json")
    doc = _json.loads(p.read_text())
    assert doc["search_parameter_keys"] == list(PARAM_NAMES)
    post = doc["posterior"]["__dataframe__"]
    assert set(PARAM_NAMES).issubset(post)
    assert len(post["mass_1"]) == 64
    # absolute GPS epoch applied
    tc = np.asarray(post["geocent_time"])
    assert (tc > GPS_REF - 10).all() and (tc < GPS_REF + 10).all()
    assert "log_likelihood" in post


def test_gwtc_catalog_depth_and_gps():
    """Widened GWTC-2/3 builtin table + name→GPS conversion (±1 s against
    two published anchors)."""
    from posteriflow_tpu.data.gwtc import GWTCLoader, gps_from_name
    assert abs(gps_from_name("GW150914_095045") - 1126259462.4) <= 1.0
    assert abs(gps_from_name("GW190425_081805") - 1240215503.0) <= 1.0
    gl = GWTCLoader()
    assert len(gl.list_events()) >= 45
    e = gl.get_event("GW200311_115853")
    assert 25 < e["mass_1"] < 45 and e["gps"] > 1267000000
    assert gl.get_event("GW200115")["event_type"] == "NSBH"
    # GWTC-4 entries + name-derived fallback for uncatalogued O4a names
    assert gl.get_event("GW230529_181500")["event_type"] == "NSBH"
    d = gl.get_event("GW240109_050431")       # not in the curated table
    assert d["catalog"] == "name-derived" and d["gps"] > 1388000000
    import pytest
    with pytest.raises(KeyError):
        gl.get_event("not-an-event")


def test_marginalized_likelihood_properties():
    """The phase/time-marginalized Whittle likelihood must (a) be exactly
    independent of theta[phase] and theta[geocent_time], (b) prefer the
    true slow parameters over wrong masses, and (c) never exceed the peak
    of the full likelihood over its own phase/time (it is an average)."""
    from posteriflow_tpu.inference.importance import (
        make_marginalized_log_likelihood)
    prep = prepare_simulated([BBH], seed=11, add_noise=False)
    log_lm = make_marginalized_log_likelihood(prep.strain)
    truth = np.array([[BBH[k] for k in PARAM_NAMES]], dtype=np.float32)
    shifted = truth.copy()
    shifted[0, 7] = 4.0          # phase
    shifted[0, 8] = -0.9         # geocent_time
    wrong = truth.copy()
    wrong[0, 0], wrong[0, 1] = 80.0, 10.0
    ll = np.asarray(log_lm(jnp.asarray(np.vstack([truth, shifted, wrong]))))
    assert abs(ll[0] - ll[1]) < 1e-3, ll       # tc/phase independence
    assert ll[0] > ll[2] + 10.0, ll            # slow-parameter preference
    log_lf = make_log_likelihood(prep.strain)
    ll_full = float(np.asarray(log_lf(jnp.asarray(truth)))[0])
    assert ll[0] <= ll_full + 1e-3             # marginal <= full at truth
    assert ll[0] > ll_full - 25.0              # ...but within the
    #                                            marginalization volume


def test_marginalized_tempered_ladder_matches_direct_is():
    """Marginalized-mode exactness: with a likelihood that ignores
    phase/t_c (the marginalized production configuration), the slow-space
    ladder (9-D GMM + fast dims drawn from their flat priors) must match
    direct prior-IS evidence and posterior means."""
    from posteriflow_tpu.inference.importance import (_finalize,
                                                      _tempered_is)
    from posteriflow_tpu.prior import (BBH as BBH_T, _DIST_HI, _DIST_LO,
                                       _MASS_HI, _MASS_LO, _SPIN1_HI,
                                       _T_OFF_HI, _T_OFF_LO, log_prior_bbh)
    rng = np.random.default_rng(17)
    n = 4000
    lm = rng.uniform(np.log(_MASS_LO[BBH_T]), np.log(_MASS_HI[BBH_T]), n)
    m1 = np.exp(lm)
    m2 = np.exp(rng.uniform(np.log(_MASS_LO[BBH_T]), lm))
    d = (_DIST_LO[BBH_T] ** 3 + rng.uniform(0, 1, n)
         * (_DIST_HI[BBH_T] ** 3 - _DIST_LO[BBH_T] ** 3)) ** (1 / 3)
    theta = np.column_stack([
        m1, m2, d, rng.uniform(0, 2 * np.pi, n),
        np.arcsin(rng.uniform(-1, 1, n)), np.arccos(rng.uniform(-1, 1, n)),
        rng.uniform(0, np.pi, n), rng.uniform(0, 2 * np.pi, n),
        rng.uniform(_T_OFF_LO, _T_OFF_HI, n),
        rng.uniform(0, _SPIN1_HI[BBH_T], n),
        rng.uniform(0, _SPIN1_HI[BBH_T], n)]).astype(np.float64)

    def log_l_fn(t):                      # phase/tc-independent target
        t = np.asarray(t)
        return (-0.5 * ((t[:, 0] - 30.0) / 2.5) ** 2
                - 0.5 * ((t[:, 2] - 700.0) / 120.0) ** 2)

    log_prior_fn = jax.jit(jax.vmap(log_prior_bbh))
    lp = np.asarray(log_prior_fn(jnp.asarray(theta, jnp.float32)),
                    np.float64)
    ll = np.asarray(log_l_fn(theta))
    direct = _finalize(theta.astype(np.float32), ll)
    assert direct.ess > 20.0
    tempered = _tempered_is(theta, lp.copy(), ll, lp, log_l_fn,
                            log_prior_fn, max_stages=25, seed=5,
                            marginalized=True)
    assert tempered.converged, tempered.beta_ladder
    assert 0.0 < tempered.efficiency < 1.0 - 1e-9
    assert abs(tempered.log_evidence_ratio
               - direct.log_evidence_ratio) < 1.5
    for col in (0, 2):
        mu_d = np.sum(direct.weights * direct.samples[:, col])
        mu_t = np.sum(tempered.weights * tempered.samples[:, col])
        assert abs(mu_d - mu_t) / max(abs(mu_d), 1.0) < 0.1, (col, mu_d,
                                                              mu_t)
    # the resampled fast dims live inside their prior boxes
    assert (tempered.samples[:, 7] >= 0).all()
    assert (tempered.samples[:, 7] <= 2 * np.pi + 1e-6).all()
    assert (tempered.samples[:, 8] >= _T_OFF_LO - 1e-6).all()
    assert (tempered.samples[:, 8] <= _T_OFF_HI + 1e-6).all()


def test_run_smc_prior_matches_direct_prior_is():
    """run_smc_prior (the flow-independent sampler baseline): on a
    synthetic phase/tc-independent likelihood its evidence and posterior
    means must match direct prior Monte Carlo."""
    from posteriflow_tpu.inference.importance import (_finalize,
                                                      run_smc_prior)
    from posteriflow_tpu.prior import sample_prior_bbh

    def log_l_fn(t):
        t = np.asarray(t)
        return (-0.5 * ((t[:, 0] - 35.0) / 2.0) ** 2
                - 0.5 * ((t[:, 1] - 28.0) / 2.0) ** 2
                - 0.5 * ((t[:, 2] - 800.0) / 100.0) ** 2)

    res = run_smc_prior(log_l_fn, n=2048, seed=3, marginalized=True)
    assert res.converged, res.beta_ladder
    assert res.n_stages > 1
    assert 0.0 < res.efficiency < 1.0 - 1e-9

    # brute-force prior MC on the same target
    rng = np.random.default_rng(11)
    big = sample_prior_bbh(rng, 200_000)
    direct = _finalize(big.astype(np.float32), log_l_fn(big))
    assert abs(res.log_evidence_ratio - direct.log_evidence_ratio) < 0.5, (
        res.log_evidence_ratio, direct.log_evidence_ratio)
    for col in (0, 1, 2):
        mu_s = np.sum(res.weights * res.samples[:, col])
        mu_d = np.sum(direct.weights * direct.samples[:, col])
        assert abs(mu_s - mu_d) / max(abs(mu_d), 1.0) < 0.08, (col, mu_s,
                                                               mu_d)
