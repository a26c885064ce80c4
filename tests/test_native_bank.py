"""Native C++ noise-bank crop server: build, parity with the bank format,
determinism, crop statistics (runtime/bankd.cpp via ctypes)."""

import numpy as np
import pytest

from posteriflow_tpu.data.native_bank import NativeBankServer, build_native
from posteriflow_tpu.data.noise_bank import save_bank_segment
from posteriflow_tpu.physics.constants import N_RFFT, N_SAMPLES


@pytest.fixture(scope="module")
def bank_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("bank")
    rng = np.random.default_rng(0)
    for det in ("H1", "L1", "V1"):
        for gps in (1262000000, 1262004096):
            save_bank_segment(d, det, gps,
                              rng.standard_normal(4 * N_SAMPLES),
                              np.full(N_RFFT, 4e-24))
    return d


def test_native_builds_and_opens(bank_dir):
    assert build_native(), "g++ build failed"
    srv = NativeBankServer(bank_dir)
    assert srv.native, "native library did not load/open"
    assert srv.n_segments(0) == 2
    srv.close()


def test_sample_shapes_and_stats(bank_dir):
    srv = NativeBankServer(bank_dir)
    crops, idx = srv.sample(seed=42, n_events=16)
    assert crops.shape == (16, 3, N_SAMPLES)
    assert idx.shape == (16, 3)
    assert np.isfinite(crops).all()
    # unit-whitened segments -> crops ~ unit variance
    assert 0.9 < crops.std() < 1.1
    assert set(np.unique(idx)) <= {0, 1}
    srv.close()


def test_sample_deterministic(bank_dir):
    srv = NativeBankServer(bank_dir)
    c1, i1 = srv.sample(seed=7, n_events=4)
    c2, i2 = srv.sample(seed=7, n_events=4)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(i1, i2)
    c3, _ = srv.sample(seed=8, n_events=4)
    assert not np.array_equal(c1, c3)
    srv.close()


def test_crops_come_from_bank_data(bank_dir):
    """Every crop must be an exact (possibly flipped/negated) slice of a
    stored segment — the f16->f32 conversion is value-exact."""
    srv = NativeBankServer(bank_dir)
    crops, idx = srv.sample(seed=3, n_events=2, crop_len=256)
    segs = {d: [np.load(f, mmap_mode="r") for f in
                sorted(bank_dir.glob(f"{d}_*_strain.npy"))]
            for d in ("H1", "L1", "V1")}
    for i in range(2):
        for d, det in enumerate(("H1", "L1", "V1")):
            seg = np.asarray(segs[det][idx[i, d]], dtype=np.float32)
            c = crops[i, d]
            found = False
            for cand in (c, -c[::-1]):
                # search for the crop start by matching the first value
                hits = np.where(seg == cand[0])[0]
                for h in hits:
                    if h + 256 <= len(seg) and \
                            np.array_equal(seg[h:h + 256], cand):
                        found = True
                        break
                if found:
                    break
            assert found, (i, det)
    srv.close()


def test_numpy_fallback_matches_contract(bank_dir, monkeypatch):
    import posteriflow_tpu.data.native_bank as nb
    monkeypatch.setattr(nb, "_load_lib", lambda: None)
    srv = nb.NativeBankServer(bank_dir)
    assert not srv.native
    crops, idx = srv.sample(seed=1, n_events=4)
    assert crops.shape == (4, 3, N_SAMPLES)
    assert 0.9 < crops.std() < 1.1


def test_host_feed_end_to_end(bank_dir):
    """HostNoiseFeed -> simulate_batch(real_feed=...) -> finite batch with
    non-trivial asd_bands; deterministic batches in (seed, index)."""
    import jax
    import jax.numpy as jnp
    from posteriflow_tpu.data.host_feed import HostNoiseFeed
    from posteriflow_tpu.physics.simulator import SimConfig, simulate_batch
    from posteriflow_tpu.prior import PriorConfig

    with HostNoiseFeed(bank_dir, batch_size=4, seed=1) as feed:
        noise, recolor, bands = feed.next()
        assert noise.shape == (4, 3, N_SAMPLES)
        assert recolor.shape[0:2] == (4, 3)
        cfg = SimConfig(prior=PriorConfig(max_signals=2),
                        real_noise_prob=1.0)
        b = jax.jit(lambda k, rf: simulate_batch(k, 4, cfg, real_feed=rf))(
            jax.random.PRNGKey(0), (noise, recolor, bands))
        assert np.isfinite(np.asarray(b.strain)).all()
        std = np.asarray(jnp.std(b.strain, axis=(-2, -1)))
        assert (std > 0.8).all() and (std < 2.5).all()

    # determinism: a fresh feed with the same seed yields the same first item
    with HostNoiseFeed(bank_dir, batch_size=4, seed=1) as feed2:
        noise2, _, _ = feed2.next()
        np.testing.assert_array_equal(np.asarray(noise),
                                      np.asarray(noise2))
