"""Coverage for the config system, GWTC loader, CLI arg plumbing, and the
dynesty-bridge conventions."""

import json

import numpy as np
import pytest

from posteriflow_tpu import PARAM_NAMES
from posteriflow_tpu.data.gwtc import GWTCLoader
from posteriflow_tpu.inference.dynesty_bridge import (align_conventions,
                                                      prior_transform,
                                                      training_matched_priors)
from posteriflow_tpu.physics.constants import GPS_REF
from posteriflow_tpu.utils.config import (ConfigDict, load_config,
                                          save_config)
from posteriflow_tpu.train.trainer import TrainConfig


def test_config_yaml_roundtrip(tmp_path):
    cfg = TrainConfig(batch_size=64, lr=1e-3)
    save_config(cfg, tmp_path / "c.yaml")
    cfg2 = load_config(tmp_path / "c.yaml")
    assert cfg2 == cfg


def test_config_unknown_key_rejected(tmp_path):
    (tmp_path / "bad.yaml").write_text("nonexistent_key: 1\n")
    with pytest.raises(KeyError, match="nonexistent_key"):
        load_config(tmp_path / "bad.yaml")


def test_config_dict_dot_access():
    d = ConfigDict({"a": {"b": {"c": 3}}})
    assert d.a.b.c == 3
    assert d.get_path("a.b.c") == 3
    assert d.get_path("a.x.c", 7) == 7
    with pytest.raises(AttributeError):
        _ = d.missing


def test_gwtc_loader():
    gl = GWTCLoader()
    assert gl.get_event_gps_time("GW150914") == pytest.approx(1126259462.4)
    evs = gl.list_events("GWTC-1")
    assert "GW170817" in evs and len(evs) >= 10
    sc = gl.synthetic_overlap_scenario(["GW150914", "GW151226"], seed=2)
    assert len(sc) == 2
    assert sc[0]["geocent_time"] == 0.0          # primary at window center
    assert abs(sc[1]["geocent_time"]) <= 0.5


def test_prior_transform_supports():
    rng = np.random.default_rng(0)
    u = rng.uniform(size=(256, len(PARAM_NAMES)))
    theta = prior_transform(u)
    pri = training_matched_priors()
    for j, name in enumerate(PARAM_NAMES):
        lo, hi, _ = pri[name]
        assert theta[:, j].min() >= lo - 1e-6, name
        assert theta[:, j].max() <= hi + 1e-6, name
    assert (theta[:, 0] >= theta[:, 1] - 1e-9).all()   # m1 >= m2


def test_align_conventions_time_shift():
    s = np.zeros((3, len(PARAM_NAMES)))
    s[:, 8] = [0.1, -0.5, 1.0]
    out = align_conventions(s, to_absolute_gps=True)
    # float64 eps at GPS magnitude (~1.4e9) is ~2e-7 s — far below any
    # physical timing requirement
    np.testing.assert_allclose(out[:, 8] - GPS_REF, s[:, 8], atol=1e-6)
    back = align_conventions(out, to_absolute_gps=False)
    np.testing.assert_allclose(back, s, atol=1e-6)


def test_infer_cli_help_and_validation():
    import importlib.util
    spec = importlib.util.spec_from_file_location("infer_cli",
                                                  "/root/repo/infer.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    # mutually exclusive sources enforced by argparse
    with pytest.raises(SystemExit):
        m.main(["--ckpt", "x", "--inject", "--event", "GW150914"])
    with pytest.raises(SystemExit):
        m.main(["--ckpt", "x"])              # no source at all


def test_repair_dataset(tmp_path):
    """repair_dataset fixes mass ordering, drops non-finite events, and
    writes repair provenance (reference: io_utils.py repair machinery)."""
    import numpy as np
    from posteriflow_tpu.data.io import (DatasetReader, DatasetWriter,
                                         MetadataManager, repair_dataset)
    p = tmp_path / "ds.h5"
    rng = np.random.default_rng(0)
    strain = rng.standard_normal((8, 3, 128)).astype(np.float16)
    strain[2] = np.nan                          # event to drop
    params = rng.uniform(10, 30, (8, 2, 11)).astype(np.float32)
    params[1, 0, 0], params[1, 0, 1] = 10.0, 25.0   # ordering violation
    with DatasetWriter(p, config={"v": 1}) as w:
        w.append_batch({"strain": strain, "params": params,
                        "n_sig": np.ones(8, np.int32),
                        "sig_snr": 9.0 * np.ones((8, 2), np.float32)})
    rep = repair_dataset(p)
    assert rep["n_out"] == 7 and rep["dropped"] == 1
    assert rep["swapped"] >= 1
    r = DatasetReader(rep["out_path"])
    pp = r.read("params", 0, 7)
    assert (pp[..., 0] >= pp[..., 1] - 1e-6).all()
    ss = r.read("strain", 0, 7).astype(np.float32)
    assert np.isfinite(ss).all()
    r.close()
    meta = MetadataManager(rep["out_path"]).read()
    assert meta["n_out"] == 7 and "repaired_from" in meta
