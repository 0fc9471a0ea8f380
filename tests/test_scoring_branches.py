"""Every uncertainty branch of the scoring engine runs end-to-end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vatl4pose_tpu.al.scoring import ScoringConfig, ScoringEngine
from vatl4pose_tpu.config import Cfg
from vatl4pose_tpu.data.dataset import build_dataset
from vatl4pose_tpu.data.synthetic import make_synthetic_video
from vatl4pose_tpu.models import SimplePose, WholeBodyAE
from vatl4pose_tpu.models.auxnet import AuxNet


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root, ann = make_synthetic_video(
        str(tmp_path_factory.mktemp("sc")), num_frames=4, num_persons=2,
        width=160, height=128)
    ds = build_dataset(Cfg({"TYPE": "Posetrack21", "ROOT": root,
                            "ANN": ann}))
    model = SimplePose(num_joints=17, num_layers=18, train=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    frames = jnp.asarray(ds.load_frames())
    return ds, model, variables, frames


@pytest.mark.parametrize("unc", ["HP", "TPC", "THC_L1", "THC_L2", "THC+WPU",
                                 "WPU", "MPE", "Entropy", "Margin",
                                 "VL4Pose", "None"])
def test_branch_produces_finite_scores(setup, unc):
    ds, model, variables, frames = setup
    d = ds.data
    ae = aux = None
    ae_vars = aux_vars = None
    if "WPU" in unc:
        ae = WholeBodyAE(z_dim=4, input_dim=38)
        ae_vars = ae.init(jax.random.PRNGKey(1), jnp.zeros((1, 38)))
    if unc == "VL4Pose":
        aux = AuxNet()
        aux_vars = aux.init(jax.random.PRNGKey(2), jnp.zeros((1, 2, 2, 512)))
    engine = ScoringEngine(
        model, ScoringConfig(uncertainty=unc, need_embedding=False,
                             input_size=(64, 64)), ae_model=ae,
        aux_model=aux, chunk=32)
    bbox_ann = np.stack([d.bboxes[:, 0], d.bboxes[:, 1],
                         d.bboxes[:, 2] - d.bboxes[:, 0],
                         d.bboxes[:, 3] - d.bboxes[:, 1]], 1)
    res = engine.score(variables, frames, d.frame_idx, d.bboxes,
                       d.gt_keypoints, bbox_ann, d.is_prev, d.is_next,
                       ae_variables=ae_vars, aux_variables=aux_vars)
    assert res["unc"].shape == (len(d),)
    if unc == "Entropy":
        # scipy.stats.entropy (and hence the reference) yields -inf when a
        # raw heatmap holds negative values — inherited behavior.
        assert not np.isnan(res["unc"]).any()
    else:
        assert np.isfinite(res["unc"]).all(), unc
    assert np.isfinite(res["oks"]).all()
    if unc == "THC+WPU":
        assert np.isfinite(res["unc2"]).all()
        assert res["unc2"].any()
    if unc == "None":
        assert (res["unc"] == 0).all()


def test_packed_fetch_matches_unpacked_program(setup):
    """The single-buffer stage-2 fetch (one tunnel round trip) must carry
    exactly what the unpacked dict program computes."""
    ds, model, variables, frames = setup
    d = ds.data
    engine = ScoringEngine(
        model, ScoringConfig(uncertainty="THC_L1", need_embedding=False,
                             input_size=(64, 64)), chunk=32)
    rng = np.random.default_rng(0)
    b = 16
    hms = jnp.asarray(rng.uniform(0, 1, (b, 17, 16, 16)), jnp.float32)
    bc = jnp.asarray(np.tile([[5.0, 5.0, 40.0, 60.0]], (b, 1)), jnp.float32)
    gt = jnp.asarray(rng.uniform(0, 60, (b, 51)), jnp.float32)
    bba = jnp.asarray(np.tile([[5.0, 5.0, 35.0, 55.0]], (b, 1)), jnp.float32)
    flags = jnp.asarray(np.ones(b, bool))
    args = (hms, bc, gt, bba, flags, flags, {"params": {}},
            jnp.zeros((b, 1, 2), jnp.float32))
    want = {k: np.asarray(v) for k, v in engine._score(*args).items()}
    got = engine._unpack_scores(np.asarray(engine._score_packed(*args)))
    assert set(got) == set(want)
    for k in want:
        # separately-compiled programs may reorder float accumulations
        np.testing.assert_allclose(got[k], want[k], rtol=1e-5, atol=1e-6,
                                   err_msg=k)
