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
