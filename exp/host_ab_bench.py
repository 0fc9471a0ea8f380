"""Same-host algorithmic A/B: the reference's eval_and_query (torch CPU)
vs this framework's eval+score (JAX CPU) on the identical fixture+weights.
Grounds the vs_baseline anchor with a measurement (VERDICT r1 #9)."""
import os, sys, time, tempfile, json
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
from tests import refbridge
from vatl4pose_tpu.data.synthetic import make_synthetic_video

root = tempfile.mkdtemp(prefix="hostab_")
make_synthetic_video(root, num_frames=8, num_persons=3, seed=7, video_id="000001",
                     img_format="png", layout="posetrack")
from vatl4pose_tpu.models import build_sppe
from vatl4pose_tpu.config import Cfg
import jax.numpy as jnp
preset = Cfg({"TYPE": "simple", "SIGMA": 2, "NUM_JOINTS": 17,
              "IMAGE_SIZE": [256, 192], "HEATMAP_SIZE": [64, 48]})
mcfg = Cfg({"TYPE": "SimplePose", "NUM_DECONV_FILTERS": [256, 256, 256], "NUM_LAYERS": 50})
model = build_sppe(mcfg, preset, train=False)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 256, 192, 3)))
variables = jax.tree.map(np.asarray, variables)
pth = os.path.join(root, "pretrained.pth")
refbridge.export_pretrained(variables, "SimplePose", pth)

# ---- reference side: one steady-state eval_and_query ----
refbridge.install()
cfg = refbridge.make_cfg(root, pretrained=pth, query_ratio=(0.25, 0.5, 1.0))
opt = refbridge.make_opt(os.path.join(root, "w"), uncertainty="THC_L1",
                         representativeness="Influence")
from active_learning.ActiveLearning import ActiveLearning
al = ActiveLearning(cfg, opt)
al.eval_and_query()          # warm caches
t0 = time.perf_counter()
al.eval_and_query()
ref_dt = time.perf_counter() - t0
n = al.eval_len
print("reference eval_and_query steady:", ref_dt, "s for", n, "samples", flush=True)

# ---- our side on the SAME CPU ----
from vatl4pose_tpu.al.active_learning import ActiveLearning as OurAL
import types
our_cfg = Cfg(json.loads(json.dumps(cfg)))   # EasyDict -> Cfg
our_cfg.DATASET.EVAL.ANN = "activelearning/val/000001_mpii_test.json"
our_cfg.DATASET.TRAIN.ANN = our_cfg.DATASET.EVAL.ANN
our_opt = types.SimpleNamespace(uncertainty="THC_L1", representativeness="Influence",
    filter="None", strategy="THC_L1+Influence", video_id="000001",
    work_dir=os.path.join(root, "w2"), seed=166, onebyone=False, continual=False,
    retrain_thresh=1.0, speedup=False, fixed_lambda=False, THCvsWPU="const",
    vis=False, vis_thc=False, vis_wpu=False, get_prenext=True)
os.makedirs(our_opt.work_dir, exist_ok=True)
ours = OurAL(our_cfg, our_opt)
ours.eval_and_query()        # warm compile
t0 = time.perf_counter()
ours.eval_and_query()
our_dt = time.perf_counter() - t0
print("ours eval+score steady:", our_dt, "s for", ours.eval_len, "samples", flush=True)
print(json.dumps({"ref_cpu_s_per_sample": ref_dt / n,
                  "ours_cpu_s_per_sample": our_dt / n,
                  "same_host_speedup": ref_dt / our_dt}))
