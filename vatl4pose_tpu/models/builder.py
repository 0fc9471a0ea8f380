"""Model/loss builders (parity: alphapose/models/builder.py:17-37).

build_sppe resolves MODEL.TYPE through the SPPE registry and maps the
reference's config keys (NUM_LAYERS, NUM_DECONV_FILTERS, CONV_DIM, DCN,
STAGE_WITH_DCN, STAGE2/3/4, FINAL_CONV_KERNEL) onto the Flax modules.
"""

from __future__ import annotations

from ..registry import SPPE, build_from_cfg
from .criterion import LOSS_REGISTRY
from .fastpose import FastPose
from .hrnet import PoseHighResolutionNet
from .simplepose import SimplePose
from .wholebody_ae import WholeBodyAE

SPPE.register_module(SimplePose)
SPPE.register_module(FastPose)
SPPE.register_module(PoseHighResolutionNet)


def build_sppe(model_cfg, preset_cfg, train: bool = False,
               fused_eval: bool = False):
    """Construct a pose estimator Flax module from a reference-style config.

    fused_eval (serving only, ResNet-bottleneck backbones): route stage
    tails through the folded-BN chain (models/resnet.py) — same param
    tree, measured +4% forward on v5e (exp/FUSED_BOTTLENECK.md); ignored
    for HRNet and when train=True.
    """
    t = model_cfg["TYPE"]
    nj = preset_cfg["NUM_JOINTS"]
    fused_eval = fused_eval and not train
    if t == "SimplePose":
        return SimplePose(num_joints=nj,
                          num_layers=model_cfg.get("NUM_LAYERS", 50),
                          deconv_dim=tuple(model_cfg.get(
                              "NUM_DECONV_FILTERS", (256, 256, 256))),
                          train=train, fused_eval=fused_eval)
    if t == "FastPose":
        return FastPose(num_joints=nj,
                        num_layers=model_cfg.get("NUM_LAYERS", 50),
                        conv_dim=model_cfg.get("CONV_DIM", 128),
                        dcn=dict(model_cfg["DCN"]) if "DCN" in model_cfg else None,
                        stage_with_dcn=tuple(model_cfg.get(
                            "STAGE_WITH_DCN", (False,) * 4)),
                        train=train, fused_eval=fused_eval)
    if t == "PoseHighResolutionNet":
        stages = {k: dict(model_cfg[k]) for k in ("STAGE2", "STAGE3", "STAGE4")
                  if k in model_cfg} or None
        return PoseHighResolutionNet(
            num_joints=nj,
            final_conv_kernel=model_cfg.get("FINAL_CONV_KERNEL", 1),
            stages=stages, train=train)
    return build_from_cfg(model_cfg, SPPE, train=train)


def build_loss(loss_cfg):
    return LOSS_REGISTRY[loss_cfg["TYPE"]]


def build_wholebody_ae(ae_cfg, input_dim: int = 38):
    return WholeBodyAE(z_dim=ae_cfg.get("Z_DIM", 4), input_dim=input_dim)
