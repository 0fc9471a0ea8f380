"""Model zoo: SimplePose, FastPose, HRNet, WholeBodyAE, AuxNet."""

from .builder import build_loss, build_sppe, build_wholebody_ae
from .convert_torch import convert_state_dict, load_torch_checkpoint
from .criterion import (l1_joint_regression_loss, masked_heatmap_loss,
                        mse_loss, weighted_l1_loss)
from .fastpose import FastPose
from .hrnet import PoseHighResolutionNet
from .simplepose import SimplePose
from .wholebody_ae import WholeBodyAE
