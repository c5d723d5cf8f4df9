"""yolo_re_tpu — a TPU-native YOLOv9/GELAN object-detection framework.

JAX/XLA rebuild of the capabilities of ariaghora/yolo-re: GELAN backbones,
DFL detect heads, TAL training, on-device NMS, COCO-style eval — designed
for TPU (NHWC, static shapes, jit-compiled graph plans, sharded data
parallelism) rather than translated from torch.

Public surface mirrors the reference (src/yolo/__init__.py:3-21):
YOLO, DataConfig, Evaluator, TrainConfig, Trainer, non_max_suppression.
"""

from yolo_re_tpu.data.config import AugmentConfig, CacheMode, DataConfig
from yolo_re_tpu.data.dataset import DataLoader, YOLODataset, create_dataloader
from yolo_re_tpu.eval.evaluator import Evaluator
from yolo_re_tpu.eval.metrics import compute_ap, compute_map
from yolo_re_tpu.loss.tal import LossConfig, TALoss
from yolo_re_tpu.models.config import LayerDef, ModelConfig, parse_yaml
from yolo_re_tpu.models.yolo import YOLO
from yolo_re_tpu.ops.nms import nms_to_list, non_max_suppression
from yolo_re_tpu.train.config import TrainConfig
from yolo_re_tpu.train.trainer import Trainer
from yolo_re_tpu.utils.devices import get_device

__version__ = "0.1.0"

__all__ = [
    "AugmentConfig",
    "CacheMode",
    "DataConfig",
    "DataLoader",
    "Evaluator",
    "LayerDef",
    "LossConfig",
    "ModelConfig",
    "TALoss",
    "TrainConfig",
    "Trainer",
    "YOLO",
    "YOLODataset",
    "compute_ap",
    "compute_map",
    "create_dataloader",
    "get_device",
    "nms_to_list",
    "non_max_suppression",
    "parse_yaml",
]
