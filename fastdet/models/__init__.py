from fastdet.models.layers import ConvBN, DWConvBlock
from fastdet.models.shufflenet import ShuffleNetV2, ShuffleV2Block
from fastdet.models.fpn import LightFPN
from fastdet.models.detector import Detector

__all__ = [
    "ConvBN", "DWConvBlock", "ShuffleNetV2", "ShuffleV2Block",
    "LightFPN", "Detector",
]
