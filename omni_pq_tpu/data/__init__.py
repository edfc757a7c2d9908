from .synthetic import make_scene, make_batch
from .scannet import ScannetDetectionDataset
from .arkitscenes import ARKitSceneDataset
from .loader import Loader, PrefetchLoader, DoubleLoader, collate, endless
from .quads import get_quads, rectangle, get_normal, arkit_quads_from_annotation

__all__ = [
    "make_scene", "make_batch", "ScannetDetectionDataset", "ARKitSceneDataset",
    "Loader", "PrefetchLoader", "DoubleLoader", "collate", "endless", "get_quads", "rectangle", "get_normal",
    "arkit_quads_from_annotation",
]
