from object_detection_cib_tpu.core.types import FeatureShape, AnchorBoxInfo, LevelAnchors
from object_detection_cib_tpu.core import boxes
from object_detection_cib_tpu.core import iou
