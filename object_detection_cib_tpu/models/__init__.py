from object_detection_cib_tpu.models.yolov5 import (
    Yolov5Network,
    Yolov5NetworkResult,
    DetectionHeadResult,
    P5_STAGES,
)
