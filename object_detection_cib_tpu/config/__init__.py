from object_detection_cib_tpu.config.engine import (
    compose,
    instantiate,
    load_yaml,
    resolve_interpolations,
)
