from smirk_tpu.models.encoders import (  # noqa: F401
    ExpressionEncoder,
    PoseEncoder,
    ShapeEncoder,
    SmirkEncoder,
)
from smirk_tpu.models.generator import SmirkGenerator  # noqa: F401
from smirk_tpu.models.mobilenetv3 import MobileNetV3Features  # noqa: F401
