from smirk_tpu.flame.model import FlameModel  # noqa: F401
from smirk_tpu.flame import lbs  # noqa: F401
