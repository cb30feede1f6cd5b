from hikari_tpu.utils import math  # noqa: F401
